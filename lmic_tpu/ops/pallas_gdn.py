"""Fused GDN/IGDN Pallas TPU kernel.

GDN (reference layers/gdn.py:41-92) is `y = x / sqrt(beta + x^2 @ gamma^T)`
(inverse: `* sqrt`). Layered jnp ops materialize x^2 and the norm in HBM
between the square, the (C, C) matmul, and the rsqrt-multiply; this kernel
streams a (TILE_N, C) tile of activations through VMEM once, runs the
channel-mixing matmul on the MXU, and applies the rsqrt epilogue in
registers — one HBM read + one HBM write per activation element.

`gdn_core(x, beta, gamma, inverse)` takes POST-reparametrization beta/gamma
(the NonNegativeParametrizer stays ordinary JAX so its custom gradients are
untouched) and carries a custom VJP. The backward is ALSO a fused Pallas
kernel on TPU: a GDN-ablation A/B (2026-08-20, LMIC_ABLATE_GDN) measured
GDN fwd+bwd at 69% of the hyperprior B=64@256 train-step wall with the jnp
backward — it re-reads x twice and materializes norm/dn/x^2 between five
kernels. The fused backward reads x and the cotangent once per tile,
recomputes the norm on the MXU, streams dx out, and accumulates
dbeta/dgamma in f32 across sequential grid steps (revisited output block).

Dispatch: the Pallas kernel runs on TPU backends; elsewhere (CPU tests,
debugging) the mathematically identical jnp path is used. Set
LMIC_PALLAS=interpret to force the kernel through the Pallas interpreter
for correctness tests on CPU.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Activation rows per grid step. 512 measured best on v5e for the
# hyperprior shapes (2026-08-20 microbench, fwd+bwd chained on-chip:
# 256 -> 6.41 ms, 512 -> 6.22 ms, 1024/2048 within noise above it);
# env-tunable for other chips.
TILE_N = int(os.environ.get("LMIC_GDN_TILE_N", 512))


def _prec(x):
    """Full-precision passes for f32 (parity with the torch reference);
    native single-pass MXU mode for bf16 AMP activations."""
    if x.dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _acc_dtype(x):
    """Accumulation dtype: f32 for f32/bf16 activations (AMP keeps
    reductions in f32), f64 when the whole computation runs in f64
    (the gradient-parity tests vs torch autograd)."""
    return jnp.float64 if x.dtype == jnp.float64 else jnp.float32


def _gdn_jnp(x, beta, gamma, inverse: bool):
    acc = _acc_dtype(x)
    norm = (
        jnp.einsum(
            "...i,oi->...o", jnp.square(x), gamma,
            precision=_prec(x), preferred_element_type=acc,
        )
        + beta.astype(acc)
    )
    if inverse:
        return x * jnp.sqrt(norm).astype(x.dtype)
    return x * jax.lax.rsqrt(norm).astype(x.dtype)


def _kernel(x_ref, gamma_t_ref, beta_ref, out_ref, *, inverse: bool):
    x = x_ref[:]
    # f32 inputs get full-precision MXU passes: the bf16 default costs
    # ~1e-3 absolute error vs the f32 reference path — visible in parity
    # tests. bf16 inputs (AMP training) are already the MXU-native mode;
    # the accumulator stays f32 via preferred_element_type.
    prec = (
        jax.lax.Precision.HIGHEST
        if x.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    norm = (
        jnp.dot(
            x * x, gamma_t_ref[:], preferred_element_type=jnp.float32,
            precision=prec,
        )
        + beta_ref[:].astype(jnp.float32)
    )
    if inverse:
        out_ref[:] = (x * jnp.sqrt(norm).astype(x.dtype)).astype(
            out_ref.dtype
        )
    else:
        out_ref[:] = (x * jax.lax.rsqrt(norm).astype(x.dtype)).astype(
            out_ref.dtype
        )


def _gdn_pallas(x2d, beta, gamma, inverse: bool, interpret: bool):
    n, C = x2d.shape
    grid = (pl.cdiv(n, TILE_N),)
    kernel = functools.partial(_kernel, inverse=inverse)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, C), x2d.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, C), lambda i: (i, 0)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_N, C), lambda i: (i, 0)),
        interpret=interpret,
    )(x2d, gamma.T, beta.reshape(1, C))


def _use_pallas() -> str:
    """'' = jnp path, 'compile' = real kernel, 'interpret' = interpreter."""
    mode = os.environ.get("LMIC_PALLAS", "auto")
    if mode == "0":
        return ""
    if mode == "interpret":
        return "interpret"
    if jax.default_backend() == "tpu":
        return "compile"
    return ""


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gdn_core(x, beta, gamma, inverse: bool = False):
    """y_i = x_i * (beta_i + sum_j gamma_ij x_j^2)^(-1/2 or +1/2).

    x: (..., C); beta: (C,); gamma: (C_out, C_in), all post-reparam.
    """
    mode = _use_pallas()
    if not mode or x.dtype not in (jnp.float32, jnp.bfloat16):
        return _gdn_jnp(x, beta, gamma, inverse)
    shape = x.shape
    C = shape[-1]
    y = _gdn_pallas(
        x.reshape(-1, C), beta, gamma, inverse,
        interpret=(mode == "interpret"),
    )
    return y.reshape(shape)


def _gdn_fwd(x, beta, gamma, inverse):
    return gdn_core(x, beta, gamma, inverse), (x, beta, gamma)


def _gdn_bwd_jnp(inverse, res, g):
    # dn and the norm accumulate in f32 for f32/bf16 activations (AMP
    # keeps reductions in f32) and in f64 under x64; the returned
    # cotangents match the primal dtypes as custom_vjp requires. For
    # f32 inputs every cast is an identity and the math is unchanged.
    x, beta, gamma = res
    prec = _prec(x)
    acc = _acc_dtype(x)
    norm = (
        jnp.einsum(
            "...i,oi->...o", jnp.square(x), gamma,
            precision=prec, preferred_element_type=acc,
        )
        + beta.astype(acc)
    )
    g32 = g.astype(acc)
    x32 = x.astype(acc)
    if inverse:
        # y = x * n^(1/2);  dL/dn_j = g_j x_j (1/2) n_j^(-1/2)
        dn = 0.5 * g32 * x32 * jax.lax.rsqrt(norm)
        dx = g32 * jnp.sqrt(norm) + 2.0 * x32 * jnp.einsum(
            "...j,ji->...i", dn.astype(x.dtype), gamma,
            precision=prec, preferred_element_type=acc,
        )
    else:
        # y = x * n^(-1/2);  dL/dn_j = -g_j x_j (1/2) n_j^(-3/2)
        dn = -0.5 * g32 * x32 * norm ** -1.5
        dx = g32 * jax.lax.rsqrt(norm) + 2.0 * x32 * jnp.einsum(
            "...j,ji->...i", dn.astype(x.dtype), gamma,
            precision=prec, preferred_element_type=acc,
        )
    dbeta = dn.reshape(-1, x.shape[-1]).sum(0)
    x2 = jnp.square(x).reshape(-1, x.shape[-1])
    dgamma = jnp.einsum(
        "no,ni->oi", dn.reshape(-1, x.shape[-1]).astype(x.dtype), x2,
        precision=prec, preferred_element_type=acc,
    )
    return (
        dx.astype(x.dtype),
        dbeta.astype(beta.dtype),
        dgamma.astype(gamma.dtype),
    )


def _bwd_kernel(x_ref, g_ref, gamma_ref, gamma_t_ref, beta_ref,
                dx_ref, dbeta_ref, dgamma_ref, *, inverse: bool):
    """One fused pass per activation tile: recompute the norm (the forward
    stores nothing), form dn, and emit all three cotangents. dx streams
    out tile-by-tile; dbeta/dgamma revisit the same output block every
    grid step and accumulate in f32 (TPU grid steps run sequentially, so
    += on a revisited block is the canonical reduction pattern)."""
    i = pl.program_id(0)
    x = x_ref[:]
    g = g_ref[:]
    prec = (
        jax.lax.Precision.HIGHEST
        if x.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    x2 = x * x
    norm = (
        jnp.dot(x2, gamma_t_ref[:], preferred_element_type=jnp.float32,
                precision=prec)
        + beta_ref[:].astype(jnp.float32)
    )
    g32 = g.astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    r = jax.lax.rsqrt(norm)
    if inverse:
        # y = x * n^(1/2);  dL/dn = 0.5 g x n^(-1/2)
        dn = 0.5 * g32 * x32 * r
        scale = jnp.sqrt(norm)
    else:
        # y = x * n^(-1/2);  dL/dn = -0.5 g x n^(-3/2)
        dn = -0.5 * g32 * x32 * (r * r * r)
        scale = r
    dnx = dn.astype(x.dtype)
    dx = g32 * scale + 2.0 * x32 * jnp.dot(
        dnx, gamma_ref[:], preferred_element_type=jnp.float32,
        precision=prec,
    )
    dx_ref[:] = dx.astype(dx_ref.dtype)
    db = jnp.sum(dn, axis=0, keepdims=True)
    # dgamma_oi = sum_t dn[t, o] * x2[t, i]  (contract the tile axis)
    dg = jax.lax.dot_general(
        dnx, x2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when(i == 0)
    def _init():
        dbeta_ref[:] = db
        dgamma_ref[:] = dg

    @pl.when(i > 0)
    def _acc():
        dbeta_ref[:] += db
        dgamma_ref[:] += dg


def _gdn_bwd_pallas(x2d, g2d, beta, gamma, inverse: bool, interpret: bool):
    n, C = x2d.shape
    # zero-pad ragged tiles: zero x AND zero g rows contribute dn == 0,
    # so the dbeta/dgamma accumulators see exact zeros from the padding
    # (the padded dx rows are sliced off below)
    rem = n % TILE_N
    if rem:
        pad = TILE_N - rem
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
        g2d = jnp.pad(g2d, ((0, pad), (0, 0)))
    np_ = x2d.shape[0]
    kernel = functools.partial(_bwd_kernel, inverse=inverse)
    dx, dbeta, dgamma = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((np_, C), x2d.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
        ),
        grid=(np_ // TILE_N,),
        in_specs=[
            pl.BlockSpec((TILE_N, C), lambda i: (i, 0)),
            pl.BlockSpec((TILE_N, C), lambda i: (i, 0)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((TILE_N, C), lambda i: (i, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((C, C), lambda i: (0, 0)),
        ),
        interpret=interpret,
    )(x2d, g2d, gamma, gamma.T, beta.reshape(1, C))
    if rem:
        dx = dx[:n]
    return dx, dbeta.reshape(C), dgamma


def _gdn_bwd(inverse, res, g):
    x, beta, gamma = res
    mode = _use_pallas()
    if not mode or x.dtype not in (jnp.float32, jnp.bfloat16):
        return _gdn_bwd_jnp(inverse, res, g)
    C = x.shape[-1]
    dx, dbeta, dgamma = _gdn_bwd_pallas(
        x.reshape(-1, C), g.reshape(-1, C), beta, gamma, inverse,
        interpret=(mode == "interpret"),
    )
    return (
        dx.reshape(x.shape).astype(x.dtype),
        dbeta.astype(beta.dtype),
        dgamma.astype(gamma.dtype),
    )


gdn_core.defvjp(_gdn_fwd, _gdn_bwd)
