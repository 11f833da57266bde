"""Pallas GDN kernel: interpreter-mode correctness vs the jnp formula and
torch-checked gradients of the custom VJP."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lmic_tpu.ops import pallas_gdn  # noqa: E402


@pytest.fixture()
def data():
    k = jax.random.key(0)
    kx, kb, kg = jax.random.split(k, 3)
    C = 64
    x = jax.random.normal(kx, (2, 9, 7, C))  # deliberately ragged spatial
    beta = jax.random.uniform(kb, (C,), minval=0.5, maxval=1.5)
    # GDN gammas are elementwise NONNEGATIVE (NonNegativeParametrizer) —
    # that is what keeps the norm positive; a merely-PSD matrix can drive
    # sum_i x_i^2 gamma_oi negative and rsqrt to NaN.
    gamma = (
        jax.random.uniform(kg, (C, C), minval=0.0, maxval=0.02)
        + 0.1 * jnp.eye(C)
    )
    return x, beta, gamma


@pytest.mark.parametrize("inverse", [False, True])
def test_kernel_matches_formula(data, inverse, monkeypatch):
    x, beta, gamma = data
    ref = pallas_gdn._gdn_jnp(x, beta, gamma, inverse)
    monkeypatch.setenv("LMIC_PALLAS", "interpret")
    out = pallas_gdn.gdn_core(x, beta, gamma, inverse)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("inverse", [False, True])
def test_custom_vjp_matches_autodiff(data, inverse):
    x, beta, gamma = data

    def loss_core(x, b, g):
        return jnp.sum(jnp.sin(pallas_gdn.gdn_core(x, b, g, inverse)))

    def loss_ref(x, b, g):
        return jnp.sum(jnp.sin(pallas_gdn._gdn_jnp(x, b, g, inverse)))

    got = jax.grad(loss_core, argnums=(0, 1, 2))(x, beta, gamma)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, beta, gamma)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_gdn_module_uses_core(data):
    """GDN module output is unchanged by the kernel wiring."""
    from lmic_tpu.layers import GDN

    x, _, _ = data
    mod = GDN()
    v = mod.init(jax.random.key(1), x)
    y = mod.apply(v, x)
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("ragged", [0, 7])
@pytest.mark.parametrize("inverse", [False, True])
def test_fused_backward_matches_jnp(dtype, ragged, inverse, monkeypatch):
    """The fused Pallas backward (dx + accumulated dbeta/dgamma over
    revisited output blocks, zero-padded ragged tiles) matches the jnp
    backward for f32 and bf16, full and ragged tile counts."""
    dt = jnp.dtype(dtype)
    k = jax.random.key(3)
    kx, kb, kg, kc = jax.random.split(k, 4)
    C = 64
    n = 2 * pallas_gdn.TILE_N + ragged
    x = jax.random.normal(kx, (n, C)).astype(dt)
    g = jax.random.normal(kc, (n, C)).astype(dt)
    beta = jax.random.uniform(kb, (C,), minval=0.5, maxval=1.5).astype(dt)
    gamma = (
        jax.random.uniform(kg, (C, C), minval=0.0, maxval=0.02)
        + 0.1 * jnp.eye(C)
    ).astype(dt)
    ref = pallas_gdn._gdn_bwd_jnp(inverse, (x, beta, gamma), g)
    monkeypatch.setenv("LMIC_PALLAS", "interpret")
    got = pallas_gdn._gdn_bwd(inverse, (x, beta, gamma), g)
    tol = 1e-5 if dt == jnp.float32 else 2e-2
    for name, a, b in zip(("dx", "dbeta", "dgamma"), got, ref):
        assert a.dtype == b.dtype, name
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_array_less(
            np.abs(a - b).max() / scale, tol, err_msg=name
        )
