"""NN layer library (channel-last / NHWC — the TPU conv layout).

Re-implements the reference layer set (compressai/layers/layers.py,
compressai/layers/gdn.py, compressai/models/utils.py:128-146) as flax
modules with explicit torch-equivalent padding so spatial semantics match
the reference exactly:

- conv(k, s):    padding (k//2, k//2)           -> out = ceil(H/s)
- deconv(k, s):  input-dilated conv, padding (k-1-p, k-1-p + (s-1)), p=k//2
                 -> out = H*s  (torch ConvTranspose2d output_padding=s-1)
- GDN/IGDN:      y = x / sqrt(beta + x^2 @ gamma) as one channel matmul (MXU)
- MaskedConv2d:  PixelCNN mask A/B applied to the kernel at call time
- Residual / attention blocks, sub-pixel (PixelShuffle) upsampling, QReLU
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lmic_tpu.ops import NonNegativeParametrizer


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


class Conv(nn.Module):
    """Strided conv with torch-style symmetric padding (p = k//2)."""

    features: int
    kernel_size: int = 5
    stride: int = 2
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = k // 2
        return nn.Conv(
            self.features,
            _pair(k),
            strides=_pair(self.stride),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class Deconv(nn.Module):
    """Transposed conv matching torch ConvTranspose2d(k, s, padding=k//2,
    output_padding=s-1): out spatial = in * s. Implemented as an
    input-dilated convolution (lhs dilation), which XLA lowers to the same
    MXU-friendly form."""

    features: int
    kernel_size: int = 5
    stride: int = 2
    use_bias: bool = True
    dtype: Any = None
    padding: Optional[int] = None          # torch `padding`; default k//2
    output_padding: Optional[int] = None   # torch `output_padding`; default s-1

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel_size, self.stride
        p = self.padding if self.padding is not None else k // 2
        op = self.output_padding if self.output_padding is not None else s - 1
        pad_lo = k - 1 - p
        pad_hi = k - 1 - p + op
        return nn.Conv(
            self.features,
            _pair(k),
            strides=(1, 1),
            padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
            input_dilation=_pair(s),
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


def conv3x3(features: int, stride: int = 1, dtype=None) -> Conv:
    return Conv(features, kernel_size=3, stride=stride, dtype=dtype)


def conv1x1(features: int, stride: int = 1, dtype=None) -> Conv:
    return Conv(features, kernel_size=1, stride=stride, dtype=dtype)


def pixel_shuffle(x, r: int):
    """(B, H, W, C*r^2) -> (B, H*r, W*r, C) with torch PixelShuffle channel
    ordering (c-major, then row offset, then col offset)."""
    B, H, W, C = x.shape
    c = C // (r * r)
    x = x.reshape(B, H, W, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r1, W, r2, c
    return x.reshape(B, H * r, W * r, c)


class SubpelConv3x3(nn.Module):
    """3x3 conv + PixelShuffle upsampling (reference layers.py:86-91)."""

    features: int
    r: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = Conv(
            self.features * self.r**2, kernel_size=3, stride=1,
            dtype=self.dtype,
        )(x)
        return pixel_shuffle(x, self.r)


class GDN(nn.Module):
    """Generalized divisive normalization:
    y_i = x_i / sqrt(beta_i + sum_j gamma_{ij} x_j^2)  (inverse: * sqrt).

    The channel mixing is a single (C, C) matmul on the MXU; beta/gamma are
    stored in the sqrt-reparametrized space (reference layers/gdn.py:41-92).
    """

    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1
    dtype: Any = None  # compute dtype; params stay f32 (flax AMP convention)

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        beta_reparam = NonNegativeParametrizer(minimum=self.beta_min)
        gamma_reparam = NonNegativeParametrizer()
        beta = self.param(
            "beta", lambda k: beta_reparam.init(jnp.ones((C,), jnp.float32))
        )
        gamma = self.param(
            "gamma",
            lambda k: gamma_reparam.init(
                self.gamma_init * jnp.eye(C, dtype=jnp.float32)
            ),
        )
        beta = beta_reparam(beta)
        gamma = gamma_reparam(gamma)  # (C_out, C_in) like the reference
        if self.dtype is not None:
            # reparametrization math stays f32 (its custom gradients and
            # minimum clamps are precision-sensitive); only the activation
            # normalization itself runs in the compute dtype.
            x = x.astype(self.dtype)
            beta = beta.astype(self.dtype)
            gamma = gamma.astype(self.dtype)
        import os

        if os.environ.get("LMIC_ABLATE_GDN") == "1":
            # timing-attribution escape (bench/profile only): measures the
            # train step with GDN as identity so the GDN share of the MFU
            # gap is a measured delta, not an assertion. Never set in
            # training or serving — it changes the model.
            return x
        # fused matmul + rsqrt epilogue (Pallas on TPU, jnp elsewhere)
        from lmic_tpu.ops.pallas_gdn import gdn_core

        return gdn_core(x, beta, gamma, self.inverse)


class GDN1(nn.Module):
    """Simplified GDN: y_i = x_i / (beta_i + sum_j gamma_{ij} |x_j|)
    (reference layers/gdn.py:95-121)."""

    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        beta_reparam = NonNegativeParametrizer(minimum=self.beta_min)
        gamma_reparam = NonNegativeParametrizer()
        beta = self.param(
            "beta", lambda k: beta_reparam.init(jnp.ones((C,), jnp.float32))
        )
        gamma = self.param(
            "gamma",
            lambda k: gamma_reparam.init(
                self.gamma_init * jnp.eye(C, dtype=jnp.float32)
            ),
        )
        beta = beta_reparam(beta)
        gamma = gamma_reparam(gamma)
        norm = (
            jnp.einsum(
                "...i,oi->...o", jnp.abs(x), gamma,
                precision=jax.lax.Precision.HIGHEST,
            )
            + beta
        )
        if not self.inverse:
            norm = 1.0 / norm
        return x * norm


def make_causal_mask(kh: int, kw: int, mask_type: str = "A"):
    """PixelCNN raster-order kernel mask (reference layers.py:64-73).
    Returns (kh, kw) float mask: rows below center zero; center row zero
    from the center pixel (type A) or right of it (type B)."""
    if mask_type not in ("A", "B"):
        raise ValueError(f'Invalid "mask_type" value "{mask_type}"')
    mask = jnp.ones((kh, kw), jnp.float32)
    mask = mask.at[kh // 2, kw // 2 + (mask_type == "B"):].set(0)
    mask = mask.at[kh // 2 + 1:].set(0)
    return mask


class MaskedConv2d(nn.Module):
    """Causal (PixelCNN) convolution for the autoregressive context model.
    The mask multiplies the kernel at call time — functional, unlike the
    reference's in-place weight mutation (layers.py:75-78)."""

    features: int
    kernel_size: int = 5
    mask_type: str = "A"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        p = k // 2
        C_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, k, C_in, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        mask = make_causal_mask(k, k, self.mask_type)[:, :, None, None]
        out = jax.lax.conv_general_dilated(
            x,
            (kernel * mask).astype(x.dtype),
            window_strides=(1, 1),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(out.dtype)


class ResidualBlockWithStride(nn.Module):
    """conv3x3(s) -> lrelu -> conv3x3 -> GDN + skip conv1x1(s)
    (reference layers.py:98-129)."""

    features: int
    stride: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        out = conv3x3(self.features, self.stride, dtype=dt)(x)
        out = nn.leaky_relu(out, 0.01)
        out = conv3x3(self.features, dtype=dt)(out)
        out = GDN(dtype=dt)(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            x = conv1x1(self.features, self.stride, dtype=dt)(x)
        return out + x.astype(out.dtype)


class ResidualBlockUpsample(nn.Module):
    """subpel conv up -> lrelu -> conv3x3 -> IGDN + subpel skip
    (reference layers.py:132-157)."""

    features: int
    upsample: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        out = SubpelConv3x3(self.features, self.upsample, dtype=dt)(x)
        out = nn.leaky_relu(out, 0.01)
        out = conv3x3(self.features, dtype=dt)(out)
        out = GDN(inverse=True, dtype=dt)(out)
        identity = SubpelConv3x3(self.features, self.upsample, dtype=dt)(x)
        return out + identity


class ResidualBlock(nn.Module):
    """Two 3x3 convs with leaky ReLU (reference layers.py:160-190)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        out = conv3x3(self.features, dtype=dt)(x)
        out = nn.leaky_relu(out, 0.01)
        out = conv3x3(self.features, dtype=dt)(out)
        out = nn.leaky_relu(out, 0.01)
        if x.shape[-1] != self.features:
            x = conv1x1(self.features, dtype=dt)(x)
        return out + x.astype(out.dtype)


class _ResidualUnit(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck used inside AttentionBlock."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        N = x.shape[-1]
        dt = self.dtype
        out = conv1x1(N // 2, dtype=dt)(x)
        out = nn.relu(out)
        out = conv3x3(N // 2, dtype=dt)(out)
        out = nn.relu(out)
        out = conv1x1(N, dtype=dt)(out)
        return nn.relu(out + x.astype(out.dtype))


class AttentionBlock(nn.Module):
    """Cheng2020 sigmoid-gated trunk/mask attention
    (reference layers.py:193-244)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        a = x
        for _ in range(3):
            a = _ResidualUnit(dtype=dt)(a)
        b = x
        for _ in range(3):
            b = _ResidualUnit(dtype=dt)(b)
        b = conv1x1(x.shape[-1], dtype=dt)(b)
        return x + (a * jax.nn.sigmoid(b)).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def qrelu(x, bit_depth: int = 8, beta: int = 100):
    """Clamp to [0, 2^bit_depth - 1] with a gamma-decay surrogate gradient
    outside the range (reference layers.py:247-296)."""
    return jnp.clip(x, 0, 2**bit_depth - 1)


def _qrelu_fwd(x, bit_depth, beta):
    return qrelu(x, bit_depth, beta), x


def _qrelu_bwd(bit_depth, beta, x, g):
    alpha = 0.9943258522851727
    max_value = 2**bit_depth - 1
    grad_sub = (
        jnp.exp(
            (-(alpha**beta)) * jnp.abs(2.0 * x / max_value - 1) ** beta
        )
        * g
    )
    out_of_range = (x < 0) | (x > max_value)
    return (jnp.where(out_of_range, grad_sub, g),)


qrelu.defvjp(_qrelu_fwd, _qrelu_bwd)


class ESA(nn.Module):
    """Enhanced Spatial Attention (reference models/google.py:1432-1459):
    a strided-conv + maxpool branch computes a low-res saliency field that is
    bilinearly resized back and sigmoid-gated onto the input."""

    @nn.compact
    def __call__(self, x):
        N = x.shape[-1]
        f = N // 4
        c1_ = Conv(f, kernel_size=1, stride=1)(x)
        # conv2: k3 s2 VALID (reference padding=0)
        c1 = nn.Conv(f, (3, 3), strides=(2, 2), padding="VALID")(c1_)
        v_max = jax.lax.reduce_window(
            c1, -jnp.inf, jax.lax.max, (1, 7, 7, 1), (1, 3, 3, 1), "VALID"
        )
        v_range = nn.relu(conv3x3(f)(v_max))
        c3 = nn.relu(conv3x3(f)(v_range))
        c3 = conv3x3(f)(c3)
        B, H, W, _ = x.shape
        c3 = jax.image.resize(c3, (B, H, W, f), method="bilinear")
        cf = Conv(f, kernel_size=1, stride=1)(c1_)
        c4 = Conv(N, kernel_size=1, stride=1)(c3 + cf)
        return x * jax.nn.sigmoid(c4)


class SELayer(nn.Module):
    """Squeeze-and-excitation channel gate (reference google.py:1462-1477)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))
        y = nn.Dense(C // self.reduction, use_bias=False)(y)
        y = nn.relu(y)
        y = nn.Dense(C, use_bias=False)(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]
