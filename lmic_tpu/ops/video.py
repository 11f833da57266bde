"""Scale-space video ops: gaussian pyramid volume + trilinear volume warping.

Reference: compressai/models/video/google.py:331-375 and
compressai/models/utils.py:155-195. Torch's 5-D `F.grid_sample` (trilinear,
padding_mode='border', align_corners=False) is re-implemented as a fully
vectorized 8-corner gather — XLA lowers the fancy-index gathers to efficient
dynamic-gather ops; everything is channel-last.

Conventions (matching torch align_corners=False):
  normalized coord c in [-1, 1] -> pixel coord p = ((c + 1) * S - 1) / 2
  border padding: clamp p to [0, S-1].
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def gaussian_kernel1d(kernel_size: int, sigma: float, dtype=jnp.float32):
    khalf = (kernel_size - 1) / 2.0
    x = jnp.linspace(-khalf, khalf, kernel_size, dtype=dtype)
    pdf = jnp.exp(-0.5 * (x / sigma) ** 2)
    return pdf / pdf.sum()


def gaussian_kernel2d(kernel_size: int, sigma: float, dtype=jnp.float32):
    k = gaussian_kernel1d(kernel_size, sigma, dtype)
    return jnp.outer(k, k)


def gaussian_blur(x, kernel):
    """Depthwise 2-D blur with replicate padding. x: (N, H, W, C)."""
    ksize = kernel.shape[0]
    pad = ksize // 2
    C = x.shape[-1]
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    dw_kernel = jnp.tile(kernel[:, :, None, None], (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        x,
        dw_kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def avg_pool2x2(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def upsample2x_bilinear(x):
    """Bilinear x2 upsampling, half-pixel centers (align_corners=False)."""
    N, H, W, C = x.shape
    return jax.image.resize(x, (N, 2 * H, 2 * W, C), method="bilinear")


def gaussian_volume(x, sigma: float, num_levels: int):
    """Scale-space volume (reference video/google.py:331-355).

    x: (N, H, W, C) -> (N, D, H, W, C) with D = num_levels + 1:
    level 0 = x, level 1 = blur(x), level i>1 = upsampled blur of the
    2^(i-1)-downsampled image.
    """
    k = 2 * int(math.ceil(3 * sigma)) + 1
    kernel = gaussian_kernel2d(k, sigma, x.dtype)
    volume = [x]
    x = gaussian_blur(x, kernel)
    volume.append(x)
    for i in range(1, num_levels):
        x = avg_pool2x2(x)
        x = gaussian_blur(x, kernel)
        interp = x
        for _ in range(i):
            interp = upsample2x_bilinear(interp)
        volume.append(interp)
    return jnp.stack(volume, axis=1)


def base_grid(H: int, W: int, dtype=jnp.float32):
    """Identity sampling grid, normalized [-1, 1], pixel centers
    (torch affine_grid align_corners=False)."""
    xs = (2.0 * jnp.arange(W, dtype=dtype) + 1.0) / W - 1.0
    ys = (2.0 * jnp.arange(H, dtype=dtype) + 1.0) / H - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    return gx, gy


def warp_volume(volume, flow, scale_field):
    """Trilinear scale-space warp.

    volume: (N, D, H, W, C); flow: (N, H, W, 2) — (dx, dy) in normalized
    units; scale_field: (N, H, W, 1) — the depth coordinate in [-1, 1].
    Returns (N, H, W, C). Equivalent to torch 5-D grid_sample with
    padding_mode='border', align_corners=False (reference
    video/google.py:357-375).
    """
    N, D, H, W, C = volume.shape
    gx, gy = base_grid(H, W, volume.dtype)
    cx = gx[None] + flow[..., 0]
    cy = gy[None] + flow[..., 1]
    cz = scale_field[..., 0]

    # normalized -> pixel coords (align_corners=False), border clamp
    px = jnp.clip(((cx + 1.0) * W - 1.0) / 2.0, 0.0, W - 1.0)
    py = jnp.clip(((cy + 1.0) * H - 1.0) / 2.0, 0.0, H - 1.0)
    pz = jnp.clip(((cz + 1.0) * D - 1.0) / 2.0, 0.0, D - 1.0)

    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    z0 = jnp.floor(pz).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    z1 = jnp.minimum(z0 + 1, D - 1)

    wx = (px - x0)[..., None]
    wy = (py - y0)[..., None]
    wz = (pz - z0)[..., None]

    n_idx = jnp.arange(N)[:, None, None]

    def gather(zi, yi, xi):
        return volume[n_idx, zi, yi, xi]  # (N, H, W, C)

    c000 = gather(z0, y0, x0)
    c001 = gather(z0, y0, x1)
    c010 = gather(z0, y1, x0)
    c011 = gather(z0, y1, x1)
    c100 = gather(z1, y0, x0)
    c101 = gather(z1, y0, x1)
    c110 = gather(z1, y1, x0)
    c111 = gather(z1, y1, x1)

    c00 = c000 * (1 - wx) + c001 * wx
    c01 = c010 * (1 - wx) + c011 * wx
    c10 = c100 * (1 - wx) + c101 * wx
    c11 = c110 * (1 - wx) + c111 * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz


def scale_space_warp(x_ref, flow, scale_field, sigma0: float,
                     num_levels: int):
    """forward_prediction (reference video/google.py:377-382)."""
    volume = gaussian_volume(x_ref, sigma0, num_levels)
    return warp_volume(volume, flow, scale_field)
