"""Color-space transforms (BT.709), channel-last.

Reference: compressai/transforms/functional.py:26-137 (channel-first torch);
here arrays are (..., H, W, C) jax or numpy.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp

YCBCR_WEIGHTS = {
    # Kr, Kg, Kb with Kg = 1 - Kr - Kb
    "ITU-R_BT.709": (0.2126, 0.7152, 0.0722),
}


def rgb2ycbcr(rgb):
    """(..., 3) RGB [0,1] -> YCbCr, BT.709."""
    Kr, Kg, Kb = YCBCR_WEIGHTS["ITU-R_BT.709"]
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = Kr * r + Kg * g + Kb * b
    cb = 0.5 * (b - y) / (1 - Kb) + 0.5
    cr = 0.5 * (r - y) / (1 - Kr) + 0.5
    return jnp.stack((y, cb, cr), axis=-1)


def ycbcr2rgb(ycbcr):
    """(..., 3) YCbCr -> RGB, BT.709."""
    Kr, Kg, Kb = YCBCR_WEIGHTS["ITU-R_BT.709"]
    y, cb, cr = ycbcr[..., 0], ycbcr[..., 1], ycbcr[..., 2]
    r = y + (2 - 2 * Kr) * (cr - 0.5)
    b = y + (2 - 2 * Kb) * (cb - 0.5)
    g = (y - Kr * r - Kb * b) / Kg
    return jnp.stack((r, g, b), axis=-1)


def yuv_444_to_420(yuv, mode: str = "avg_pool"):
    """(N, H, W, 3) -> ((N,H,W,1), (N,H/2,W/2,1), (N,H/2,W/2,1))."""
    if mode not in ("avg_pool",):
        raise ValueError(f'Invalid downsampling mode "{mode}".')
    if isinstance(yuv, (tuple, list)):
        y, u, v = yuv
    else:
        y, u, v = (yuv[..., i : i + 1] for i in range(3))

    def down(t):
        return jax.lax.reduce_window(
            t, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        ) / 4.0

    return y, down(u), down(v)


def yuv_420_to_444(yuv, mode: str = "bilinear", return_tuple: bool = False):
    """((N,H,W,1), (N,H/2,W/2,1), (N,H/2,W/2,1)) -> (N, H, W, 3)."""
    if len(yuv) != 3:
        raise ValueError("Expected a tuple of 3 arrays")
    if mode not in ("bilinear", "bicubic", "nearest"):
        raise ValueError(f'Invalid upsampling mode "{mode}".')
    method = {"bilinear": "bilinear", "bicubic": "bicubic",
              "nearest": "nearest"}[mode]
    y, u, v = yuv

    def up(t):
        N, H, W, C = t.shape
        return jax.image.resize(t, (N, 2 * H, 2 * W, C), method=method)

    u, v = up(u), up(v)
    if return_tuple:
        return y, u, v
    return jnp.concatenate((y, u, v), axis=-1)
