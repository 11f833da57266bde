"""Image quality metrics on device: PSNR, SSIM, MS-SSIM.

MS-SSIM follows Wang et al. 2003 with the standard 5-scale weights and an
11x11 sigma-1.5 gaussian window — the same definition as
pytorch_msssim.ms_ssim used by the reference eval CLIs
(compressai/utils/eval_model/__main__rgbt.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lmic_tpu.ops.video import gaussian_kernel1d

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a, b, max_val: float = 1.0):
    mse = jnp.mean((a - b) ** 2)
    return 20 * jnp.log10(max_val) - 10 * jnp.log10(mse)


def _blur(x, kernel1d):
    """Separable valid-mode gaussian filter. x: (N, H, W, C)."""
    C = x.shape[-1]
    k = kernel1d.shape[0]
    kh = jnp.tile(kernel1d.reshape(k, 1, 1, 1), (1, 1, 1, C))
    kw = jnp.tile(kernel1d.reshape(1, k, 1, 1), (1, 1, 1, C))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )
    return jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )


def _ssim_components(x, y, max_val=1.0, win_size=11, sigma=1.5):
    k1, k2 = 0.01, 0.03
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    kernel = gaussian_kernel1d(win_size, sigma, x.dtype)

    mu_x = _blur(x, kernel)
    mu_y = _blur(y, kernel)
    sigma_x = _blur(x * x, kernel) - mu_x**2
    sigma_y = _blur(y * y, kernel) - mu_y**2
    sigma_xy = _blur(x * y, kernel) - mu_x * mu_y

    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    lum = (2 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1)
    return lum * cs, cs


def ssim(x, y, max_val: float = 1.0):
    """Mean SSIM over a (N, H, W, C) pair."""
    s, _ = _ssim_components(x, y, max_val)
    return jnp.mean(s)


def _downsample2(x):
    """2x2 stride-2 average pool with the canonical odd-size handling:
    pytorch_msssim pads odd spatial dims with one zero row/column (torch
    avg_pool2d padding=s%2, count_include_pad) so the downsampled size is
    ceil(s/2); the symmetric bottom/right pad torch adds is never covered
    by a stride-2 window, so a single leading pad reproduces it exactly."""
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
        ((0, 0), (ph, 0), (pw, 0), (0, 0)),
    ) / 4.0


def ms_ssim(x, y, max_val: float = 1.0):
    """Multi-scale SSIM, canonical pytorch_msssim semantics (what the
    reference eval CLIs report, eval_model/__main__t.py:48): per-channel
    spatial means, relu per level, the 5-level weighted product taken per
    (image, channel) and THEN averaged, zero-padded downsampling of odd
    dims. Bit-validated against an independent from-the-definition numpy
    implementation in tests/test_ms_ssim_canonical.py.

    Uses the standard 5 scales whenever the image supports them
    (min side > 160, i.e. ceil(side/16) >= 11 — pytorch_msssim's own
    assertion bound); smaller images drop the coarsest scales with
    renormalized weights instead of raising (a reduced-scale value is a
    DIFFERENT metric than standard 5-scale MS-SSIM — a one-time warning
    flags it; pytorch_msssim would refuse such inputs)."""
    n_scales = len(_MSSSIM_WEIGHTS)
    min_side = min(x.shape[1], x.shape[2])
    while n_scales > 1 and -(-min_side // (1 << (n_scales - 1))) < 11:
        n_scales -= 1
    weights = jnp.asarray(_MSSSIM_WEIGHTS[:n_scales], x.dtype)
    if n_scales < len(_MSSSIM_WEIGHTS):
        import warnings

        warnings.warn(
            f"ms_ssim: image min side {min_side} <= 160; using "
            f"{n_scales}-scale MS-SSIM with renormalized weights — not "
            "comparable to standard 5-scale values",
            stacklevel=2,
        )
        weights = weights / jnp.sum(weights)
    values = []
    for i in range(n_scales):
        s, cs = _ssim_components(x, y, max_val)
        per_channel = jnp.mean(
            s if i == n_scales - 1 else cs, axis=(1, 2)
        )  # (N, C)
        values.append(jnp.maximum(per_channel, 0.0))
        if i < n_scales - 1:
            x = _downsample2(x)
            y = _downsample2(y)
    values = jnp.stack(values)  # (L, N, C)
    return jnp.mean(jnp.prod(values ** weights[:, None, None], axis=0))
