"""Canonical MS-SSIM cross-check.

The reference reports ms-ssim from pytorch_msssim
(/root/reference/CompressAI/compressai/utils/eval_model/__main__t.py:48,
used at :142 and in __main__rgbt.py). That package is absent in this image,
so this module implements MS-SSIM a SECOND time, independently, in pure
numpy/float64, straight from the Wang et al. 2003 definition with the
exact algorithmic choices pytorch_msssim makes:

- 11x11 sigma-1.5 gaussian window, separable, VALID (no padding) filtering;
- C1=(0.01*range)^2, C2=(0.03*range)^2;
- per-channel spatial means of the ssim/cs maps, relu'd per level;
- downsampling between levels via 2x2 stride-2 average pooling with a
  zero pad on odd dims (torch avg_pool2d padding=s%2, count_include_pad);
- published weights [0.0448, 0.2856, 0.3001, 0.2363, 0.1333], NOT
  renormalized; the weighted product taken per (image, channel) and then
  averaged.

`lmic_tpu.utils.metrics.ms_ssim` (float32, XLA) must agree with this
float64 oracle to <= 1e-4 across sizes/contents, including odd dims (the
padding path) and the 161-pixel minimum-size edge (pytorch_msssim asserts
min side > 160). Any disagreement here means every ms-ssim number the
eval CLIs report is wrong relative to what the reference would report.
"""

import numpy as np
import pytest

WEIGHTS = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333], np.float64)
K1, K2 = 0.01, 0.03


def _gauss1d(size=11, sigma=1.5):
    x = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return g / g.sum()


def _blur_valid(img, k):
    """Separable valid-mode filter on a 2D array (gaussian is symmetric,
    so correlation == convolution)."""
    from numpy.lib.stride_tricks import sliding_window_view

    v = sliding_window_view(img, len(k), axis=0) @ k
    return sliding_window_view(v, len(k), axis=1) @ k


def _ssim_cs_per_channel(x, y, data_range):
    """Returns (ssim, cs) spatial means, each shaped (N, C)."""
    c1 = (K1 * data_range) ** 2
    c2 = (K2 * data_range) ** 2
    k = _gauss1d()
    N, H, W, C = x.shape
    ssim = np.empty((N, C))
    cs = np.empty((N, C))
    for n in range(N):
        for c in range(C):
            a, b = x[n, :, :, c], y[n, :, :, c]
            mu_a = _blur_valid(a, k)
            mu_b = _blur_valid(b, k)
            var_a = _blur_valid(a * a, k) - mu_a**2
            var_b = _blur_valid(b * b, k) - mu_b**2
            cov = _blur_valid(a * b, k) - mu_a * mu_b
            cs_map = (2 * cov + c2) / (var_a + var_b + c2)
            lum = (2 * mu_a * mu_b + c1) / (mu_a**2 + mu_b**2 + c1)
            ssim[n, c] = np.mean(lum * cs_map)
            cs[n, c] = np.mean(cs_map)
    return ssim, cs


def _avg_pool2_padded(x):
    """2x2 stride-2 mean with a leading zero pad on odd dims (the
    windows torch's symmetric padding actually covers)."""
    N, H, W, C = x.shape
    if H % 2:
        x = np.concatenate([np.zeros((N, 1, W, C)), x], axis=1)
    if W % 2:
        x = np.concatenate(
            [np.zeros((N, x.shape[1], 1, C)), x], axis=2
        )
    return (
        x[:, 0::2, 0::2] + x[:, 1::2, 0::2]
        + x[:, 0::2, 1::2] + x[:, 1::2, 1::2]
    ) / 4.0


def np_ms_ssim(x, y, data_range=1.0):
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    assert min(x.shape[1], x.shape[2]) > (11 - 1) * 2**4, \
        "canonical 5-scale MS-SSIM needs min side > 160"
    levels = []
    for i in range(len(WEIGHTS)):
        ssim, cs = _ssim_cs_per_channel(x, y, data_range)
        levels.append(np.maximum(cs if i < len(WEIGHTS) - 1 else ssim, 0.0))
        if i < len(WEIGHTS) - 1:
            x = _avg_pool2_padded(x)
            y = _avg_pool2_padded(y)
    vals = np.stack(levels)  # (L, N, C)
    return float(np.mean(np.prod(vals ** WEIGHTS[:, None, None], axis=0)))


def np_ssim(x, y, data_range=1.0):
    ssim, _ = _ssim_cs_per_channel(
        np.asarray(x, np.float64), np.asarray(y, np.float64), data_range
    )
    return float(ssim.mean())


def _pairs(rng, shape):
    """Three content regimes: mild noise, heavy degradation, smooth
    gradients (high luminance term, exercises C1)."""
    x = rng.random(shape).astype(np.float32)
    yield x, np.clip(x + rng.normal(0, 0.02, shape), 0, 1).astype(np.float32)
    yield x, np.clip(x * 0.7 + rng.normal(0.1, 0.15, shape), 0, 1).astype(
        np.float32
    )
    h = np.linspace(0, 1, shape[1], dtype=np.float32)[None, :, None, None]
    g = np.broadcast_to(h, shape).copy()
    yield g, np.clip(g + rng.normal(0, 0.05, shape), 0, 1).astype(np.float32)


class TestMsSsimCanonical:
    @pytest.mark.parametrize(
        "shape",
        [
            (1, 161, 161, 3),   # pytorch_msssim's minimum-size edge; odd:
                                # hits the zero-pad downsample at every level
            (2, 176, 200, 3),   # batch > 1, even dims
            (1, 192, 256, 1),   # single channel (thermal master modality)
            (1, 171, 240, 3),   # odd H, even W: per-dim padding
        ],
    )
    def test_matches_independent_numpy(self, shape):
        from lmic_tpu.utils.metrics import ms_ssim

        rng = np.random.default_rng(sum(shape))
        for x, y in _pairs(rng, shape):
            want = np_ms_ssim(x, y)
            got = float(ms_ssim(x, y))
            assert abs(got - want) <= 1e-4, (shape, got, want)

    @pytest.mark.slow
    def test_kodak_geometry(self):
        """The geometry every headline RD number is reported at."""
        from lmic_tpu.utils.metrics import ms_ssim

        rng = np.random.default_rng(0)
        shape = (1, 512, 768, 3)
        x = rng.random(shape).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.03, shape), 0, 1).astype(np.float32)
        want = np_ms_ssim(x, y)
        got = float(ms_ssim(x, y))
        assert abs(got - want) <= 1e-4, (got, want)

    def test_ssim_matches_independent_numpy(self):
        from lmic_tpu.utils.metrics import ssim

        rng = np.random.default_rng(7)
        shape = (2, 64, 96, 3)
        for x, y in _pairs(rng, shape):
            want = np_ssim(x, y)
            got = float(ssim(x, y))
            assert abs(got - want) <= 1e-4, (got, want)

    def test_small_image_fallback_warns(self):
        """Below pytorch_msssim's 160-pixel bound we degrade (reduced
        scales, renormalized weights) with a warning instead of raising."""
        from lmic_tpu.utils.metrics import ms_ssim

        rng = np.random.default_rng(3)
        x = rng.random((1, 160, 160, 3)).astype(np.float32)
        with pytest.warns(UserWarning, match="160"):
            v = float(ms_ssim(x, np.clip(x + 0.02, 0, 1)))
        assert np.isfinite(v) and 0 <= v <= 1
