"""Scale-space op parity tests against torch (cpu) — gaussian blur and the
trilinear volume warp must match torch's replicate-pad conv2d and 5-D
grid_sample(padding_mode='border', align_corners=False) to float tolerance."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from lmic_tpu.ops.video import (  # noqa: E402
    avg_pool2x2,
    base_grid,
    gaussian_blur,
    gaussian_kernel2d,
    gaussian_volume,
    upsample2x_bilinear,
    warp_volume,
)


def _torch_gaussian_blur(x_t, kernel_t):
    import torch.nn.functional as F

    pad = kernel_t.size(0) // 2
    x_t = F.pad(x_t, (pad, pad, pad, pad), mode="replicate")
    return F.conv2d(
        x_t,
        kernel_t.expand(x_t.size(1), 1, kernel_t.size(0), kernel_t.size(1)),
        groups=x_t.size(1),
    )


class TestBlur:
    def test_matches_torch(self):
        rng = np.random.default_rng(0)
        x = rng.random((2, 16, 16, 3), dtype=np.float32)
        kernel = np.asarray(gaussian_kernel2d(11, 1.5))
        ours = np.asarray(gaussian_blur(jnp.asarray(x), jnp.asarray(kernel)))
        x_t = torch.from_numpy(x).permute(0, 3, 1, 2)
        theirs = (
            _torch_gaussian_blur(x_t, torch.from_numpy(kernel))
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestPoolUpsample:
    def test_avg_pool(self):
        rng = np.random.default_rng(1)
        x = rng.random((1, 8, 8, 2), dtype=np.float32)
        ours = np.asarray(avg_pool2x2(jnp.asarray(x)))
        theirs = (
            torch.nn.functional.avg_pool2d(
                torch.from_numpy(x).permute(0, 3, 1, 2), 2, 2
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_bilinear_upsample(self):
        rng = np.random.default_rng(2)
        x = rng.random((1, 5, 7, 2), dtype=np.float32)
        ours = np.asarray(upsample2x_bilinear(jnp.asarray(x)))
        theirs = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x).permute(0, 3, 1, 2),
                scale_factor=2,
                mode="bilinear",
                align_corners=False,
            )
            .permute(0, 2, 3, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


class TestWarpVolume:
    def test_matches_torch_grid_sample(self):
        rng = np.random.default_rng(3)
        N, D, H, W, C = 2, 6, 8, 10, 3
        vol = rng.random((N, D, H, W, C), dtype=np.float32)
        flow = (rng.random((N, H, W, 2), dtype=np.float32) - 0.5) * 0.6
        scale = (rng.random((N, H, W, 1), dtype=np.float32) - 0.5) * 2.2

        ours = np.asarray(
            warp_volume(jnp.asarray(vol), jnp.asarray(flow), jnp.asarray(scale))
        )

        # torch reference path (video/google.py:357-375)
        import torch.nn.functional as F

        vol_t = torch.from_numpy(vol).permute(0, 4, 1, 2, 3)  # N,C,D,H,W
        theta = torch.eye(2, 3).unsqueeze(0).expand(N, 2, 3)
        grid = F.affine_grid(theta, (N, C, H, W), align_corners=False)
        upd = grid + torch.from_numpy(flow)
        volume_grid = torch.cat(
            (upd, torch.from_numpy(scale)), dim=-1
        ).unsqueeze(1)
        out = F.grid_sample(
            vol_t, volume_grid, padding_mode="border", align_corners=False
        )
        theirs = out.squeeze(2).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5)

    def test_identity_warp_at_level0_boundary(self):
        # scale exactly at the front face with zero flow: clamp to level 0
        rng = np.random.default_rng(4)
        vol = rng.random((1, 4, 6, 6, 2), dtype=np.float32)
        flow = np.zeros((1, 6, 6, 2), np.float32)
        scale = np.full((1, 6, 6, 1), -1.0, np.float32)
        out = np.asarray(
            warp_volume(jnp.asarray(vol), jnp.asarray(flow), jnp.asarray(scale))
        )
        # z = -1 -> pixel coord (0*D-1)/2 = -0.5 -> clamped to 0 (border)
        np.testing.assert_allclose(out, vol[:, 0], atol=1e-6)


class TestGaussianVolume:
    def test_shapes_and_level0(self):
        rng = np.random.default_rng(5)
        x = rng.random((1, 16, 16, 3), dtype=np.float32)
        vol = np.asarray(gaussian_volume(jnp.asarray(x), 1.5, 5))
        assert vol.shape == (1, 6, 16, 16, 3)
        np.testing.assert_array_equal(vol[:, 0], x)
