"""Layer tests modeled on the reference tests/test_layers.py: mask A/B
correctness, GDN vs the manual formula, block shapes, QReLU gradients, and
conv/deconv spatial semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmic_tpu.layers import (
    GDN,
    GDN1,
    AttentionBlock,
    Conv,
    Deconv,
    MaskedConv2d,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SubpelConv3x3,
    make_causal_mask,
    pixel_shuffle,
    qrelu,
)


def _init_apply(module, x, seed=0):
    variables = module.init(jax.random.key(seed), x)
    return module.apply(variables, x), variables


class TestConvSpatial:
    @pytest.mark.parametrize("H", [8, 9, 15, 16])
    def test_conv_k5s2_is_ceil_half(self, H):
        x = jnp.zeros((1, H, H, 3))
        y, _ = _init_apply(Conv(4, kernel_size=5, stride=2), x)
        assert y.shape == (1, -(-H // 2), -(-H // 2), 4)

    @pytest.mark.parametrize("H", [4, 7, 8])
    def test_deconv_k5s2_doubles(self, H):
        x = jnp.zeros((1, H, H, 3))
        y, _ = _init_apply(Deconv(4, kernel_size=5, stride=2), x)
        assert y.shape == (1, 2 * H, 2 * H, 4)

    def test_pixel_shuffle_matches_torch_semantics(self):
        # channel c*r*r + r1*r + r2 goes to spatial offset (r1, r2), chan c
        r = 2
        x = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 1, 8)
        y = pixel_shuffle(x, r)
        assert y.shape == (1, 2, 2, 2)
        # output channel 0 gets input channels 0..3 laid out row-major
        np.testing.assert_array_equal(
            np.asarray(y[0, :, :, 0]), [[0, 1], [2, 3]]
        )
        np.testing.assert_array_equal(
            np.asarray(y[0, :, :, 1]), [[4, 5], [6, 7]]
        )


class TestMask:
    def test_mask_a(self):
        m = np.asarray(make_causal_mask(5, 5, "A"))
        assert m[2, 2] == 0  # center masked
        assert m[2, :2].all() and not m[2, 2:].any()
        assert m[:2].all() and not m[3:].any()

    def test_mask_b(self):
        m = np.asarray(make_causal_mask(5, 5, "B"))
        assert m[2, 2] == 1  # center kept
        assert m[2, :3].all() and not m[2, 3:].any()

    def test_masked_conv_is_causal(self):
        # Perturbing a "future" pixel must not change the output at (h, w).
        conv = MaskedConv2d(4, kernel_size=5, mask_type="A")
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 3))
        variables = conv.init(jax.random.key(1), x)
        y0 = conv.apply(variables, x)
        x2 = x.at[0, 4, 4, :].add(100.0)  # current pixel (type A masks it)
        x3 = x.at[0, 5, 2, :].add(100.0)  # next row
        y2 = conv.apply(variables, x2)
        y3 = conv.apply(variables, x3)
        np.testing.assert_allclose(y0[0, 4, 4], y2[0, 4, 4], atol=1e-5)
        np.testing.assert_allclose(y0[0, 4, 4], y3[0, 4, 4], atol=1e-5)
        # but a past pixel does change it
        x4 = x.at[0, 3, 3, :].add(100.0)
        y4 = conv.apply(variables, x4)
        assert np.abs(np.asarray(y4[0, 4, 4] - y0[0, 4, 4])).max() > 1e-3


class TestGDN:
    def test_gdn_matches_formula(self):
        x = jax.random.normal(jax.random.key(0), (1, 6, 6, 8)) * 2
        gdn = GDN()
        y, variables = _init_apply(gdn, x)
        # at init beta=1, gamma=0.1*I  ->  y = x / sqrt(1 + 0.1 x^2)
        expected = np.asarray(x) / np.sqrt(1 + 0.1 * np.asarray(x) ** 2)
        np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-5)

    def test_igdn_matches_formula(self):
        x = jax.random.normal(jax.random.key(0), (1, 6, 6, 8)) * 2
        y, _ = _init_apply(GDN(inverse=True), x)
        expected = np.asarray(x) * np.sqrt(1 + 0.1 * np.asarray(x) ** 2)
        np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-5)

    def test_gdn1_matches_formula(self):
        x = jax.random.normal(jax.random.key(0), (1, 6, 6, 8))
        y, _ = _init_apply(GDN1(), x)
        expected = np.asarray(x) / (1 + 0.1 * np.abs(np.asarray(x)))
        np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4, atol=1e-5)


class TestBlocks:
    def test_residual_block_shapes(self):
        x = jnp.zeros((2, 8, 8, 16))
        y, _ = _init_apply(ResidualBlock(32), x)
        assert y.shape == (2, 8, 8, 32)

    def test_residual_block_with_stride(self):
        x = jnp.zeros((2, 8, 8, 16))
        y, _ = _init_apply(ResidualBlockWithStride(32, stride=2), x)
        assert y.shape == (2, 4, 4, 32)

    def test_residual_block_upsample(self):
        x = jnp.zeros((2, 8, 8, 16))
        y, _ = _init_apply(ResidualBlockUpsample(32, upsample=2), x)
        assert y.shape == (2, 16, 16, 32)

    def test_attention_block(self):
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 16))
        y, _ = _init_apply(AttentionBlock(), x)
        assert y.shape == x.shape

    def test_subpel_conv(self):
        x = jnp.zeros((1, 8, 8, 16))
        y, _ = _init_apply(SubpelConv3x3(8, r=2), x)
        assert y.shape == (1, 16, 16, 8)


class TestQReLU:
    def test_forward_clamps(self):
        x = jnp.array([-5.0, 0.0, 100.0, 255.0, 300.0])
        np.testing.assert_array_equal(
            np.asarray(qrelu(x, 8, 100)), [0, 0, 100, 255, 255]
        )

    def test_gradient_in_range_is_identity(self):
        g = jax.grad(lambda x: qrelu(x, 8, 100).sum())(jnp.array([100.0]))
        np.testing.assert_allclose(g, [1.0])

    def test_gradient_out_of_range_is_decayed(self):
        g = jax.grad(lambda x: qrelu(x, 8, 100).sum())(
            jnp.array([-10.0, 300.0])
        )
        assert np.all(np.asarray(g) < 1.0) and np.all(np.asarray(g) >= 0.0)
