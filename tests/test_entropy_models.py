"""Entropy model tests, modeled on the reference's
tests/test_entropy_models.py: quantize modes, train-noise vs eval-round
forward, compress->decompress roundtrip == round(x), scale-table handling,
CDF table invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmic_tpu.entropy import (
    EntropyBottleneck,
    GaussianConditional,
    eb_update,
    get_scale_table,
)
from lmic_tpu.entropy.entropy_models import (
    quantize_dequantize,
    quantize_noise,
    quantize_symbols,
)


@pytest.fixture(scope="module")
def eb_setup():
    eb = EntropyBottleneck(channels=16)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 16)) * 3
    variables = eb.init(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, x
    )
    return eb, variables, x


class TestQuantize:
    def test_noise_bounded(self):
        x = jax.random.normal(jax.random.key(0), (64,))
        out = quantize_noise(x, jax.random.key(1))
        assert np.all(np.abs(np.asarray(out - x)) <= 0.5)

    def test_dequantize_mode(self):
        x = jnp.array([0.2, 1.7, -0.6])
        means = jnp.array([0.1, 0.1, 0.1])
        out = quantize_dequantize(x, means)
        np.testing.assert_allclose(out, np.round(x - means) + means)

    def test_symbols_mode(self):
        x = jnp.array([0.2, 1.7, -0.6])
        out = quantize_symbols(x)
        assert out.dtype == jnp.int32
        np.testing.assert_array_equal(out, [0, 2, -1])


class TestEntropyBottleneck:
    def test_forward_training_shapes(self, eb_setup):
        eb, variables, x = eb_setup
        y, lik = eb.apply(
            variables, x, training=True, rngs={"noise": jax.random.key(3)}
        )
        assert y.shape == x.shape and lik.shape == x.shape
        assert np.all(np.asarray(lik) > 0) and np.all(np.asarray(lik) <= 1)
        # training output is noisy input
        assert np.all(np.abs(np.asarray(y - x)) <= 0.5)

    def test_forward_eval_rounds(self, eb_setup):
        eb, variables, x = eb_setup
        y, lik = eb.apply(variables, x, training=False)
        medians = np.asarray(
            variables["params"]["quantiles"][:, 0, 1]
        ).reshape(1, 1, 1, -1)
        np.testing.assert_allclose(
            np.asarray(y), np.round(np.asarray(x) - medians) + medians,
            atol=1e-5,
        )

    def test_aux_loss_finite_and_decreasing_direction(self, eb_setup):
        eb, variables, _ = eb_setup
        loss = eb.apply(variables, method=EntropyBottleneck.aux_loss)
        assert np.isfinite(float(loss))
        # gradient exists only for quantiles
        g = jax.grad(
            lambda p: eb.apply(
                {"params": p}, method=EntropyBottleneck.aux_loss
            )
        )(variables["params"])
        assert float(jnp.abs(g["quantiles"]).sum()) > 0
        assert float(jnp.abs(g["matrix_0"]).sum()) == 0.0

    def test_update_and_roundtrip(self, eb_setup):
        eb, variables, x = eb_setup
        state = eb_update(eb, variables)
        # CDF rows are monotone and end at 2^16
        for i, ln in enumerate(state.table.cdf_length):
            row = state.table.cdf[i, :ln]
            assert row[0] == 0 and row[-1] == 1 << 16
            assert np.all(np.diff(row) > 0)
        strings = state.compress(np.asarray(x))
        assert len(strings) == x.shape[0]
        out = state.decompress(strings, x.shape[1:-1])
        medians = state.medians.reshape(1, 1, 1, -1)
        expected = np.round(np.asarray(x) - medians) + medians
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_roundtrip_various_spatial_dims(self):
        # reference tests roundtrip over 0..5 spatial dims
        for spatial in [(1,), (4,), (4, 4), (2, 3, 4)]:
            eb = EntropyBottleneck(channels=4)
            x = jax.random.normal(jax.random.key(5), (2, *spatial, 4)) * 2
            variables = eb.init(
                {"params": jax.random.key(1), "noise": jax.random.key(2)}, x
            )
            state = eb_update(eb, variables)
            out = state.decompress(state.compress(np.asarray(x)), spatial)
            medians = state.medians.reshape(
                (1,) * (len(spatial) + 1) + (-1,)
            )
            expected = np.round(np.asarray(x) - medians) + medians
            np.testing.assert_allclose(out, expected, atol=1e-5)


class TestGaussianConditional:
    def test_likelihood_matches_gaussian_mass(self):
        gc = GaussianConditional()
        x = jnp.array([0.0, 1.0, -2.0])
        scales = jnp.array([1.0, 2.0, 0.5])
        lik = np.asarray(gc.likelihood(x, scales))
        from scipy.stats import norm

        for i in range(3):
            expected = norm.cdf(0.5, loc=0, scale=scales[i]) - norm.cdf(
                -0.5, loc=0, scale=scales[i]
            )
            expected = norm.cdf(
                float(x[i]) + 0.5, scale=float(scales[i])
            ) - norm.cdf(float(x[i]) - 0.5, scale=float(scales[i]))
            np.testing.assert_allclose(lik[i], expected, rtol=1e-5)

    def test_scale_lower_bound_applied(self):
        gc = GaussianConditional()
        lik_tiny = gc.likelihood(jnp.array([0.0]), jnp.array([1e-6]))
        lik_bound = gc.likelihood(jnp.array([0.0]), jnp.array([0.11]))
        np.testing.assert_allclose(lik_tiny, lik_bound)

    def test_build_indexes(self):
        gc = GaussianConditional()
        table = get_scale_table()
        # σ exactly at a table entry maps to that bucket
        idx = np.asarray(
            gc.build_indexes(table, jnp.asarray(table))
        )
        np.testing.assert_array_equal(idx, np.arange(len(table)))
        # below the bound -> bucket 0; above max -> last bucket
        idx2 = np.asarray(
            gc.build_indexes(table, jnp.array([1e-9, 300.0]))
        )
        np.testing.assert_array_equal(idx2, [0, len(table) - 1])

    def test_update_table_invariants(self):
        gc = GaussianConditional()
        state = gc.update(get_scale_table())
        assert len(state.table.cdf_length) == 64
        for i, ln in enumerate(state.table.cdf_length):
            row = state.table.cdf[i, :ln]
            assert row[0] == 0 and row[-1] == 1 << 16
            assert np.all(np.diff(row) > 0)

    def test_compress_roundtrip_with_means(self):
        gc = GaussianConditional()
        state = gc.update(get_scale_table())
        rng = np.random.default_rng(0)
        y = rng.normal(0, 3, (2, 8, 8, 8)).astype(np.float32)
        means = rng.normal(0, 1, y.shape).astype(np.float32)
        scales = np.abs(rng.normal(1, 2, y.shape)).astype(np.float32) + 0.05
        indexes = np.asarray(gc.build_indexes(state.scale_table, scales))
        strings = state.compress(y, indexes, means)
        out = state.decompress(strings, indexes, means)
        np.testing.assert_allclose(out, np.round(y - means) + means, atol=1e-6)

    def test_forward_train_vs_eval(self):
        gc = GaussianConditional()
        x = jax.random.normal(jax.random.key(0), (4, 4)) * 2
        scales = jnp.ones((4, 4))
        y_train, lik_t = gc(x, scales, training=True, key=jax.random.key(1))
        y_eval, lik_e = gc(x, scales, training=False)
        assert np.all(np.abs(np.asarray(y_train - x)) <= 0.5)
        np.testing.assert_allclose(np.asarray(y_eval), np.round(np.asarray(x)))
        assert np.all(np.asarray(lik_t) > 0) and np.all(np.asarray(lik_e) > 0)
