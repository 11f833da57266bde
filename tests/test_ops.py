"""Unit tests for lmic_tpu.ops (modeled on the reference's tests/test_ops.py:
LowerBound forward/backward, NonNegativeParametrizer, pmf_to_quantized_cdf
domain errors)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmic_tpu.ops import (
    LowerBound,
    NonNegativeParametrizer,
    lower_bound,
    pmf_to_quantized_cdf,
    ste_round,
)


class TestLowerBound:
    def test_forward(self):
        x = jnp.array([-1.0, 0.0, 0.5, 1.0, 2.0])
        b = jnp.array(0.5)
        np.testing.assert_allclose(lower_bound(x, b), np.maximum(x, 0.5))

    def test_grad_pass_through_above(self):
        # x above the bound: gradient passes through in both directions.
        g = jax.grad(lambda x: lower_bound(x, jnp.array(0.5)))(jnp.array(2.0))
        assert g == 1.0

    def test_grad_below_bound(self):
        # x below the bound: gradient only passes when pushing x up.
        f = lambda x: lower_bound(x, jnp.array(0.5))
        # dL/dy = +1 (would push x down) -> blocked
        _, vjp = jax.vjp(f, jnp.array(-1.0))
        assert vjp(jnp.array(1.0))[0] == 0.0
        # dL/dy = -1 (pushes x up toward bound) -> passes
        assert vjp(jnp.array(-1.0))[0] == -1.0

    def test_module_wrapper(self):
        lb = LowerBound(1e-9)
        x = jnp.array([1e-12, 1e-6])
        out = lb(x)
        np.testing.assert_allclose(out, [1e-9, 1e-6], rtol=1e-6)


class TestNonNegativeParametrizer:
    def test_roundtrip(self):
        p = NonNegativeParametrizer()
        x = jnp.array([0.0, 0.1, 1.0, 4.0])
        raw = p.init(x)
        out = p(raw)
        np.testing.assert_allclose(out, x, atol=1e-6)

    def test_minimum(self):
        p = NonNegativeParametrizer(minimum=1e-6)
        out = p(jnp.array([-10.0, 0.0]))
        assert np.all(np.asarray(out) >= 1e-6 - 1e-12)


class TestSteRound:
    def test_forward(self):
        x = jnp.array([0.2, 0.7, -1.6])
        np.testing.assert_allclose(ste_round(x), np.round(x))

    def test_grad_identity(self):
        g = jax.grad(lambda x: ste_round(x).sum())(jnp.array([0.2, 0.7]))
        np.testing.assert_allclose(g, [1.0, 1.0])


class TestPmfToQuantizedCdf:
    def test_basic_properties(self):
        rng = np.random.default_rng(0)
        for n in [2, 10, 100]:
            pmf = rng.random(n).astype(np.float32)
            pmf /= pmf.sum()
            cdf = pmf_to_quantized_cdf(pmf, 16)
            assert cdf[0] == 0
            assert cdf[-1] == 1 << 16
            assert np.all(np.diff(cdf) > 0)

    def test_zero_prob_symbols_get_nonzero_freq(self):
        pmf = np.array([0.5, 0.0, 0.5, 0.0], dtype=np.float32)
        cdf = pmf_to_quantized_cdf(pmf, 16)
        assert np.all(np.diff(cdf) > 0)

    def test_invalid_pmf_raises(self):
        with pytest.raises(ValueError):
            pmf_to_quantized_cdf(np.array([0.5, -0.1]), 16)
        with pytest.raises(ValueError):
            pmf_to_quantized_cdf(np.array([0.5, np.nan]), 16)
        with pytest.raises(ValueError):
            pmf_to_quantized_cdf(np.array([0.0, 0.0]), 16)

    def test_known_value(self):
        # Uniform pmf over 4 symbols -> equal quarters of 2^16.
        cdf = pmf_to_quantized_cdf(np.full(4, 0.25, dtype=np.float32), 16)
        np.testing.assert_array_equal(cdf, [0, 16384, 32768, 49152, 65536])
