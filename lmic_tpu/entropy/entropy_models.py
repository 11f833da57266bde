"""On-device entropy models.

`EntropyBottleneck` (Ballé factorized prior) and `GaussianConditional`
re-implement the differentiable likelihood math of the reference
(compressai/entropy_models/entropy_models.py:330-740) as pure JAX, batched
over channels so the per-channel monotone-MLP CDF evaluates as a handful of
small einsums — XLA fuses the whole likelihood path into the surrounding
transform graph.

Integer CDF tables for the rANS coder are built host-side by `update()`
equivalents that evaluate pmfs on device once and quantize rows with the
exact integer semantics of lmic_tpu.ops.cdf.

Data layout: models in this framework are channel-last (NHWC — the TPU conv
layout); the bottleneck internally folds batch+spatial dims into one axis per
channel, mirroring the reference's (C, 1, B*H*W) reshape
(entropy_models.py:514-516).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from lmic_tpu.entropy.coder import CdfTable
from lmic_tpu.ops import lower_bound
from lmic_tpu.ops.cdf import batched_pmf_to_quantized_cdf

LIKELIHOOD_BOUND = 1e-9


def quantize_noise(x, key):
    """Additive U(-0.5, 0.5) training proxy for rounding."""
    return x + jax.random.uniform(key, x.shape, x.dtype, -0.5, 0.5)


def quantize_dequantize(x, means=None):
    """round(x - means) + means (eval-mode forward)."""
    if means is not None:
        return jnp.round(x - means) + means
    return jnp.round(x)


def quantize_symbols(x, means=None):
    """Integer symbols for the entropy coder."""
    if means is not None:
        x = x - means
    return jnp.round(x).astype(jnp.int32)


def dequantize(symbols, means=None, dtype=jnp.float32):
    out = symbols.astype(dtype)
    if means is not None:
        out = out + means
    return out


class EntropyBottleneck(nn.Module):
    """Factorized-prior entropy bottleneck.

    The per-channel cumulative is a 5-stage monotone MLP
    `logits = H_i @ logits + b_i (+ tanh(a_i) * tanh(logits))` with
    softplus-positive H (reference entropy_models.py:457-477). Here every
    stage is a single batched einsum over all channels.
    """

    channels: int
    tail_mass: float = 1e-9
    init_scale: float = 10.0
    filters: Sequence[int] = (3, 3, 3, 3)

    def setup(self):
        filters = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        C = self.channels

        matrices, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            init_v = math.log(math.expm1(1 / scale / filters[i + 1]))
            matrices.append(
                self.param(
                    f"matrix_{i}",
                    lambda k, s, v=init_v: jnp.full(s, v, jnp.float32),
                    (C, filters[i + 1], filters[i]),
                )
            )
            biases.append(
                self.param(
                    f"bias_{i}",
                    lambda k, s: jax.random.uniform(k, s, jnp.float32, -0.5, 0.5),
                    (C, filters[i + 1], 1),
                )
            )
            if i < len(self.filters):
                factors.append(
                    self.param(
                        f"factor_{i}",
                        lambda k, s: jnp.zeros(s, jnp.float32),
                        (C, filters[i + 1], 1),
                    )
                )
        self._matrices = matrices
        self._biases = biases
        self._factors = factors

        self.quantiles = self.param(
            "quantiles",
            lambda k, s: jnp.tile(
                jnp.array([-self.init_scale, 0.0, self.init_scale]), (C, 1, 1)
            ),
            (C, 1, 3),
        )

    def _logits_cumulative(self, inputs, stop_gradient: bool):
        """inputs: (C, 1, N) -> logits (C, 1, N)."""
        logits = inputs
        for i in range(len(self.filters) + 1):
            m = self._matrices[i]
            b = self._biases[i]
            if stop_gradient:
                m = jax.lax.stop_gradient(m)
                b = jax.lax.stop_gradient(b)
            logits = jnp.einsum(
                "cij,cjn->cin",
                jax.nn.softplus(m),
                logits,
                precision=jax.lax.Precision.HIGHEST,
            ) + b
            if i < len(self.filters):
                f = self._factors[i]
                if stop_gradient:
                    f = jax.lax.stop_gradient(f)
                logits = logits + jnp.tanh(f) * jnp.tanh(logits)
        return logits

    def _likelihood(self, inputs):
        lower = self._logits_cumulative(inputs - 0.5, stop_gradient=False)
        upper = self._logits_cumulative(inputs + 0.5, stop_gradient=False)
        sign = jax.lax.stop_gradient(-jnp.sign(lower + upper))
        return jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower)
        )

    def medians(self):
        return self.quantiles[:, 0, 1]

    def aux_loss(self):
        """Drives the quantiles to the tail-mass logit targets
        (reference entropy_models.py:450-454); transform params are frozen
        under stop_gradient so only `quantiles` learns from this loss."""
        logits = self._logits_cumulative(self.quantiles, stop_gradient=True)
        t = math.log(2 / self.tail_mass - 1)
        target = jnp.array([-t, 0.0, t], dtype=logits.dtype)
        return jnp.abs(logits - target).sum()

    def __call__(self, x, training: bool = True):
        """x: (..., C) channel-last. Returns (x_hat, likelihoods)."""
        shape = x.shape
        C = shape[-1]
        # (..., C) -> (C, 1, N)
        values = jnp.moveaxis(x.reshape(-1, C), -1, 0)[:, None, :]

        medians = self.quantiles[:, :, 1:2]
        if training:
            outputs = quantize_noise(values, self.make_rng("noise"))
        else:
            outputs = quantize_dequantize(values, medians)

        likelihood = self._likelihood(outputs)
        likelihood = lower_bound(
            likelihood, jnp.asarray(LIKELIHOOD_BOUND, likelihood.dtype)
        )

        outputs = jnp.moveaxis(outputs[:, 0, :], 0, -1).reshape(shape)
        likelihood = jnp.moveaxis(likelihood[:, 0, :], 0, -1).reshape(shape)
        return outputs, likelihood

    def pmf_data(self):
        """Device-side half of `update()`: per-channel pmf over the integer
        support [median - minima, median + maxima] plus tail mass
        (reference entropy_models.py:396-441). Returns numpy-convertible
        arrays; quantization to integer CDFs happens on the host."""
        medians = self.quantiles[:, 0, 1]
        minima = jnp.clip(
            jnp.ceil(medians - self.quantiles[:, 0, 0]).astype(jnp.int32), 0
        )
        maxima = jnp.clip(
            jnp.ceil(self.quantiles[:, 0, 2] - medians).astype(jnp.int32), 0
        )
        pmf_length = maxima + minima + 1
        max_length = int(pmf_length.max())  # host sync; update() is host-side

        pmf_start = medians - minima
        samples = (
            jnp.arange(max_length, dtype=jnp.float32)[None, :]
            + pmf_start[:, None, None]
        )  # (C, 1, L)
        lower = self._logits_cumulative(samples - 0.5, stop_gradient=True)
        upper = self._logits_cumulative(samples + 0.5, stop_gradient=True)
        sign = -jnp.sign(lower + upper)
        pmf = jnp.abs(
            jax.nn.sigmoid(sign * upper) - jax.nn.sigmoid(sign * lower)
        )[:, 0, :]
        tail_mass = (
            jax.nn.sigmoid(lower[:, 0, 0]) + jax.nn.sigmoid(-upper[:, 0, -1])
        )
        return pmf, tail_mass, pmf_length, -minima, medians


def eb_update(module: EntropyBottleneck, variables) -> "EBState":
    """Build the coder tables for an EntropyBottleneck (host-side)."""
    pmf, tail_mass, pmf_length, offset, medians = module.apply(
        variables, method=EntropyBottleneck.pmf_data
    )
    pmf = np.asarray(pmf)
    pmf_length = np.asarray(pmf_length)
    max_length = int(pmf_length.max())
    cdf = batched_pmf_to_quantized_cdf(
        pmf, np.asarray(tail_mass), pmf_length, max_length
    )
    table = CdfTable(cdf, pmf_length + 2, np.asarray(offset))
    return EBState(table=table, medians=np.asarray(medians))


@dataclasses.dataclass
class EBState:
    """Frozen coding state for one EntropyBottleneck."""

    table: CdfTable
    medians: np.ndarray  # (C,)

    def compress(self, y: np.ndarray):
        """y: (B, H, W, C) or (B, ..., C) float array. Returns list of byte
        strings, one per batch element. Symbols are coded in channel-major
        (C, spatial raster) order."""
        from lmic_tpu.entropy import coder

        y = np.asarray(y)
        B, C = y.shape[0], y.shape[-1]
        # (B, ..., C) -> (B, C, N): channel-major coding order
        flat = np.moveaxis(y.reshape(B, -1, C), -1, 1)
        medians = self.medians.reshape(1, C, 1)
        symbols = np.round(flat - medians).astype(np.int32)
        indexes = np.broadcast_to(
            np.arange(C, dtype=np.int32)[:, None], symbols.shape[1:]
        )
        return coder.encode_batch(symbols, indexes, self.table)

    def decompress(self, strings, spatial_shape) -> np.ndarray:
        """Inverse of compress: returns (B, *spatial_shape, C) float32."""
        from lmic_tpu.entropy import coder

        C = len(self.medians)
        n = int(np.prod(spatial_shape))
        indexes = np.repeat(np.arange(C, dtype=np.int32), n)
        out = coder.decode_batch(strings, indexes, self.table)
        out = out.reshape(len(strings), C, *spatial_shape).astype(np.float32)
        out += self.medians.reshape(1, C, *([1] * len(spatial_shape)))
        return np.moveaxis(out, 1, -1)


# ---------------------------------------------------------------------------
# Gaussian conditional
# ---------------------------------------------------------------------------

SCALES_MIN = 0.11
SCALES_MAX = 256
SCALES_LEVELS = 64


def get_scale_table(
    minimum=SCALES_MIN, maximum=SCALES_MAX, levels=SCALES_LEVELS
) -> np.ndarray:
    """Log-spaced scale table (reference models/google.py:208-214)."""
    return np.exp(
        np.linspace(math.log(minimum), math.log(maximum), levels)
    ).astype(np.float32)


def _standardized_cumulative(x):
    """Φ(x) via erfc for numerical precision in the tails
    (reference entropy_models.py:629-635)."""
    return 0.5 * jax.lax.erfc(-(2**-0.5) * x)


@dataclasses.dataclass(frozen=True)
class GaussianConditional:
    """Zero/known-mean Gaussian conditional likelihood + coding tables.

    Stateless config object: the scale table lives in `GCState` produced by
    `update()`. Reference: entropy_models.py:577-740.
    """

    scale_bound: float = 0.11
    tail_mass: float = 1e-9

    def likelihood(self, inputs, scales, means=None):
        values = inputs - means if means is not None else inputs
        scales = lower_bound(
            scales, jnp.asarray(self.scale_bound, scales.dtype)
        )
        values = jnp.abs(values)
        upper = _standardized_cumulative((0.5 - values) / scales)
        lower = _standardized_cumulative((-0.5 - values) / scales)
        return upper - lower

    def __call__(self, inputs, scales, means=None, training=True, key=None):
        if training:
            if key is None:
                raise ValueError("training=True requires an rng key")
            outputs = quantize_noise(inputs, key)
        else:
            outputs = quantize_dequantize(inputs, means)
        likelihood = self.likelihood(outputs, scales, means)
        likelihood = lower_bound(
            likelihood, jnp.asarray(LIKELIHOOD_BOUND, likelihood.dtype)
        )
        return outputs, likelihood

    def build_indexes(self, scale_table, scales):
        """Map each σ to its scale-table bucket. Exactly mirrors the
        reference counting rule (entropy_models.py:735-740):
        index = (L-1) - #{s in table[:-1] : σ <= s}."""
        scales = lower_bound(
            scales, jnp.asarray(self.scale_bound, scales.dtype)
        )
        table = jnp.asarray(scale_table, scales.dtype)
        counts = jnp.sum(
            scales[..., None] <= table[:-1], axis=-1, dtype=jnp.int32
        )
        return (len(scale_table) - 1) - counts

    def update(self, scale_table) -> "GCState":
        """Build integer CDF rows, one per table scale (host-side).
        Reference: entropy_models.py:655-678."""
        scale_table = np.asarray(scale_table, dtype=np.float32)
        multiplier = -scipy.stats.norm.ppf(self.tail_mass / 2)
        pmf_center = np.ceil(scale_table * multiplier).astype(np.int32)
        pmf_length = 2 * pmf_center + 1
        max_length = int(pmf_length.max())

        samples = np.abs(
            np.arange(max_length, dtype=np.int32) - pmf_center[:, None]
        ).astype(np.float32)
        scales = scale_table[:, None].astype(np.float32)
        # evaluate Φ on device in one batched call
        upper = np.asarray(
            _standardized_cumulative(jnp.asarray((0.5 - samples) / scales))
        )
        lower = np.asarray(
            _standardized_cumulative(jnp.asarray((-0.5 - samples) / scales))
        )
        pmf = upper - lower
        tail_mass = 2 * lower[:, :1]

        cdf = batched_pmf_to_quantized_cdf(
            pmf, tail_mass, pmf_length, max_length
        )
        table = CdfTable(cdf, pmf_length + 2, -pmf_center)
        return GCState(table=table, scale_table=scale_table, gc=self)


@dataclasses.dataclass
class GCState:
    """Frozen coding state for a GaussianConditional."""

    table: CdfTable
    scale_table: np.ndarray
    gc: GaussianConditional

    def compress(self, inputs, indexes, means=None):
        """inputs/indexes: (B, ...) arrays (same shape). One string per
        batch element, coded in the arrays' flattened order."""
        from lmic_tpu.entropy import coder

        inputs = np.asarray(inputs)
        indexes = np.asarray(indexes)
        if means is not None:
            inputs = inputs - np.asarray(means)
        symbols = np.round(inputs).astype(np.int32)
        B = symbols.shape[0]
        return coder.encode_batch(
            symbols.reshape(B, -1), indexes.reshape(B, -1), self.table
        )

    def decompress(self, strings, indexes, means=None) -> np.ndarray:
        from lmic_tpu.entropy import coder

        indexes = np.asarray(indexes)
        B = indexes.shape[0]
        out = coder.decode_batch(
            strings, indexes.reshape(B, -1), self.table
        ).reshape(indexes.shape).astype(np.float32)
        if means is not None:
            out = out + np.asarray(means)
        return out
