"""Image codec transform networks (flax, NHWC).

Model family of the reference zoo (compressai/models/google.py):

- `FactorizedPrior`        (bmshj2018-factorized, google.py:127-204)
- `ScaleHyperprior`        (bmshj2018-hyperprior, google.py:218-344)
- `MeanScaleHyperprior`    (mbt2018-mean,         google.py:348-416)

Each module's `__call__` is the differentiable training forward returning
`{"x_hat", "likelihoods": {...}}`; the split sub-network methods (`g_a`,
`g_s`, `hyper_to_params`, ...) are what the host-side codec wrappers jit for
the compress/decompress paths (see lmic_tpu.models.codec).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lmic_tpu.entropy.entropy_models import (
    EntropyBottleneck,
    GaussianConditional,
    quantize_dequantize,
)
from lmic_tpu.layers import GDN, Conv, Deconv
from lmic_tpu.ops.math import from_amp


class FactorizedPrior(nn.Module):
    """4x (conv s2 + GDN) analysis / mirrored synthesis, factorized prior.

    N: internal width; M: bottleneck channels; channel: input channels
    (the fork's `channel=` extension for thermal single-channel inputs).
    """

    N: int
    M: int
    channel: int = 3
    # Activation compute dtype (e.g. jnp.bfloat16 for AMP training): conv
    # and GDN activations run in this dtype while parameters and all
    # entropy/likelihood math stay f32. Leave None (f32) for codec wires —
    # the frozen bitstream formats assume f32 transforms.
    dtype: Any = None

    def setup(self):
        dt = self.dtype
        self.g_a_net = nn.Sequential([
            Conv(self.N, dtype=dt), GDN(dtype=dt),
            Conv(self.N, dtype=dt), GDN(dtype=dt),
            Conv(self.N, dtype=dt), GDN(dtype=dt),
            Conv(self.M, dtype=dt),
        ])
        self.g_s_net = nn.Sequential([
            Deconv(self.N, dtype=dt), GDN(inverse=True, dtype=dt),
            Deconv(self.N, dtype=dt), GDN(inverse=True, dtype=dt),
            Deconv(self.N, dtype=dt), GDN(inverse=True, dtype=dt),
            Deconv(self.channel, dtype=dt),
        ])
        self.entropy_bottleneck = EntropyBottleneck(channels=self.M)

    @property
    def downsampling_factor(self) -> int:
        return 2**4

    def g_a(self, x):
        return from_amp(self.g_a_net(x))

    def g_s(self, y_hat):
        return from_amp(self.g_s_net(y_hat))


    def __call__(self, x, training: bool = True):
        # subnet outputs are cast back to f32 at the entropy/loss
        # boundaries: quantization-noise and likelihood math is
        # precision-sensitive and stays f32 under AMP (dtype=bf16).
        y = from_amp(self.g_a_net(x))
        y_hat, y_likelihoods = self.entropy_bottleneck(y, training=training)
        x_hat = from_amp(self.g_s_net(y_hat))
        return {"x_hat": x_hat, "likelihoods": {"y": y_likelihoods}}

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class ScaleHyperprior(nn.Module):
    """Hyperprior model: h_a(|y|) -> z; h_s(z_hat) -> sigma for the Gaussian
    conditional on y. Reference google.py:218-344."""

    N: int
    M: int
    channel: int = 3
    dtype: Any = None  # AMP activation dtype; see FactorizedPrior.dtype

    def setup(self):
        self.g_a_net = self._make_g_a()
        self.g_s_net = self._make_g_s()
        self.h_a_net = self._make_h_a()
        self.h_s_net = self._make_h_s()
        self.entropy_bottleneck = EntropyBottleneck(channels=self.N)
        self.gaussian_conditional = GaussianConditional()

    def _make_g_a(self):
        dt = self.dtype
        return nn.Sequential([
            Conv(self.N, dtype=dt), GDN(dtype=dt),
            Conv(self.N, dtype=dt), GDN(dtype=dt),
            Conv(self.N, dtype=dt), GDN(dtype=dt),
            Conv(self.M, dtype=dt),
        ])

    def _make_g_s(self):
        dt = self.dtype
        return nn.Sequential([
            Deconv(self.N, dtype=dt), GDN(inverse=True, dtype=dt),
            Deconv(self.N, dtype=dt), GDN(inverse=True, dtype=dt),
            Deconv(self.N, dtype=dt), GDN(inverse=True, dtype=dt),
            Deconv(self.channel, dtype=dt),
        ])

    def _make_h_a(self):
        dt = self.dtype
        return nn.Sequential([
            Conv(self.N, kernel_size=3, stride=1, dtype=dt), nn.relu,
            Conv(self.N, dtype=dt), nn.relu,
            Conv(self.N, dtype=dt),
        ])

    def _make_h_s(self):
        dt = self.dtype
        return nn.Sequential([
            Deconv(self.N, dtype=dt), nn.relu,
            Deconv(self.N, dtype=dt), nn.relu,
            Conv(self.M, kernel_size=3, stride=1, dtype=dt), nn.relu,
        ])

    @property
    def downsampling_factor(self) -> int:
        return 2**6

    def g_a(self, x):
        return from_amp(self.g_a_net(x))

    def g_s(self, y_hat):
        return from_amp(self.g_s_net(y_hat))

    def h_a(self, y):
        return from_amp(self.h_a_net(jnp.abs(y)))

    def hyper_to_params(self, z_hat):
        """z_hat -> (scales, means). Shared by the enc/dec device fns so the
        scale-bucket indexes are bit-identical on both sides."""
        return from_amp(self.h_s_net(z_hat)), None

    def analyze(self, x):
        """Encoder device pass: (y, z)."""
        y = from_amp(self.g_a_net(x))
        z = from_amp(self.h_a_net(jnp.abs(y)))
        return y, z

    def __call__(self, x, training: bool = True):
        # f32 casts at the entropy boundaries: under AMP (dtype=bf16) the
        # transforms run in bf16 but quantization noise, CDF evaluation,
        # and the scale conditioning stay f32.
        y = from_amp(self.g_a_net(x))
        z = from_amp(self.h_a_net(jnp.abs(y)))
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training)
        scales_hat = from_amp(self.h_s_net(z_hat))
        key = self.make_rng("noise") if training else None
        y_hat, y_likelihoods = self.gaussian_conditional(
            y, scales_hat, training=training, key=key
        )
        x_hat = from_amp(self.g_s_net(y_hat))
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class MeanScaleHyperprior(ScaleHyperprior):
    """Hyperprior emitting (sigma, mu) — mbt2018-mean.
    Reference google.py:348-416."""

    def _make_h_a(self):
        dt = self.dtype
        return nn.Sequential([
            Conv(self.N, kernel_size=3, stride=1, dtype=dt),
            lambda x: nn.leaky_relu(x, 0.01),
            Conv(self.N, dtype=dt),
            lambda x: nn.leaky_relu(x, 0.01),
            Conv(self.N, dtype=dt),
        ])

    def _make_h_s(self):
        dt = self.dtype
        return nn.Sequential([
            Deconv(self.M, dtype=dt),
            lambda x: nn.leaky_relu(x, 0.01),
            Deconv(self.M * 3 // 2, dtype=dt),
            lambda x: nn.leaky_relu(x, 0.01),
            Conv(self.M * 2, kernel_size=3, stride=1, dtype=dt),
        ])

    def h_a(self, y):
        # no abs for the mean-scale variant
        return from_amp(self.h_a_net(y))

    def hyper_to_params(self, z_hat):
        params = from_amp(self.h_s_net(z_hat))
        scales, means = jnp.split(params, 2, axis=-1)
        return scales, means

    def analyze(self, x):
        y = from_amp(self.g_a_net(x))
        z = from_amp(self.h_a_net(y))
        return y, z

    def __call__(self, x, training: bool = True):
        y = from_amp(self.g_a_net(x))
        z = from_amp(self.h_a_net(y))
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training)
        scales_hat, means_hat = self.hyper_to_params(z_hat)
        key = self.make_rng("noise") if training else None
        y_hat, y_likelihoods = self.gaussian_conditional(
            y, scales_hat, means=means_hat, training=training, key=key
        )
        x_hat = from_amp(self.g_s_net(y_hat))
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }
