"""Cheng2020 anchor / attention models (reference:
compressai/models/waseda.py:49-158).

Residual-block transforms with sub-pixel upsampling replacing the conv-GDN
stacks; the attention variant adds Cheng2020 sigmoid-gated attention blocks.
Both inherit the mbt2018 joint autoregressive entropy machinery (including
the wavefront codec) with M = N. Note the vendored reference keeps the
single Gaussian conditional (no GMM), and so do we.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from lmic_tpu.layers import (
    AttentionBlock,
    Conv,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SubpelConv3x3,
    conv3x3,
)
from lmic_tpu.models.joint import JointAutoregressiveHierarchicalPriors


def _leaky(x):
    return nn.leaky_relu(x, 0.01)


class Cheng2020Anchor(JointAutoregressiveHierarchicalPriors):
    """cheng2020-anchor: M = N; residual/subpel transforms."""

    def _make_g_a(self):
        N, dt = self.N, self.dtype
        return nn.Sequential([
            ResidualBlockWithStride(N, stride=2, dtype=dt),
            ResidualBlock(N, dtype=dt),
            ResidualBlockWithStride(N, stride=2, dtype=dt),
            ResidualBlock(N, dtype=dt),
            ResidualBlockWithStride(N, stride=2, dtype=dt),
            ResidualBlock(N, dtype=dt),
            conv3x3(N, stride=2, dtype=dt),
        ])

    def _make_g_s(self):
        N, dt = self.N, self.dtype
        return nn.Sequential([
            ResidualBlock(N, dtype=dt),
            ResidualBlockUpsample(N, 2, dtype=dt),
            ResidualBlock(N, dtype=dt),
            ResidualBlockUpsample(N, 2, dtype=dt),
            ResidualBlock(N, dtype=dt),
            ResidualBlockUpsample(N, 2, dtype=dt),
            ResidualBlock(N, dtype=dt),
            SubpelConv3x3(self.channel, 2, dtype=dt),
        ])

    def _make_h_a(self):
        N, dt = self.N, self.dtype
        return nn.Sequential([
            conv3x3(N, dtype=dt), _leaky,
            conv3x3(N, dtype=dt), _leaky,
            conv3x3(N, stride=2, dtype=dt), _leaky,
            conv3x3(N, dtype=dt), _leaky,
            conv3x3(N, stride=2, dtype=dt),
        ])

    def _make_h_s(self):
        N, dt = self.N, self.dtype
        return nn.Sequential([
            conv3x3(N, dtype=dt), _leaky,
            SubpelConv3x3(N, 2, dtype=dt), _leaky,
            conv3x3(N * 3 // 2, dtype=dt), _leaky,
            SubpelConv3x3(N * 3 // 2, 2, dtype=dt), _leaky,
            conv3x3(N * 2, dtype=dt),
        ])


class Cheng2020Attention(Cheng2020Anchor):
    """cheng2020-attn: adds attention blocks in g_a / g_s."""

    def _make_g_a(self):
        N, dt = self.N, self.dtype
        return nn.Sequential([
            ResidualBlockWithStride(N, stride=2, dtype=dt),
            ResidualBlock(N, dtype=dt),
            ResidualBlockWithStride(N, stride=2, dtype=dt),
            AttentionBlock(dtype=dt),
            ResidualBlock(N, dtype=dt),
            ResidualBlockWithStride(N, stride=2, dtype=dt),
            ResidualBlock(N, dtype=dt),
            conv3x3(N, stride=2, dtype=dt),
            AttentionBlock(dtype=dt),
        ])

    def _make_g_s(self):
        N, dt = self.N, self.dtype
        return nn.Sequential([
            AttentionBlock(dtype=dt),
            ResidualBlock(N, dtype=dt),
            ResidualBlockUpsample(N, 2, dtype=dt),
            ResidualBlock(N, dtype=dt),
            ResidualBlockUpsample(N, 2, dtype=dt),
            AttentionBlock(dtype=dt),
            ResidualBlock(N, dtype=dt),
            ResidualBlockUpsample(N, 2, dtype=dt),
            ResidualBlock(N, dtype=dt),
            SubpelConv3x3(self.channel, 2, dtype=dt),
        ])
