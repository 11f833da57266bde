"""RGB-T `_R` / `_D` variants of mbt2018 and cheng2020.

Reference: compressai/models/google.py:696-1477 and
compressai/models/waseda.py:162-694. The `_R` models are hidden-emitting
codecs for the guide modality (structurally the Guided_compresser family);
the `_D` models code the dependent (depth/thermal, 1-channel) modality with
per-level fusion: at each transform level the master feature and the guide's
corresponding hidden map pass through edge-extract convs, are concat-fused
by a 1x1-ish conv, gated by ESA spatial attention, and concatenated back
into the main path. The entropy machinery is mbt2018's wavefront codec.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lmic_tpu.layers import (
    ESA,
    AttentionBlock,
    Conv,
    Deconv,
    GDN,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SubpelConv3x3,
    conv3x3,
)
from lmic_tpu.models.joint import JointARCodec
from lmic_tpu.models.rgbt import GuidedCodec, GuidedCompresser


def _leaky(x):
    return nn.leaky_relu(x, 0.01)


class JointAutoregressiveHierarchicalPriors_R(GuidedCompresser):
    """mbt2018 guide codec with hidden taps (google.py:746-1003) — same
    structure as the paper's Guided_compresser; RGB guide by default."""

    pass


class _EdgeFuse(nn.Module):
    """One fusion level: edge-extract both streams, concat -> conv -> ESA
    (reference google.py:1150-1157)."""

    N: int

    @nn.compact
    def __call__(self, x, hidden_map):
        eg = nn.relu(conv3x3(self.N)(x))
        h = nn.relu(conv3x3(self.N)(hidden_map))
        fused = Conv(self.N, kernel_size=5, stride=1)(
            jnp.concatenate([eg, h], axis=-1)
        )
        return ESA()(fused)


class JointAutoregressiveHierarchicalPriors_D(GuidedCompresser):
    """Hidden-consuming mbt2018 for the dependent 1-channel modality
    (google.py:1006-1423). `__call__(x, hidden)` with hidden =
    {ga1..3, gs1..3} from the `_R` model."""

    def setup(self):
        super().setup()
        N, M = self.N, self.M
        self.pic2_ga_convs = [
            Conv(N), Conv(N), Conv(N), Conv(M),
        ]
        self.pic2_ga_gdns = [GDN(), GDN(), GDN()]
        self.pic2_gs_convs = [
            Deconv(N), Deconv(N), Deconv(N), Deconv(self.channel),
        ]
        self.pic2_gs_gdns = [
            GDN(inverse=True), GDN(inverse=True), GDN(inverse=True)
        ]
        self.enc_fuse = [_EdgeFuse(N) for _ in range(3)]
        self.dec_fuse = [_EdgeFuse(N) for _ in range(3)]

    def g_a_fused(self, x, hidden):
        x = self.pic2_ga_gdns[0](self.pic2_ga_convs[0](x))
        for i in range(3):
            f = self.enc_fuse[i](x, hidden[f"ga{i+1}"])
            x = self.pic2_ga_convs[i + 1](jnp.concatenate([x, f], axis=-1))
            if i < 2:
                x = self.pic2_ga_gdns[i + 1](x)
        return x  # y

    def g_s_fused(self, y_hat, hidden):
        x = self.pic2_gs_gdns[0](self.pic2_gs_convs[0](y_hat))
        for i in range(3):
            f = self.dec_fuse[i](x, hidden[f"gs{i+1}"])
            x = self.pic2_gs_convs[i + 1](jnp.concatenate([x, f], axis=-1))
            if i < 2:
                x = self.pic2_gs_gdns[i + 1](x)
        return x  # x_hat

    def analyze_fused(self, x, hidden):
        y = self.g_a_fused(x, hidden)
        z = self.h_a_net(y)
        return y, z

    def __call__(self, x, hidden, training: bool = True):
        y, z = self.analyze_fused(x, hidden)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training)
        params = self.h_s_net(z_hat)
        if training:
            key = self.make_rng("noise")
            y_hat = y + jax.random.uniform(key, y.shape, y.dtype, -0.5, 0.5)
        else:
            y_hat = jnp.round(y)
        ctx_params = self.context_prediction(y_hat)
        scales_hat, means_hat = self.param_fuse(params, ctx_params)
        key = self.make_rng("noise") if training else None
        _, y_likelihoods = self.gaussian_conditional(
            y, scales_hat, means=means_hat, training=training, key=key
        )
        x_hat = self.g_s_fused(y_hat, hidden)
        return {
            "x_hat": x_hat,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
        }


class Cheng2020Anchor_R(JointAutoregressiveHierarchicalPriors_R):
    """GDN transforms + cheng hyper networks (waseda.py:162-209 keeps the
    Encoder1/Decoder1 transforms and swaps only h_a/h_s)."""

    def _make_h_a(self):
        N = self.N
        return nn.Sequential([
            conv3x3(N), _leaky,
            conv3x3(N), _leaky,
            conv3x3(N, stride=2), _leaky,
            conv3x3(N), _leaky,
            conv3x3(N, stride=2),
        ])

    def _make_h_s(self):
        N = self.N
        return nn.Sequential([
            conv3x3(N), _leaky,
            SubpelConv3x3(N, 2), _leaky,
            conv3x3(N * 3 // 2), _leaky,
            SubpelConv3x3(N * 3 // 2, 2), _leaky,
            conv3x3(N * 2),
        ])


class ChengEncoderHidden(nn.Module):
    """Encoder_cheng with hidden taps (waseda.py:409-433)."""

    N: int

    @nn.compact
    def __call__(self, x):
        N = self.N
        x = ResidualBlockWithStride(N, stride=2)(x)
        h1 = ResidualBlock(N)(x)
        x = ResidualBlockWithStride(N, stride=2)(h1)
        x = AttentionBlock()(x)
        h2 = ResidualBlock(N)(x)
        x = ResidualBlockWithStride(N, stride=2)(h2)
        h3 = ResidualBlock(N)(x)
        x = conv3x3(N, stride=2)(x)
        x = AttentionBlock()(x)
        return x, h1, h2, h3


class ChengDecoderHidden(nn.Module):
    """Decoder_cheng with hidden taps (waseda.py:436-460)."""

    N: int
    channel: int = 3

    @nn.compact
    def __call__(self, y_hat):
        N = self.N
        x = AttentionBlock()(y_hat)
        x = ResidualBlock(N)(x)
        h1 = ResidualBlockUpsample(N, 2)(x)
        x = ResidualBlock(N)(h1)
        x = ResidualBlockUpsample(N, 2)(x)
        h2 = AttentionBlock()(x)
        x = ResidualBlock(N)(h2)
        h3 = ResidualBlockUpsample(N, 2)(x)
        x = ResidualBlock(N)(h3)
        x = SubpelConv3x3(self.channel, 2)(x)
        return x, h1, h2, h3


class Cheng2020Attention_R(Cheng2020Anchor_R):
    """cheng transforms with hidden taps (waseda.py:212-261)."""

    def _make_g_a(self):
        return ChengEncoderHidden(N=self.N)

    def _make_g_s(self):
        return ChengDecoderHidden(N=self.N, channel=self.channel)


class Cheng2020Anchor_D(JointAutoregressiveHierarchicalPriors_D):
    """Fused-GDN transforms + cheng hyper (waseda.py:463-530)."""

    def _make_h_a(self):
        return Cheng2020Anchor_R._make_h_a(self)

    def _make_h_s(self):
        return Cheng2020Anchor_R._make_h_s(self)


class Cheng2020Attention_D(Cheng2020Anchor_D):
    """Residual/attention fused transforms (waseda.py:533-694)."""

    def setup(self):
        super().setup()
        N = self.N
        self.ga_blocks_pre = [
            # level entries: (downsample block, post blocks)
            ResidualBlockWithStride(N, stride=2),
        ]
        self.g_a_rb1 = ResidualBlock(N)
        self.g_a_rbs2 = ResidualBlockWithStride(N, stride=2)
        self.g_a_att1 = AttentionBlock()
        self.g_a_rb2 = ResidualBlock(N)
        self.g_a_rbs3 = ResidualBlockWithStride(N, stride=2)
        self.g_a_rb3 = ResidualBlock(N)
        self.g_a_conv = conv3x3(N, stride=2)
        self.g_a_att2 = AttentionBlock()

        self.g_s_att1 = AttentionBlock()
        self.g_s_rb1 = ResidualBlock(N)
        self.g_s_rbs1 = ResidualBlockUpsample(N, 2)
        self.g_s_rb2 = ResidualBlock(N)
        self.g_s_rbs2 = ResidualBlockUpsample(N, 2)
        self.g_s_att2 = AttentionBlock()
        self.g_s_rb3 = ResidualBlock(N)
        self.g_s_rbs3 = ResidualBlockUpsample(N, 2)
        self.g_s_rb4 = ResidualBlock(N)
        self.g_s_conv = SubpelConv3x3(self.channel, 2)

    def g_a_fused(self, x, hidden):
        x = self.ga_blocks_pre[0](x)
        x = self.g_a_rb1(x)
        f1 = self.enc_fuse[0](x, hidden["ga1"])
        x = self.g_a_rbs2(jnp.concatenate([x, f1], axis=-1))
        x = self.g_a_att1(x)
        x = self.g_a_rb2(x)
        f2 = self.enc_fuse[1](x, hidden["ga2"])
        x = self.g_a_rbs3(jnp.concatenate([x, f2], axis=-1))
        x = self.g_a_rb3(x)
        f3 = self.enc_fuse[2](x, hidden["ga3"])
        x = self.g_a_conv(jnp.concatenate([x, f3], axis=-1))
        return self.g_a_att2(x)

    def g_s_fused(self, y_hat, hidden):
        x = self.g_s_att1(y_hat)
        x = self.g_s_rb1(x)
        x = self.g_s_rbs1(x)
        f1 = self.dec_fuse[0](x, hidden["gs1"])
        x = self.g_s_rb2(jnp.concatenate([x, f1], axis=-1))
        x = self.g_s_rbs2(x)
        x = self.g_s_att2(x)
        f2 = self.dec_fuse[1](x, hidden["gs2"])
        x = self.g_s_rb3(jnp.concatenate([x, f2], axis=-1))
        x = self.g_s_rbs3(x)
        f3 = self.dec_fuse[2](x, hidden["gs3"])
        x = self.g_s_rb4(jnp.concatenate([x, f3], axis=-1))
        return self.g_s_conv(x)


class FusedARCodec(JointARCodec):
    """Codec for `_D` models: compress(x, hidden_ga), decompress(strings,
    shape, hidden_gs). Entropy path is the shared wavefront machinery."""

    def __init__(self, module, variables):
        super().__init__(module, variables)
        cls = type(module)
        self._analyze_fused = jax.jit(
            lambda x, hid: module.apply(
                variables, x, hid, method=cls.analyze_fused
            )
        )
        self._g_s_fused = jax.jit(
            lambda y, hid: jnp.clip(
                module.apply(variables, y, hid, method=cls.g_s_fused),
                0.0, 1.0,
            )
        )

    def __call__(self, x, hidden, training=False, key=None):
        rngs = {"noise": key} if training else None
        return self.module.apply(
            self.variables, x, hidden, training=training, rngs=rngs
        )

    def compress(self, x, hidden):
        self._check_updated()
        hidden = {k: jnp.asarray(v) for k, v in hidden.items()
                  if k.startswith("ga")}
        y, z = jax.device_get(self._analyze_fused(jnp.asarray(x), hidden))
        return self._code_y_z(np.asarray(y), np.asarray(z))

    def decompress(self, strings, shape, hidden):
        self._check_updated()
        y_hat = self._decode_y_hat(strings, shape)
        hidden = {k: jnp.asarray(v) for k, v in hidden.items()
                  if k.startswith("gs")}
        x_hat = np.asarray(self._g_s_fused(jnp.asarray(y_hat), hidden))
        return {"x_hat": x_hat}
