"""RGB-T multi-modality codecs — the paper models.

Reference: compressai/models/master.py (CVPR'22 "Learning based
Multi-modality Image and Video Compression").

- `GuidedCompresser` (master.py:1227-1464): an mbt2018 codec for the guide
  modality whose encoder/decoder expose three intermediate GDN feature maps
  (`ga1..3` / `gs1..3`) consumed by the master codec.
- `MasterCompresser` (master.py:839-1161): codes the master modality
  conditioned on the guide reconstruction: feature encoders bring both
  modalities to a shared 64-channel grid, a `ChannelAligner` computes a
  per-channel affine (beta, gamma) of the guide feature — transmitted
  losslessly as side info — and the decoder fuses the guide's hidden maps
  through three Swin-style windowed CROSS-attention `SpatialAligner`s
  (q from the master path, k/v from the guide).

TPU adaptations (documented deviations, weights are trained in-framework):
- channel-last everywhere; attention masks/bias indexes are built statically
  from traced shapes, so spatial size is per-trace rather than baked into
  the constructor (reference hard-wires width/height at 512x640).
- the reference reinterprets the (B, L, C) Swin output as (B, C, h, w) with
  a raw `.view` (master.py:738-739) — a layout scramble its trained weights
  learned around. `SpatialAligner` REPRODUCES that scramble bit-for-bit
  (see the flatten/reinterpret at the end of its `__call__`): imported
  reference weights only give parity through the exact same layout
  (docs/parity.md). Do not "fix" it to a transpose.
- dropout/drop-path rates are all zero in the reference config and omitted.
The entropy path is exactly mbt2018's and reuses the wavefront codec.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lmic_tpu.entropy import coder as rans
from lmic_tpu.entropy.entropy_models import (
    EntropyBottleneck,
    GaussianConditional,
)
from lmic_tpu.layers import GDN, Conv, Deconv, MaskedConv2d, conv1x1, conv3x3
from lmic_tpu.models.image import ScaleHyperprior
from lmic_tpu.ops.math import from_amp
from lmic_tpu.models.joint import (
    JointARCodec,
    JointAutoregressiveHierarchicalPriors,
)


def _leaky(x):
    return nn.leaky_relu(x, 0.01)


# ---------------------------------------------------------------------------
# Feature-space encoders / decoders (master.py:68-118)
# ---------------------------------------------------------------------------


class _ResBlock64(nn.Module):
    """conv3x3 -> lrelu -> conv3x3 -> lrelu (+1x1 skip) at 64 channels —
    the reference's layers.ResidualBlock used by the feature codecs."""

    features: int = 64

    @nn.compact
    def __call__(self, x):
        out = conv3x3(self.features)(x)
        out = _leaky(out)
        out = conv3x3(self.features)(out)
        out = _leaky(out)
        if x.shape[-1] != self.features:
            x = conv1x1(self.features)(x)
        return out + x


class FeatureEncoder(nn.Module):
    """conv3x3(stride) + 3 residual blocks with a long skip
    (master.py:68-84)."""

    out_channel: int = 64
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out = Conv(self.out_channel, kernel_size=3, stride=self.stride)(x)
        shortcut = out
        out = _ResBlock64(self.out_channel)(out)
        out = _ResBlock64(self.out_channel)(out)
        out = _ResBlock64(self.out_channel)(out)
        return out + shortcut


class FeatureDecoder(nn.Module):
    """3 residual blocks + deconv back to image space (master.py:99-118)."""

    out_channel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        shortcut = x
        out = _ResBlock64(64)(x)
        out = _ResBlock64(64)(out)
        out = _ResBlock64(64)(out)
        out = out + conv1x1(64)(shortcut)
        return Deconv(self.out_channel, kernel_size=3, stride=self.stride)(out)


class ChannelAligner(nn.Module):
    """Channel-wise affine alignment of the guide feature
    (master.py:158-210). The 4-stage trunk is SHARED between the two
    branches; separate heads produce beta (from the master feature) and
    gamma (from the guide feature), globally average-pooled to (B, 1, 1, 64).
    beta/gamma are transmitted losslessly as bitstream side info."""

    @nn.compact
    def __call__(self, x_feature, guided_feature):
        trunk = [Conv(256, kernel_size=3, stride=1) for _ in range(4)]
        head_beta = Conv(64, kernel_size=3, stride=1)
        head_gamma = Conv(64, kernel_size=3, stride=1)

        def run_trunk(f):
            for conv in trunk:
                f = _leaky(conv(f))
            return f

        beta = jnp.mean(
            head_beta(run_trunk(x_feature)), axis=(1, 2), keepdims=True
        )
        gamma = jnp.mean(
            head_gamma(run_trunk(guided_feature)), axis=(1, 2), keepdims=True
        )
        aligned = gamma * guided_feature + beta
        return aligned, beta, gamma


# ---------------------------------------------------------------------------
# Swin-style guided cross-attention (master.py:386-742)
# ---------------------------------------------------------------------------


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B * nW, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(windows, ws: int, H: int, W: int):
    """(B * nW, ws*ws, C) -> (B, H, W, C)."""
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    """Static (ws*ws, ws*ws) index into the (2ws-1)^2 bias table
    (master.py:512-523)."""
    coords = np.stack(
        np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws*ws, ws*ws) additive mask for shifted windows
    (master.py:627-645). Static: H, W are trace-time Python ints."""
    img_mask = np.zeros((H, W), np.float32)
    slices = (
        slice(0, -ws),
        slice(-ws, -shift),
        slice(-shift, None),
    )
    cnt = 0
    for h in slices:
        for w in slices:
            img_mask[h, w] = cnt
            cnt += 1
    # pure-numpy window partition (this runs at trace time)
    mask_windows = (
        img_mask.reshape(H // ws, ws, W // ws, ws)
        .transpose(0, 2, 1, 3)
        .reshape(-1, ws * ws)
    )
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowCrossAttention(nn.Module):
    """Windowed multi-head CROSS attention with relative position bias:
    q from x, k/v from the guide (master.py:484-568)."""

    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x, guided, mask=None):
        B_, N, C = x.shape
        ws, nh = self.window_size, self.num_heads
        head_dim = C // nh
        scale = head_dim**-0.5

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), nh),
        )
        rel_index = _relative_position_index(ws)

        q = nn.Dense(C, name="qkv1")(x)
        kv = nn.Dense(2 * C, name="qkv2")(guided)
        q = q.reshape(B_, N, nh, head_dim).transpose(0, 2, 1, 3)
        kv = kv.reshape(B_, N, 2, nh, head_dim).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]

        attn = (q * scale) @ k.transpose(0, 1, 3, 2)  # (B_, nh, N, N)
        rel_bias = bias_table[rel_index.reshape(-1)].reshape(N, N, nh)
        attn = attn + rel_bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, nh, N, N) + mask[
                None, :, None, :, :
            ]
            attn = attn.reshape(B_, nh, N, N)
        attn = jax.nn.softmax(attn, axis=-1)

        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, name="proj")(out)


class SwinCrossBlock(nn.Module):
    """One Swin cross-attention block: (shifted-)window attention + MLP,
    operating on (B, H, W, C) (master.py:572-706). `norm1` is shared
    between x and the guide, matching the reference."""

    dim: int
    num_heads: int
    window_size: int = 4
    shift_size: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, guided):
        B, H, W, C = x.shape
        ws, shift = self.window_size, self.shift_size
        if min(H, W) <= ws:
            shift = 0
            ws = min(H, W)

        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        shortcut = x
        xn = norm1(x)
        gn = norm1(guided)

        if shift > 0:
            xn = jnp.roll(xn, (-shift, -shift), axis=(1, 2))
            gn = jnp.roll(gn, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(H, W, ws, shift))
        else:
            mask = None

        xw = window_partition(xn, ws)
        gw = window_partition(gn, ws)
        attn = WindowCrossAttention(
            dim=self.dim, window_size=ws, num_heads=self.num_heads
        )(xw, gw, mask)
        out = window_reverse(attn, ws, H, W)
        if shift > 0:
            out = jnp.roll(out, (shift, shift), axis=(1, 2))
        x = shortcut + out

        # MLP (GELU exact, matching torch nn.GELU)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio))(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(C)(h)
        return x + h


class SpatialAligner(nn.Module):
    """Guided spatial alignment: patch-embed both streams, run 2 Swin cross
    blocks (regular + shifted), un-patch (master.py:708-742)."""

    out_channel: int = 192
    patch_size: int = 2
    embed_dim: int = 96
    window_size: int = 4
    num_heads: int = 3

    @nn.compact
    def __call__(self, x, guided):
        p = self.patch_size
        # k = s = patch_size, no padding (reference PatchEmbed master.py:414)
        embed_x = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                          padding="VALID", name="patch_embed1")
        embed_g = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                          padding="VALID", name="patch_embed2")
        out = embed_x(x)
        g = embed_g(guided)

        for i in range(2):
            out = SwinCrossBlock(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                name=f"block_{i}",
            )(out, g)

        # The reference maps the (B, L, C) token sequence back to spatial
        # with a raw `view(B, C, H', W')` — a reinterpretation, not a
        # transpose (master.py:739). Its trained recovery deconv expects
        # that exact (scrambled) layout, so reproduce it bit-for-bit:
        # flatten tokens l-major/c-minor, then reinterpret as (C, H', W').
        B, Hp, Wp, C = out.shape
        out = out.reshape(B, Hp * Wp * C)           # l*C + c order
        out = out.reshape(B, C, Hp, Wp)             # raw view, torch order
        out = out.transpose(0, 2, 3, 1)             # back to NHWC
        return Deconv(
            self.out_channel, kernel_size=p, stride=p,
            padding=0, output_padding=0, name="recovery",
        )(out)


# ---------------------------------------------------------------------------
# Guided compresser (master.py:1167-1464)
# ---------------------------------------------------------------------------


class GuidedEncoder(nn.Module):
    """mbt2018 analysis transform exposing the 3 GDN activations
    (master.py:1167-1190, Encoder1)."""

    N: int
    M: int
    first_stride: int = 2
    dtype: Any = None  # AMP activation dtype (see models/image.py)

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        g1 = GDN(dtype=dt)(Conv(self.N, stride=self.first_stride,
                                dtype=dt)(x))
        g2 = GDN(dtype=dt)(Conv(self.N, dtype=dt)(g1))
        g3 = GDN(dtype=dt)(Conv(self.N, dtype=dt)(g2))
        y = Conv(self.M, dtype=dt)(g3)
        return y, g1, g2, g3


class GuidedDecoder(nn.Module):
    """Synthesis transform exposing the 3 IGDN activations
    (master.py:1194-1215, Decoder1)."""

    N: int
    channel: int = 1
    first_stride: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, y_hat):
        dt = self.dtype
        g1 = GDN(inverse=True, dtype=dt)(Deconv(self.N, dtype=dt)(y_hat))
        g2 = GDN(inverse=True, dtype=dt)(Deconv(self.N, dtype=dt)(g1))
        g3 = GDN(inverse=True, dtype=dt)(Deconv(self.N, dtype=dt)(g2))
        x_hat = Deconv(self.channel, stride=self.first_stride, dtype=dt)(g3)
        return x_hat, g1, g2, g3


class GuidedCompresser(JointAutoregressiveHierarchicalPriors):
    """mbt2018 clone with hidden-feature taps (master.py:1227-1464).
    `channel` is the guide modality's channel count; `first_stride`
    controls the first conv stride (1 lets a half-resolution guide stay
    aligned with the master grid)."""

    first_stride: int = 2

    @property
    def downsampling_factor(self) -> int:
        # first conv at `first_stride`, 3 more stride-2 convs, hyper /4:
        # streams only roundtrip when H, W divide first_stride * 32
        return 32 * self.first_stride

    def _make_g_a(self):
        return GuidedEncoder(N=self.N, M=self.M,
                             first_stride=self.first_stride,
                             dtype=self.dtype)

    def _make_g_s(self):
        return GuidedDecoder(N=self.N, channel=self.channel,
                             first_stride=self.first_stride,
                             dtype=self.dtype)

    def g_a(self, x):
        return from_amp(self.g_a_net(x)[0])

    def g_s(self, y_hat):
        return from_amp(self.g_s_net(y_hat)[0])

    def g_a_hidden(self, x):
        """y plus the encoder hidden maps (ga1..3)."""
        y, g1, g2, g3 = self.g_a_net(x)
        f32 = jnp.float32
        return y.astype(f32), {"ga1": g1.astype(f32), "ga2": g2.astype(f32),
                               "ga3": g3.astype(f32)}

    def g_s_hidden(self, y_hat):
        """x_hat plus the decoder hidden maps the master codec consumes."""
        x_hat, g1, g2, g3 = self.g_s_net(y_hat)
        f32 = jnp.float32
        return x_hat.astype(f32), {"gs1": g1.astype(f32),
                                   "gs2": g2.astype(f32),
                                   "gs3": g3.astype(f32)}

    def analyze(self, x):
        y = from_amp(self.g_a_net(x)[0])
        z = from_amp(self.h_a_net(y))
        return y, z

    def __call__(self, x, training: bool = True):
        # f32 at the entropy boundaries under AMP (see models/image.py);
        # the hidden taps the master consumes are also emitted f32
        f32 = jnp.float32
        y, ga1, ga2, ga3 = self.g_a_net(x)
        y = y.astype(f32)
        z = self.h_a_net(y).astype(f32)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training)
        params = self.h_s_net(z_hat).astype(f32)

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
        x_hat, gs1, gs2, gs3 = self.g_s_net(y_hat)
        return {
            "x_hat": x_hat.astype(f32),
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
            "hidden": {
                "ga1": ga1.astype(f32), "ga2": ga2.astype(f32),
                "ga3": ga3.astype(f32), "gs1": gs1.astype(f32),
                "gs2": gs2.astype(f32), "gs3": gs3.astype(f32),
            },
        }


def _as_unit_float(x):
    """uint8 pixels -> [0, 1] float on device; floats pass through. The
    base codec's u8 fast path normalizes inside its own jits, so side
    computations (hidden taps, feature chains) must mirror it or they
    silently consume 0-255-scaled values."""
    x = jnp.asarray(x)
    if x.dtype == jnp.uint8:
        return x.astype(jnp.float32) / 255.0
    return x


class GuidedCodec(JointARCodec):
    """JointARCodec emitting the hidden maps on compress/decompress, exactly
    like the reference's Guided_compresser.compress (-> ga*) and
    .decompress (-> x_hat, gs*)."""

    def __init__(self, module, variables):
        super().__init__(module, variables)
        cls = type(module)
        self._g_a_hidden = jax.jit(
            lambda x: module.apply(variables, x, method=cls.g_a_hidden)
        )
        self._g_s_hidden = jax.jit(
            lambda y: module.apply(variables, y, method=cls.g_s_hidden)
        )

    def compress(self, x, hidden: bool = True, reconstruct: bool = False):
        """reconstruct=True additionally returns the DECODER's exact
        output under "x_hat"/"hidden_dec": the encode scan's y_hat is
        bit-equal to what the decode scan rebuilds from the streams (the
        roundtrip invariant), so the encoder side of the RGBT flow —
        which the reference implements as compress() then a full
        decompress() of its own streams (codec_rgbt.py:361-363) — skips
        a whole decode scan + rANS decode per guide while producing
        bit-identical downstream results (asserted in test_rgbt)."""
        if reconstruct:
            self._check_updated()
            x_np = np.asarray(x)
            self._check_dims(x_np)
            if x_np.dtype == np.uint8:
                if not hasattr(self, "_analyze_u8_ar"):
                    self._build_u8_io()
                y, z = jax.device_get(self._analyze_u8_ar(jnp.asarray(x_np)))
            else:
                y, z = jax.device_get(self._analyze(jnp.asarray(x_np)))
            out = self._code_y_z(
                np.asarray(y), np.asarray(z), keep_y_hat=True
            )
            x_hat, hidden_dec = self._g_s_hidden(
                jnp.asarray(out.pop("y_hat_latent"))
            )
            out["x_hat"] = jnp.clip(x_hat, 0.0, 1.0)
            out["hidden_dec"] = hidden_dec
        else:
            out = super().compress(x)
        # hidden analysis maps (ga*), as the reference emits on compress;
        # left on device — the consumer (master codec / training) is a
        # device computation, and the maps are large. hidden=False skips
        # the extra g_a forward for callers that only want the streams
        # (the file codec / serving guide legs).
        if hidden:
            out["hidden"] = self._g_a_hidden(_as_unit_float(x))[1]
        return out

    def decompress(self, strings, shape):
        self._check_updated()
        y_hat = self._decode_y_hat(strings, shape)
        x_hat, hidden = self._g_s_hidden(jnp.asarray(y_hat))
        return {
            "x_hat": jnp.clip(x_hat, 0.0, 1.0),
            "hidden": hidden,
        }


# ---------------------------------------------------------------------------
# Master decoder / compresser (master.py:745-1161)
# ---------------------------------------------------------------------------


class MasterDecoder(nn.Module):
    """Three deconv+IGDN stages, each spatially aligned against the guide's
    decoder hidden map and concat-fused (master.py:745-811). Output is a
    128-channel feature map for the FeatureDecoder."""

    N: int = 192
    M: int = 192
    channel: int = 128
    first_stride: int = 2
    master_chl: int = 3

    @nn.compact
    def __call__(self, y_hat, guide_hidden):
        g1, g2, g3 = (
            guide_hidden["gs1"], guide_hidden["gs2"], guide_hidden["gs3"]
        )
        if self.master_chl == 1:
            g1 = Conv(self.N)(g1)
            g2 = Conv(self.N)(g2)
            g3 = Conv(self.N)(g3)

        out = GDN(inverse=True)(Deconv(self.N)(y_hat))
        aligned = SpatialAligner(out_channel=self.N, name="sp_aligner1")(
            out, g1
        )
        out = jnp.concatenate([aligned, out], axis=-1)

        out = GDN(inverse=True)(Deconv(self.N)(out))
        aligned = SpatialAligner(out_channel=self.N, name="sp_aligner2")(
            out, g2
        )
        out = jnp.concatenate([aligned, out], axis=-1)

        out = GDN(inverse=True)(Deconv(self.N)(out))
        aligned = SpatialAligner(out_channel=self.N, name="sp_aligner3")(
            out, g3
        )
        out = jnp.concatenate([aligned, out], axis=-1)

        return Deconv(self.channel, stride=self.first_stride)(out)


class MasterCompresser(JointAutoregressiveHierarchicalPriors):
    """Conditioned master-modality codec (master.py:839-1161).

    `channel` selects modality roles like the reference: channel=3 means the
    master stream is the 3-channel (high-res) image guided by the 1-channel
    one; channel=1 swaps them. beta/gamma from the ChannelAligner are
    returned by compress() for lossless transmission."""

    def _roles(self):
        if self.channel == 1:
            return dict(master_chl=1, guided_chl=3, master_stride=1,
                        guided_stride=2)
        return dict(master_chl=3, guided_chl=1, master_stride=2,
                    guided_stride=1)

    @property
    def downsampling_factor(self) -> int:
        # FeatureEncoder at master_stride, g_a 4 stride-2 convs, hyper /4
        return 64 * self._roles()["master_stride"]

    def _make_g_a(self):
        return nn.Sequential([
            Conv(self.N), GDN(),
            Conv(self.N), GDN(),
            Conv(self.N), GDN(),
            Conv(self.M),
        ])

    def _make_g_s(self):
        roles = self._roles()
        return MasterDecoder(
            N=self.N, M=self.M, channel=128,
            first_stride=2, master_chl=roles["master_chl"],
        )

    def setup(self):
        super().setup()
        roles = self._roles()
        self.fencoder1 = FeatureEncoder(64, stride=roles["master_stride"])
        self.fencoder2 = FeatureEncoder(64, stride=roles["guided_stride"])
        self.ch_aligner = ChannelAligner()
        self.fdecoder = FeatureDecoder(
            out_channel=roles["master_chl"], stride=roles["master_stride"]
        )

    # --- device pieces --------------------------------------------------
    def features(self, x, guided_hat):
        x_feature = self.fencoder1(x)
        guided_feature = self.fencoder2(guided_hat)
        guided_align, beta, gamma = self.ch_aligner(x_feature, guided_feature)
        return x_feature, guided_align, beta, gamma

    def guided_align_from(self, guided_hat, beta, gamma):
        """Decoder-side alignment from transmitted beta/gamma
        (master.py:1059-1061)."""
        return gamma * self.fencoder2(guided_hat) + beta

    def analyze_features(self, x_feature, guided_align):
        y = self.g_a_net(jnp.concatenate([x_feature, guided_align], axis=-1))
        z = self.h_a_net(y)
        return y, z

    def synthesize(self, y_hat, guide_hidden, guided_align):
        res = self.g_s_net(y_hat, guide_hidden)
        feature_dec = jnp.concatenate([res, guided_align], axis=-1)
        return self.fdecoder(feature_dec)

    def g_s(self, y_hat):  # pragma: no cover - master needs guide context
        raise NotImplementedError("use synthesize(y_hat, hidden, align)")

    def __call__(self, x, guided_hat, guided_hidden, training: bool = True):
        x_feature, guided_align, beta, gamma = self.features(x, guided_hat)
        y, z = self.analyze_features(x_feature, guided_align)
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
        out = self.synthesize(y_hat, guided_hidden, guided_align)
        return {
            "x_hat": out,
            "likelihoods": {"y": y_likelihoods, "z": z_likelihoods},
            "beta": beta,
            "gamma": gamma,
        }


class MasterCodec(JointARCodec):
    """Wavefront codec for the master stream; compress takes the decoded
    guide, decompress re-derives the guide alignment from transmitted
    beta/gamma + the guide reconstruction (master.py:953-1107)."""

    def __init__(self, module, variables):
        super().__init__(module, variables)
        cls = type(module)
        self._features = jax.jit(
            lambda x, g: module.apply(variables, x, g, method=cls.features)
        )
        self._analyze_features = jax.jit(
            lambda xf, ga: module.apply(
                variables, xf, ga, method=cls.analyze_features
            )
        )
        self._align_from = jax.jit(
            lambda g, b, gm: module.apply(
                variables, g, b, gm, method=cls.guided_align_from
            )
        )
        self._synthesize = jax.jit(
            lambda y, hid, ga: module.apply(
                variables, y, hid, ga, method=cls.synthesize
            )
        )

    def __call__(self, x, guided_hat, guided_hidden, training=False,
                 key=None):
        rngs = {"noise": key} if training else None
        return self.module.apply(
            self.variables, x, guided_hat, guided_hidden,
            training=training, rngs=rngs,
        )

    # the RGBT container stores no padding geometry; padding desyncs decode
    _dims_hint = "crop or resize first (the RGBT container cannot record " \
                 "padding)"

    def expected_guide_hw(self, H, W):
        """Guide (H, W) for a master of (H, W): both feature encoders must
        land on the SAME grid — master/master_stride == guide/guided_stride
        (channel=1: guide 2x; channel=3: guide at half) or the
        SpatialAligner/ChannelAligner grids desync. Single source of truth
        for the codec and the file-codec CLI."""
        roles = self.module._roles()
        return (H * roles["guided_stride"] // roles["master_stride"],
                W * roles["guided_stride"] // roles["master_stride"])

    def check_geometry(self, H, W, guide_hw=None,
                       guide_what="guide reconstruction"):
        """Validate a master geometry (and optionally a guide's) without
        running anything; raises ValueError on mismatch and returns the
        expected guide (H, W). One policy for compress() and both halves
        of the file-codec CLI (encode early-exit before the expensive
        guide coding, decode-side header/guide validation)."""
        factor = self.module.downsampling_factor
        if H % factor or W % factor:
            raise ValueError(
                f"master dims ({H}, {W}) must be multiples of {factor} at "
                f"channel={self.module.channel}; {self._dims_hint}"
            )
        gH, gW = self.expected_guide_hw(H, W)
        if guide_hw is not None and tuple(guide_hw) != (gH, gW):
            raise ValueError(
                f"{guide_what} must be {gH}x{gW} for a {H}x{W} master at "
                f"channel={self.module.channel}; got "
                f"{guide_hw[0]}x{guide_hw[1]}"
            )
        return gH, gW

    def compress(self, x, guided_hat, order: str = "wavefront"):
        """order="raster" emits the reference app's per-pixel symbol
        order (the reference master container embeds these AR streams —
        codec_rgbt.py:377-382; used by lmic-codec --container
        reference)."""
        self._check_updated()
        H, W = int(x.shape[1]), int(x.shape[2])
        self.check_geometry(H, W, tuple(map(int, guided_hat.shape[1:3])))
        # feature/alignment chain stays on device; only (y, z) cross for
        # the host coder, and beta/gamma as transmitted side info
        x_feature, guided_align, beta, gamma = self._features(
            _as_unit_float(x), _as_unit_float(guided_hat)
        )
        # one blocking device_get for everything the host needs (the
        # tunnel pays a fixed cost per separate sync)
        y, z, beta, gamma = jax.device_get(
            (*self._analyze_features(x_feature, guided_align), beta, gamma)
        )
        out = self._code_y_z(y, z, order=order)
        out["beta"] = np.asarray(beta)
        out["gamma"] = np.asarray(gamma)
        return out

    def decompress(self, out_net, out_net_guided, order: str = "wavefront"):
        self._check_updated()
        strings, shape = out_net["strings"], out_net["shape"]
        beta, gamma = out_net["beta"], out_net["gamma"]
        guided_hidden = out_net_guided["hidden"]
        guided_align = self._align_from(
            jnp.asarray(out_net_guided["x_hat"]),
            jnp.asarray(beta),
            jnp.asarray(gamma),
        )
        y_hat = self._decode_y_hat(strings, shape, order=order)
        x_hat = self._synthesize(
            jnp.asarray(y_hat),
            jax.tree.map(jnp.asarray, guided_hidden),
            guided_align,
        )
        return {"x_hat": jnp.clip(x_hat, 0.0, 1.0)}
