"""ScaleSpaceFlow (ssf2020) video codec.

Reference: compressai/models/video/google.py:55-508. Three hyperprior
sub-codecs (I-frame, motion, residual) around conv encoder/decoder stacks;
inter frames warp the previous reconstruction through a gaussian scale-space
volume driven by a decoded (flow, scale) field, then add a decoded residual.

TPU design: each sub-codec's device math is plain jitted NHWC convs; the
frame loop is host-side Python for coding (frames are sequentially dependent
through x_ref, like the reference), while the training forward unrolls a
static number of frames inside one jit. The trilinear warp is the
vectorized gather kernel in lmic_tpu.ops.video.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lmic_tpu.entropy import coder as rans
from lmic_tpu.entropy.entropy_models import (
    EntropyBottleneck,
    GaussianConditional,
    eb_update,
    get_scale_table,
)
from lmic_tpu.layers import Conv, Deconv, qrelu
from lmic_tpu.models.codec import CompressionCodec
from lmic_tpu.ops import quantize_ste
from lmic_tpu.ops.video import scale_space_warp


class Encoder(nn.Module):
    """4x (conv5 s2 + relu) (reference video/google.py:75-88)."""

    mid_planes: int = 128
    out_planes: int = 192

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.mid_planes)(x))
        x = nn.relu(Conv(self.mid_planes)(x))
        x = nn.relu(Conv(self.mid_planes)(x))
        return Conv(self.out_planes)(x)


class Decoder(nn.Module):
    """4x (deconv5 s2 + relu) (reference video/google.py:90-103)."""

    out_planes: int
    mid_planes: int = 128

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Deconv(self.mid_planes)(x))
        x = nn.relu(Deconv(self.mid_planes)(x))
        x = nn.relu(Deconv(self.mid_planes)(x))
        return Deconv(self.out_planes)(x)


class HyperEncoder(nn.Module):
    planes: int = 192

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.planes)(x))
        x = nn.relu(Conv(self.planes)(x))
        return Conv(self.planes)(x)


class HyperDecoder(nn.Module):
    planes: int = 192

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Deconv(self.planes)(x))
        x = nn.relu(Deconv(self.planes)(x))
        return Deconv(self.planes)(x)


class HyperDecoderWithQReLU(nn.Module):
    """Scale branch uses QReLU clamping (reference video/google.py:128-150)."""

    planes: int = 192

    @nn.compact
    def __call__(self, x):
        x = qrelu(Deconv(self.planes)(x))
        x = qrelu(Deconv(self.planes)(x))
        return qrelu(Deconv(self.planes)(x))


class Hyperprior(nn.Module):
    """One hyperprior sub-codec: EB on z, Gaussian conditional on y with
    mean/scale hyper-decoders; STE-quantized y_hat
    (reference video/google.py:152-196)."""

    planes: int = 192
    mid_planes: int = 192

    def setup(self):
        self.hyper_encoder = HyperEncoder(self.planes)
        self.hyper_decoder_mean = HyperDecoder(self.planes)
        self.hyper_decoder_scale = HyperDecoderWithQReLU(self.planes)
        self.entropy_bottleneck = EntropyBottleneck(channels=self.mid_planes)
        self.gaussian_conditional = GaussianConditional()

    def __call__(self, y, training: bool = True):
        z = self.hyper_encoder(y)
        z_hat, z_likelihoods = self.entropy_bottleneck(z, training=training)
        scales = self.hyper_decoder_scale(z_hat)
        means = self.hyper_decoder_mean(z_hat)
        key = self.make_rng("noise") if training else None
        _, y_likelihoods = self.gaussian_conditional(
            y, scales, means, training=training, key=key
        )
        y_hat = quantize_ste(y - means) + means
        return y_hat, {"y": y_likelihoods, "z": z_likelihoods}

    # --- device halves of the coding path ---
    def encode_z(self, y):
        return self.hyper_encoder(y)

    def params_from_z_hat(self, z_hat):
        return self.hyper_decoder_scale(z_hat), self.hyper_decoder_mean(z_hat)

    def aux_loss(self):
        return self.entropy_bottleneck.aux_loss()


class ScaleSpaceFlow(nn.Module):
    """ssf2020 (reference video/google.py:55-235)."""

    num_levels: int = 5
    sigma0: float = 1.5
    scale_field_shift: float = 1.0

    def setup(self):
        self.img_encoder = Encoder()
        self.img_decoder = Decoder(3)
        self.img_hyperprior = Hyperprior()
        self.res_encoder = Encoder()
        self.res_decoder = Decoder(3)
        self.res_hyperprior = Hyperprior()
        self.motion_encoder = Encoder()
        self.motion_decoder = Decoder(3)  # 2 flow + 1 scale channels
        self.motion_hyperprior = Hyperprior()

    def forward_prediction(self, x_ref, motion_info):
        flow, scale_field = motion_info[..., :2], motion_info[..., 2:]
        return scale_space_warp(
            x_ref, flow, scale_field, self.sigma0, self.num_levels
        )

    def forward_keyframe(self, x, training: bool = True):
        y = self.img_encoder(x)
        y_hat, likelihoods = self.img_hyperprior(y, training=training)
        x_hat = self.img_decoder(y_hat)
        return x_hat, {"keyframe": likelihoods}

    def forward_inter(self, x_cur, x_ref, training: bool = True):
        x = jnp.concatenate([x_cur, x_ref], axis=-1)
        y_motion = self.motion_encoder(x)
        y_motion_hat, motion_likelihoods = self.motion_hyperprior(
            y_motion, training=training
        )
        motion_info = self.motion_decoder(y_motion_hat)
        x_pred = self.forward_prediction(x_ref, motion_info)

        x_res = x_cur - x_pred
        y_res = self.res_encoder(x_res)
        y_res_hat, res_likelihoods = self.res_hyperprior(
            y_res, training=training
        )
        y_combine = jnp.concatenate([y_res_hat, y_motion_hat], axis=-1)
        x_res_hat = self.res_decoder(y_combine)
        x_rec = x_pred + x_res_hat
        return x_rec, {"motion": motion_likelihoods, "residual": res_likelihoods}

    def __call__(self, frames, training: bool = True):
        """frames: (B, T, H, W, 3). Returns per-frame reconstructions and
        likelihood dicts; gradients stop at each x_ref (reference :224)."""
        T = frames.shape[1]
        recs, likelihoods = [], []
        x_hat, lk = self.forward_keyframe(frames[:, 0], training=training)
        recs.append(x_hat)
        likelihoods.append(lk)
        x_ref = jax.lax.stop_gradient(x_hat)
        for i in range(1, T):
            x_ref, lk = self.forward_inter(
                frames[:, i], x_ref, training=training
            )
            recs.append(x_ref)
            likelihoods.append(lk)
            x_ref = jax.lax.stop_gradient(x_ref)
        return {
            "x_hat": jnp.stack(recs, axis=1),
            "likelihoods": likelihoods,
        }

    def aux_loss(self):
        return (
            self.img_hyperprior.aux_loss()
            + self.res_hyperprior.aux_loss()
            + self.motion_hyperprior.aux_loss()
        )

    # --- device halves used by the codec wrapper ---
    def img_encode(self, x):
        return self.img_encoder(x)

    def img_decode(self, y_hat):
        return self.img_decoder(y_hat)

    def motion_encode(self, x_cur, x_ref):
        return self.motion_encoder(jnp.concatenate([x_cur, x_ref], axis=-1))

    def motion_decode_predict(self, y_motion_hat, x_ref):
        motion_info = self.motion_decoder(y_motion_hat)
        return self.forward_prediction(x_ref, motion_info)

    def res_encode(self, x_res):
        return self.res_encoder(x_res)

    def res_decode(self, y_res_hat, y_motion_hat):
        return self.res_decoder(
            jnp.concatenate([y_res_hat, y_motion_hat], axis=-1)
        )

    def hp_encode_z(self, y, which: str):
        hp = getattr(self, f"{which}_hyperprior")
        return hp.encode_z(y)

    def hp_params(self, z_hat, which: str):
        hp = getattr(self, f"{which}_hyperprior")
        return hp.params_from_z_hat(z_hat)


class _HyperpriorState:
    """Host coding state for one Hyperprior sub-codec."""

    def __init__(self, codec, which: str):
        self.which = which
        self.module, self.variables = codec.module, codec.variables
        eb = EntropyBottleneck(channels=192)  # Hyperprior.mid_planes
        self.eb_state = eb_update(
            eb,
            {
                "params": self.variables["params"][f"{which}_hyperprior"][
                    "entropy_bottleneck"
                ]
            },
        )
        self.gc_state = GaussianConditional().update(get_scale_table())
        self._rebuild()

    def _rebuild(self):
        """(Re)build the jitted passes capturing the CURRENT coding state —
        call again after adopting tables from a reference checkpoint
        (zoo.pretrained.import_reference_video_coding_state)."""
        module, variables, which = self.module, self.variables, self.which
        cls = type(module)
        self._encode_z = jax.jit(
            lambda y: module.apply(variables, y, which, method=cls.hp_encode_z)
        )
        self._params = jax.jit(
            lambda z_hat: module.apply(
                variables, z_hat, which, method=cls.hp_params
            )
        )

        # Device-resident fast path: the GOP loop keeps every activation on
        # device; only int8 symbols and uint8 indexes cross the link (the
        # tunnel is LATENCY-bound here — the old per-frame f32 fetches cost
        # ~40 ms each). `_params_from_zsym` is shared by both directions so
        # scale indexes are derived on one compiled graph.
        z_medians = jnp.asarray(self.eb_state.medians)
        table = jnp.asarray(self.gc_state.scale_table)
        gc = GaussianConditional()

        def zsym(y):
            z = module.apply(variables, y, which, method=cls.hp_encode_z)
            sym = jnp.round(z - z_medians)
            ovf = jnp.sum((sym < -128) | (sym > 127)).astype(jnp.int32)
            return jnp.moveaxis(sym, -1, 1).astype(jnp.int8), ovf

        def params_from_zsym(z_sym_cmaj):
            z_hat = jnp.moveaxis(
                z_sym_cmaj.astype(jnp.float32), 1, -1
            ) + z_medians
            scales, means = module.apply(
                variables, z_hat, which, method=cls.hp_params
            )
            # channel-major indexes: host flatten == reference NCHW order
            indexes = jnp.moveaxis(
                gc.build_indexes(table, scales), -1, 1
            ).astype(jnp.uint8)
            return indexes, means

        def ysym(y, means):
            sym = jnp.round(y - means)
            ovf = jnp.sum((sym < -128) | (sym > 127)).astype(jnp.int32)
            sym = jnp.moveaxis(sym, -1, 1)  # channel-major coding order
            return sym.astype(jnp.int8), sym.astype(jnp.int16), ovf

        def yhat(y_sym_cmaj, means):
            return jnp.moveaxis(
                y_sym_cmaj.astype(jnp.float32), 1, -1
            ) + means

        self._zsym = jax.jit(zsym)
        self._params_from_zsym = jax.jit(params_from_zsym)
        self._ysym = jax.jit(ysym)
        self._yhat = jax.jit(yhat)
        # encoder-side in-loop reconstruction from FLOAT symbols:
        # round(y-means)+means is value-identical to the decoder's
        # int8/int16 wire dtype -> f32 -> +means (symbols are exact in
        # f32), so the GOP chain never waits on a host overflow check
        self._yhat_f32 = jax.jit(lambda y, means: jnp.round(y - means) + means)

    def compress_device(self, y):
        """Enqueue the device half of compress with ZERO host syncs.

        Returns (y_hat ON DEVICE, part) where part carries the device refs
        (z8, idx, y8, y16, zovf, yovf) for a later batched fetch — the GOP
        chain continues from y_hat immediately while symbols drain to the
        host in one packed transfer (ScaleSpaceFlowCodec._compress_chunk).
        """
        y = jnp.asarray(y)
        z8, zovf = self._zsym(y)
        idx, means = self._params_from_zsym(z8)
        y8, y16, yovf = self._ysym(y, means)
        y_hat = self._yhat_f32(y, means)
        return y_hat, (z8, idx, y8, y16, zovf, yovf)

    def code_part(self, z_sym, idx, ysym):
        """Host rANS for one (z, y) stream pair of already-fetched symbols."""
        B, Cz = z_sym.shape[:2]
        ch_idx = np.broadcast_to(
            np.arange(Cz, dtype=np.int32)[:, None],
            (Cz, z_sym.shape[2] * z_sym.shape[3]),
        )
        z_strings = rans.encode_batch(
            z_sym.reshape(B, -1), ch_idx.reshape(-1), self.eb_state.table
        )
        y_strings = rans.encode_batch(
            ysym.reshape(B, -1), idx.reshape(B, -1), self.gc_state.table
        )
        return {
            "strings": [y_strings, z_strings],
            "shape": tuple(z_sym.shape[2:4]),
        }

    def decode_z(self, z_strings, shape):
        """Host rANS decode of the (independent) z stream -> int32 symbols."""
        C = len(self.eb_state.medians)
        H, W = shape
        ch_idx = np.repeat(np.arange(C, dtype=np.int32), H * W)
        return rans.decode_batch(
            z_strings, ch_idx, self.eb_state.table
        ).reshape(len(z_strings), C, H, W)

    def compress(self, y):
        """y: device (or host) float array. Returns (y_hat ON DEVICE,
        {"strings": [y_str, z_str], "shape": zhw})."""
        y = jnp.asarray(y)
        z8, zovf = self._zsym(y)
        if int(zovf) != 0:  # pragma: no cover - extreme hyper latents
            return self._compress_f32(np.asarray(y))
        z_sym = np.asarray(z8, dtype=np.int32)
        B, Cz = z_sym.shape[:2]
        ch_idx = np.broadcast_to(
            np.arange(Cz, dtype=np.int32)[:, None],
            (Cz, z_sym.shape[2] * z_sym.shape[3]),
        )
        z_strings = rans.encode_batch(
            z_sym.reshape(B, -1), ch_idx.reshape(-1), self.eb_state.table
        )
        idx_dev, means = self._params_from_zsym(z8)
        y8, y16, yovf = self._ysym(y, means)
        sym_dev = y8 if int(yovf) == 0 else y16
        ysym_host = np.asarray(sym_dev, dtype=np.int32)
        idx = np.asarray(idx_dev, dtype=np.int32)
        y_strings = rans.encode_batch(
            ysym_host.reshape(B, -1), idx.reshape(B, -1), self.gc_state.table
        )
        y_hat = self._yhat(sym_dev, means)  # stays on device
        return y_hat, {
            "strings": [y_strings, z_strings],
            "shape": z_sym.shape[2:4],
        }

    def decompress(self, strings, shape):
        """Returns y_hat ON DEVICE."""
        y_strings, z_strings = strings
        C = len(self.eb_state.medians)
        H, W = shape
        ch_idx = np.repeat(np.arange(C, dtype=np.int32), H * W)
        z_sym = rans.decode_batch(
            z_strings, ch_idx, self.eb_state.table
        ).reshape(len(z_strings), C, H, W)
        if z_sym.size and not (
            z_sym.min() >= -128 and z_sym.max() <= 127
        ):  # pragma: no cover - mirrors the encode fallback
            return self._decompress_f32(strings, shape)
        idx_dev, means = self._params_from_zsym(
            jnp.asarray(z_sym.astype(np.int8))
        )
        idx = np.asarray(idx_dev, dtype=np.int32)
        B = idx.shape[0]
        y_sym = rans.decode_batch(
            y_strings, idx.reshape(B, -1), self.gc_state.table
        ).reshape(idx.shape)
        fits8 = y_sym.size and y_sym.min() >= -128 and y_sym.max() <= 127
        y_up = y_sym.astype(np.int8 if fits8 else np.int16)
        return self._yhat(jnp.asarray(y_up), means)

    # -- float fallback paths (also the reference-shaped formulation) --------
    def _compress_f32(self, y: np.ndarray):
        z = np.asarray(self._encode_z(jnp.asarray(y)))
        z_strings = self.eb_state.compress(z)
        C = z.shape[-1]
        medians = self.eb_state.medians.reshape((1, 1, 1, C))
        z_sym = np.round(z - medians).astype(np.int32)
        if z_sym.size == 0 or (
            z_sym.min() >= -128 and z_sym.max() <= 127
        ):  # pragma: no cover - needs a 1-ulp u8/f32 graph divergence
            # pathological corner: the u8 graph's z overflowed int8 but the
            # float graph's WIRE symbols fit — the decoder picks its graph
            # from the wire, so derive parameters from the same
            # _params_from_zsym graph it will run (shared-graph invariant)
            z8 = jnp.asarray(np.moveaxis(z_sym, -1, 1).astype(np.int8))
            idx_dev, means_dev = self._params_from_zsym(z8)
            indexes_cm = np.asarray(idx_dev, dtype=np.int32)
            means = np.asarray(means_dev)
            symbols = np.round(y - means).astype(np.int32)
            B = symbols.shape[0]
            y_strings = rans.encode_batch(
                np.moveaxis(symbols, -1, 1).reshape(B, -1),
                indexes_cm.reshape(B, -1), self.gc_state.table,
            )
            y_hat = jnp.asarray(symbols.astype(np.float32) + means)
            return y_hat, {
                "strings": [y_strings, z_strings],
                "shape": z.shape[1:3],
            }
        z_hat = z_sym.astype(np.float32) + medians
        scales, means = jax.device_get(self._params(jnp.asarray(z_hat)))
        gc = GaussianConditional()
        indexes = np.asarray(gc.build_indexes(
            jnp.asarray(self.gc_state.scale_table), jnp.asarray(scales)
        ))
        symbols = np.round(y - means).astype(np.int32)
        B = symbols.shape[0]
        # channel-major symbol order (reference entropy_models.py:237-270)
        y_strings = rans.encode_batch(
            np.moveaxis(symbols, -1, 1).reshape(B, -1),
            np.moveaxis(indexes, -1, 1).reshape(B, -1),
            self.gc_state.table,
        )
        y_hat = jnp.asarray(symbols.astype(np.float32) + means)
        return y_hat, {
            "strings": [y_strings, z_strings],
            "shape": z.shape[1:3],
        }

    def _decompress_f32(self, strings, shape):
        y_strings, z_strings = strings
        z_hat = self.eb_state.decompress(z_strings, tuple(shape))
        scales, means = jax.device_get(self._params(jnp.asarray(z_hat)))
        gc = GaussianConditional()
        indexes = np.asarray(gc.build_indexes(
            jnp.asarray(self.gc_state.scale_table), jnp.asarray(scales)
        ))
        idx_cm = np.moveaxis(indexes, -1, 1)
        B = idx_cm.shape[0]
        symbols = rans.decode_batch(
            y_strings, idx_cm.reshape(B, -1), self.gc_state.table
        ).reshape(idx_cm.shape)
        symbols = np.moveaxis(symbols, 1, -1)
        return jnp.asarray(symbols.astype(np.float32) + means)


def _slice_strings(s, lo, hi):
    """Per-frame strings are [y_strings, z_strings] lists (keyframe) or
    {"motion"/"residual": [...]} dicts (inter); slice the batch items."""
    if isinstance(s, dict):
        return {k: _slice_strings(v, lo, hi) for k, v in s.items()}
    return [part[lo:hi] for part in s]


def _merge_strings(parts):
    """Inverse of _slice_strings: concatenate per-chunk batch items."""
    if isinstance(parts[0], dict):
        return {k: _merge_strings([p[k] for p in parts]) for k in parts[0]}
    return [sum((p[i] for p in parts), []) for i in range(len(parts[0]))]


class ScaleSpaceFlowCodec(CompressionCodec):
    """Host codec wrapper: frame loop, three hyperprior states."""

    def __init__(self, module, variables):
        super().__init__(module, variables)
        cls = type(module)
        self._img_encode = jax.jit(
            lambda x: module.apply(variables, x, method=cls.img_encode)
        )
        self._img_decode = jax.jit(
            lambda y: module.apply(variables, y, method=cls.img_decode)
        )
        self._motion_encode = jax.jit(
            lambda a, b: module.apply(variables, a, b, method=cls.motion_encode)
        )
        self._motion_decode_predict = jax.jit(
            lambda y, r: module.apply(
                variables, y, r, method=cls.motion_decode_predict
            )
        )
        self._res_encode = jax.jit(
            lambda x: module.apply(variables, x, method=cls.res_encode)
        )
        self._res_decode = jax.jit(
            lambda a, b: module.apply(variables, a, b, method=cls.res_decode)
        )
        self.hp_states: Dict[str, _HyperpriorState] = {}
        # multi-device serving: per-device sequence chunks (fanout())
        self._fanout_devices = None
        # u8 pixel path: frames are uint8 at rest, so the host-device link
        # moves 1 byte/px instead of 4 (the image codecs' fast path; the
        # GOP chain itself is unchanged — ingest/egress convert on device)
        self._ingest_u8 = jax.jit(
            lambda u8: u8.astype(jnp.float32) / 255.0
        )
        self._egress_u8 = jax.jit(
            lambda x: jnp.round(
                jnp.clip(x, 0.0, 1.0) * 255.0
            ).astype(jnp.uint8)
        )

        from lmic_tpu.models.codec import _bitcast_u8

        def pack_gop(parts):
            # one transfer buffer for a whole GOP's coding payload:
            # [2 flag bytes per part | per part: z8 | idx | y8]. The tunnel
            # TPU pays ~25 ms fixed per transfer; the old per-sub-codec
            # fetches cost ~20 syncs per 3-frame GOP.
            flags = jnp.stack(
                [f for (z8, idx, y8, zovf, yovf) in parts
                 for f in ((zovf > 0), (yovf > 0))]
            ).astype(jnp.uint8)
            bufs = [flags]
            for z8, idx, y8, _, _ in parts:
                bufs += [_bitcast_u8(z8), idx.reshape(-1), _bitcast_u8(y8)]
            return jnp.concatenate(bufs)

        # retraces once per GOP structure (part count); cached thereafter
        self._pack_gop = jax.jit(pack_gop)
        self._cat_u8 = jax.jit(
            lambda xs: jnp.concatenate([x.reshape(-1) for x in xs])
        )

    def fanout(self, devices):
        """Serve multi-sequence batches across `devices`: every sequence's
        whole GOP chain (inter-frame dependencies included) runs at B=1 on
        its own chip, round-robin. Sequences are independent and every
        device runs the SAME B=1 programs, so the result is bit-equal to
        the single-device path on a homogeneous device set — and because
        single-device multi-sequence batches also run per-sequence B=1
        chains (see compress), batch grouping never leaks into the wire."""
        from lmic_tpu.parallel import check_homogeneous

        self._fanout_devices = check_homogeneous(devices)
        return self

    def _chunk_map(self, B, fn):
        """fn(i, i+1, device) once PER SEQUENCE (B=1 slices — the GOP
        transforms are wire-determining convolutions, and batched conv
        executables are not guaranteed to match their B=1 counterparts
        ulp-for-ulp; see models.codec._PerItem), strided across the
        fan-out devices (or serially on the default device when no
        fan-out is set) on a thread pool (jit dispatch + host rANS
        coding release the GIL)."""
        devs = self._fanout_devices or [None]
        n = min(len(devs), B)
        out = [None] * B

        def slot(s):
            for i in range(s, B, n):
                out[i] = fn(i, i + 1, devs[s])

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=n) as pool:
            list(pool.map(slot, range(n)))
        return out

    def __call__(self, frames, training: bool = False, key=None):
        rngs = {"noise": key} if training else None
        return self.module.apply(
            self.variables, frames, training=training, rngs=rngs
        )

    def update(self, force: bool = False):
        if self.hp_states and not force:
            return False
        for which in ("img", "motion", "res"):
            self.hp_states[which] = _HyperpriorState(self, which)
        return True

    def _check_updated(self):
        if not self.hp_states:
            raise RuntimeError("Uninitialized CDFs. Run update() first")

    # The whole GOP chain stays on device: encode_keyframe/encode_inter and
    # the decode mirrors take/return device arrays; only symbols cross the
    # host-device link inside _HyperpriorState.

    def encode_keyframe(self, x):
        y = self._img_encode(jnp.asarray(x))
        y_hat, out = self.hp_states["img"].compress(y)
        x_hat = self._img_decode(y_hat)
        return x_hat, out

    def decode_keyframe(self, strings, shape):
        y_hat = self.hp_states["img"].decompress(strings, shape)
        return self._img_decode(y_hat)

    def encode_inter(self, x_cur, x_ref):
        x_cur = jnp.asarray(x_cur)
        x_ref = jnp.asarray(x_ref)
        y_motion = self._motion_encode(x_cur, x_ref)
        y_motion_hat, out_motion = self.hp_states["motion"].compress(y_motion)
        x_pred = self._motion_decode_predict(y_motion_hat, x_ref)
        x_res = x_cur - x_pred
        y_res = self._res_encode(x_res)
        y_res_hat, out_res = self.hp_states["res"].compress(y_res)
        x_res_hat = self._res_decode(y_res_hat, y_motion_hat)
        x_rec = x_pred + x_res_hat
        return x_rec, {
            "strings": {
                "motion": out_motion["strings"],
                "residual": out_res["strings"],
            },
            "shape": {
                "motion": out_motion["shape"],
                "residual": out_res["shape"],
            },
        }

    def decode_inter(self, x_ref, strings, shapes):
        y_motion_hat = self.hp_states["motion"].decompress(
            strings["motion"], shapes["motion"]
        )
        x_pred = self._motion_decode_predict(y_motion_hat, jnp.asarray(x_ref))
        y_res_hat = self.hp_states["res"].decompress(
            strings["residual"], shapes["residual"]
        )
        x_res_hat = self._res_decode(y_res_hat, y_motion_hat)
        return x_pred + x_res_hat

    # ssf2020 geometry: encoder /16, hyper /8 -> z only roundtrips when
    # H, W divide 128 (the video eval CLI pads centered to 2^7, reference
    # convention); fail loudly here like the image codecs do instead of a
    # broadcast error deep inside the compiled GOP graph
    _FACTOR = 128

    def _check_frame_dims(self, frames):
        H, W = frames.shape[2:4]
        if H % self._FACTOR or W % self._FACTOR:
            raise ValueError(
                f"frame spatial dims ({H}, {W}) must be multiples of "
                f"{self._FACTOR}; pad first (CLIs use centered padding)"
            )

    def compress(self, frames):
        """frames: (B, T, H, W, 3) -> (frame_strings, shape_infos).
        uint8 frames take the thin-transfer path (converted on device).
        Multi-sequence batches run per-sequence B=1 GOP chains through
        the same compiled graphs, so the wire is independent of how
        sequences were grouped (and of fan-out device placement)."""
        self._check_updated()
        frames = np.asarray(frames)
        self._check_frame_dims(frames)
        if frames.shape[0] > 1 and not hasattr(self, "bundle_meta"):
            def one(lo, hi, dev):
                if dev is None:
                    chunk = jnp.asarray(frames[lo:hi])
                    if chunk.dtype == jnp.uint8:
                        chunk = self._ingest_u8(chunk)
                    return self._compress_chunk(chunk)
                with jax.default_device(dev):
                    chunk = jax.device_put(jnp.asarray(frames[lo:hi]), dev)
                    if chunk.dtype == jnp.uint8:
                        chunk = self._ingest_u8(chunk)
                    return self._compress_chunk(chunk)

            parts = self._chunk_map(frames.shape[0], one)
            frame_strings = [
                _merge_strings([p[0][i] for p in parts])
                for i in range(len(parts[0][0]))
            ]
            return frame_strings, parts[0][1]
        frames = jnp.asarray(frames)
        if frames.dtype == jnp.uint8:
            frames = self._ingest_u8(frames)
        return self._compress_chunk(frames)

    def compress_async(self, frames):
        """Dispatch the WHOLE GOP device chain and return a finalizer
        running the single packed fetch + host rANS: the next GOP's device
        work overlaps this GOP's host coding (bench.py pipelines this)."""
        self._check_updated()
        frames = np.asarray(frames)
        self._check_frame_dims(frames)
        if frames.shape[0] > 1 and not hasattr(self, "bundle_meta"):
            out = self.compress(frames)  # multi-sequence: per-seq chains
            return lambda: out
        frames = jnp.asarray(frames)
        if frames.dtype == jnp.uint8:
            frames = self._ingest_u8(frames)
        state = self._compress_chunk_dispatch(frames)
        state[2].copy_to_host_async()  # download starts when compute ends
        return lambda: self._compress_chunk_finish(frames, *state)

    def _compress_chunk(self, frames):
        """Whole-GOP encode with ONE device->host sync.

        The full device chain — transforms, entropy params, symbol
        extraction, in-loop reconstruction — is enqueued without waiting
        on the host coder (y_hat derives from float symbols on device),
        then one packed fetch crosses the link and the host rANS-codes
        every stream. Replaces ~20 syncs per 3-frame GOP with 1."""
        labels, parts, packed = self._compress_chunk_dispatch(frames)
        return self._compress_chunk_finish(frames, labels, parts, packed)

    def _compress_chunk_dispatch(self, frames):
        """Enqueue the GOP device chain; zero host syncs."""
        sts = self.hp_states
        parts, labels = [], []
        y = self._img_encode(frames[:, 0])
        y_hat, part = sts["img"].compress_device(y)
        x_ref = self._img_decode(y_hat)
        parts.append(part)
        labels.append("img")
        for i in range(1, frames.shape[1]):
            x_cur = frames[:, i]
            y_motion = self._motion_encode(x_cur, x_ref)
            y_motion_hat, pm = sts["motion"].compress_device(y_motion)
            x_pred = self._motion_decode_predict(y_motion_hat, x_ref)
            y_res = self._res_encode(x_cur - x_pred)
            y_res_hat, pr = sts["res"].compress_device(y_res)
            x_ref = x_pred + self._res_decode(y_res_hat, y_motion_hat)
            parts.append(pm)
            labels.append("motion")
            parts.append(pr)
            labels.append("res")
        packed = self._pack_gop(
            [(z8, idx, y8, zovf, yovf)
             for z8, idx, y8, _, zovf, yovf in parts]
        )
        return labels, parts, packed

    def _compress_chunk_finish(self, frames, labels, parts, packed):
        """Fetch the packed buffer (ONE transfer) and host-code it."""
        import time

        sts = self.hp_states
        t0 = time.perf_counter()
        buf = np.asarray(packed)  # the GOP's single device->host fetch
        t0 = self._stat("enc_fetch_ms", t0)
        n = len(parts)
        flags = buf[:2 * n]
        if flags[0::2].any():  # pragma: no cover - extreme hyper latents
            return self._compress_chunk_sync(frames)
        outs = []
        off = 2 * n
        for k, (label, p) in enumerate(zip(labels, parts)):
            z8, idx_dev, y8 = p[0], p[1], p[2]
            zn, yn = z8.size, y8.size
            z_sym = buf[off:off + zn].view(np.int8).reshape(z8.shape)
            off += zn
            idx = buf[off:off + yn].reshape(y8.shape)
            off += yn
            if flags[2 * k + 1]:  # pragma: no cover - rare int8 y overflow
                ysym = np.asarray(p[3])
            else:
                ysym = buf[off:off + yn].view(np.int8).reshape(y8.shape)
            off += yn
            outs.append(sts[label].code_part(z_sym, idx, ysym))
        self._stat("enc_rans_ms", t0)
        frame_strings = [outs[0]["strings"]]
        shape_infos = [outs[0]["shape"]]
        k = 1
        for i in range(1, frames.shape[1]):
            om, orr = outs[k], outs[k + 1]
            k += 2
            frame_strings.append(
                {"motion": om["strings"], "residual": orr["strings"]}
            )
            shape_infos.append(
                {"motion": om["shape"], "residual": orr["shape"]}
            )
        return frame_strings, shape_infos

    def _compress_chunk_sync(self, frames):
        """Reference-shaped per-frame loop (fallback for symbol overflow)."""
        frame_strings, shape_infos = [], []
        x_ref, out = self.encode_keyframe(frames[:, 0])
        frame_strings.append(out["strings"])
        shape_infos.append(out["shape"])
        for i in range(1, frames.shape[1]):
            x_ref, out = self.encode_inter(frames[:, i], x_ref)
            frame_strings.append(out["strings"])
            shape_infos.append(out["shape"])
        return frame_strings, shape_infos

    def decompress(self, strings, shapes, u8: bool = False):
        """u8=True fetches the reconstruction as uint8 (thin-transfer
        egress, converted on device) — the production representation."""
        self._check_updated()
        assert len(strings) == len(shapes)
        B = len(strings[0][0])
        if B > 1 and not hasattr(self, "bundle_meta"):
            def one(lo, hi, dev):
                sl = [_slice_strings(s, lo, hi) for s in strings]
                if dev is None:
                    return self._decompress_chunk(sl, shapes, u8=u8)
                with jax.default_device(dev):
                    return self._decompress_chunk(sl, shapes, u8=u8)

            return np.concatenate(self._chunk_map(B, one), axis=0)
        return self._decompress_chunk(strings, shapes, u8=u8)

    def _decompress_chunk(self, strings, shapes, u8: bool = False,
                          _async: bool = False):
        """Whole-GOP decode with TWO device->host syncs.

        The z streams are mutually independent, so phase 1 host-decodes
        them all, uploads one stacked int8 buffer, and fetches all scale
        indexes in one transfer; phase 2 host-decodes every y stream,
        uploads one stacked symbol buffer, and the frame chain runs on
        device to one stacked pixel fetch. Scale indexes still come from
        each sub-codec's `_params_from_zsym` — the same compiled graph the
        encoder used, so index bucketing is bit-identical."""
        sts = self.hp_states
        labels = ["img"]
        specs = [(strings[0], shapes[0])]
        for i in range(1, len(strings)):
            labels += ["motion", "res"]
            specs += [
                (strings[i]["motion"], shapes[i]["motion"]),
                (strings[i]["residual"], shapes[i]["residual"]),
            ]
        import time

        t0 = time.perf_counter()
        z_syms = [
            sts[label].decode_z(s[1], shp)
            for label, (s, shp) in zip(labels, specs)
        ]
        t0 = self._stat("dec_z_rans_ms", t0)
        if any(
            zs.size and (zs.min() < -128 or zs.max() > 127) for zs in z_syms
        ):  # pragma: no cover - mirrors the encode fallback
            return self._decompress_chunk_sync(strings, shapes, u8=u8)
        # all sub-codec z tensors share one shape: ONE stacked upload
        z_all = jnp.asarray(np.stack([zs.astype(np.int8) for zs in z_syms]))
        pm = [
            sts[label]._params_from_zsym(z_all[k])
            for k, label in enumerate(labels)
        ]
        idx_cat = self._cat_u8([idx for idx, _ in pm])
        idx_cat.copy_to_host_async()
        idx_buf = np.asarray(idx_cat)  # 1 sync
        t0 = self._stat("dec_idx_fetch_ms", t0)
        y_syms = []
        off = 0
        for k, (label, (s, _)) in enumerate(zip(labels, specs)):
            ishape = pm[k][0].shape
            idx_k = idx_buf[off:off + pm[k][0].size].reshape(ishape)
            off += pm[k][0].size
            B = ishape[0]
            y_syms.append(
                rans.decode_batch(
                    s[0], idx_k.reshape(B, -1), sts[label].gc_state.table
                ).reshape(ishape)
            )
        t0 = self._stat("dec_y_rans_ms", t0)
        fits8 = all(
            ys.size == 0 or (ys.min() >= -128 and ys.max() <= 127)
            for ys in y_syms
        )
        dt = np.int8 if fits8 else np.int16
        y_all = jnp.asarray(np.stack([ys.astype(dt) for ys in y_syms]))
        y_hats = [
            sts[label]._yhat(y_all[k], pm[k][1])
            for k, label in enumerate(labels)
        ]
        x_ref = self._img_decode(y_hats[0])
        frames = [x_ref]
        k = 1
        for i in range(1, len(strings)):
            y_motion_hat, y_res_hat = y_hats[k], y_hats[k + 1]
            k += 2
            x_pred = self._motion_decode_predict(y_motion_hat, x_ref)
            x_ref = x_pred + self._res_decode(y_res_hat, y_motion_hat)
            frames.append(x_ref)
        # one stacked transfer instead of one per frame
        stacked = jnp.stack(frames, axis=1)
        if u8:
            stacked = self._egress_u8(stacked)
        # start the pixel download as soon as the frame chain finishes —
        # a pipelined caller joins a full GOP later
        stacked.copy_to_host_async()
        if _async:
            def fetch():
                t1 = time.perf_counter()
                out = np.asarray(stacked)
                self._stat("dec_fetch_ms", t1)
                return out

            return fetch
        t1 = time.perf_counter()
        out = np.asarray(stacked)
        self._stat("dec_fetch_ms", t1)
        return out

    def decompress_async(self, strings, shapes, u8: bool = True):
        """Run the host halves of decode (z/y rANS, index fetch) inline
        and return a finalizer that fetches the stacked pixels — a
        pipelining caller overlaps this GOP's pixel download with the
        next GOP's legs."""
        self._check_updated()
        if len(strings[0][0]) > 1 and not hasattr(self, "bundle_meta"):
            out = self.decompress(strings, shapes, u8=u8)  # per-seq chains
            return lambda: out
        out = self._decompress_chunk(strings, shapes, u8=u8, _async=True)
        return out if callable(out) else (lambda: out)

    def _decompress_chunk_sync(self, strings, shapes, u8: bool = False):
        """Reference-shaped per-frame loop (fallback for symbol overflow)."""
        x_ref = self.decode_keyframe(strings[0], shapes[0])
        frames = [x_ref]
        for i in range(1, len(strings)):
            x_ref = self.decode_inter(x_ref, strings[i], shapes[i])
            frames.append(x_ref)
        stacked = jnp.stack(frames, axis=1)
        if u8:
            stacked = self._egress_u8(stacked)
        return np.asarray(stacked)
