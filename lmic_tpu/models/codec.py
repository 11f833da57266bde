"""Host-side codec wrappers.

A `Codec` owns a flax transform module, its trained variables, and the frozen
integer CDF tables built by `update()`. `compress()` runs ONE jitted device
pass per image batch (transforms, deterministic quantization, entropy
parameters, scale-table bucketing all on the TPU), then crosses to the native
rANS coder once with flat int32 arrays. `decompress()` mirrors it. This
replaces the reference's per-tensor `.tolist()` marshaling and its
encode-side simulated decompress round trip
(compressai/models/google.py:325-344): `round(x - median) + median` is
deterministic, so the encoder computes `z_hat` directly on device.

API parity with the reference `CompressionModel` contract
(google.py:58-123): `forward/__call__`, `compress -> {"strings", "shape"}`,
`decompress -> {"x_hat"}`, `update(force)`, `aux_loss`.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lmic_tpu.entropy import coder as rans
from lmic_tpu.entropy.entropy_models import (
    EBState,
    GaussianConditional,
    GCState,
    eb_update,
    get_scale_table,
)


def _narrowest_int(sym: np.ndarray):
    """int8 when all decoded symbols fit (halves upload bytes on the
    host->device link), else int16."""
    if sym.size and sym.min() >= -128 and sym.max() <= 127:
        return np.int8
    return np.int16


def _bitcast_u8(a):
    """Device-side reinterpret of an int8 array as uint8 (same bytes) so
    heterogeneous encode outputs concatenate into ONE transfer buffer."""
    return jax.lax.bitcast_convert_type(a, jnp.uint8).reshape(-1)


class _PerItem:
    """Run a jitted B=1 device graph once per batch item.

    Wire-determining convolution graphs (analysis transforms, the hyper
    synthesis that yields entropy indexes) must not see the batch shape:
    batched conv executables are not guaranteed to match their B=1
    counterparts ulp-for-ulp, and a 1-ulp scale difference flips a
    Gaussian-conditional bucket — on the params path that desyncs the
    whole rANS stream. The AR family hit exactly this (a stale-cache
    codegen mismatch between a batched and a B=1 h_s executable) and
    fixed it by running h_s on B=1 slices; this wrapper generalizes that
    fix: every batch item runs a B=1 slice through ONE shared compile,
    so symbols and indexes are independent of batch grouping on every
    codec path, at any batch size, sharded or not.

    `post`, when given, is a batched LAYOUT-ONLY jit (bitcasts, reshapes,
    flag reductions — no convolutions) applied to the concatenated
    per-item results; its output is bit-identical for any grouping by
    construction.

    Multi-device serving (`parallel.shard_codec`) assigns `devices`:
    items are placed round-robin across the mesh, every device running
    the same B=1 program — a homogeneous device set produces identical
    numerics (the same assumption the AR fan-out and `check_homogeneous`
    already make). Results concatenate on the first device.

    `inner` (the shared B=1 jit) stays exposed for AOT export
    (utils/aot.py serializes it at B=1 and re-wraps on load).
    """

    def __init__(self, inner, post=None, devices=None):
        self.inner = inner
        self.post = post
        self.devices = devices

    def _run(self, *args):
        B = args[0].shape[0]
        devs = self.devices
        if B == 1 and not devs:
            return self.inner(*args)
        outs = []
        for i in range(B):
            sl = [a[i:i + 1] for a in args]
            if devs:
                dev = devs[i % len(devs)]
                sl = [jax.device_put(a, dev) for a in sl]
            outs.append(self.inner(*sl))
        if B == 1:
            return outs[0]
        if devs:
            outs = [jax.device_put(o, devs[0]) for o in outs]
        return jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs
        )

    def __call__(self, *args):
        out = self._run(*args)
        if self.post is None:
            return out
        return self.post(*out) if isinstance(out, tuple) else self.post(out)


class CompressionCodec:
    """Base wrapper: module + variables + coding state."""

    def __init__(self, module, variables):
        self.module = module
        self.variables = variables
        self.eb_state: Optional[EBState] = None
        self.gc_state: Optional[GCState] = None
        # per-stage wall-clock of the LAST compress/decompress call
        # (fetch/upload legs vs host rANS legs), for perf attribution —
        # bench.py surfaces these in its JSON lines
        self.stats: Dict[str, float] = {}

    def _stat(self, key: str, t0: float) -> float:
        import time

        now = time.perf_counter()
        self.stats[key] = round((now - t0) * 1e3, 1)
        return now

    # -- training/eval forward ------------------------------------------------
    def __call__(self, x, training: bool = False, key=None):
        rngs = {"noise": key} if training else None
        return self.module.apply(
            self.variables, x, training=training, rngs=rngs
        )

    def aux_loss(self):
        return self.module.apply(
            self.variables, method=type(self.module).aux_loss
        )

    def _check_dims(self, x: np.ndarray):
        """Hyperprior-family streams only roundtrip when H, W are multiples
        of the downsampling factor: the decoder re-derives the y-latent
        geometry by upsampling z 4x (h_s), so ceil-divided encode shapes
        desync otherwise. The reference has the same constraint but fails
        silently with a corrupted stream (its CLIs pad first — ours do too:
        codec_cli/eval_model pad centered); fail loudly here instead."""
        factor = getattr(self.module, "downsampling_factor", None)
        if factor is None:
            return
        H, W = x.shape[1:3]
        if H % factor or W % factor:
            raise ValueError(
                f"input spatial dims ({H}, {W}) must be multiples of "
                f"{factor}; {self._dims_hint}"
            )

    # codecs whose container cannot carry padding geometry override this
    _dims_hint = "pad first (CLIs use centered padding)"

    # -- coding state ----------------------------------------------------------
    def update(self, force: bool = False):
        raise NotImplementedError

    def compress(self, x) -> Dict[str, Any]:
        raise NotImplementedError

    def decompress(self, strings, shape) -> Dict[str, Any]:
        raise NotImplementedError

    @property
    def _host_worker(self):
        """Single worker thread for the host half of decompress_async: a
        caller pipelining batches then overlaps this batch's decode legs
        (host rANS + its transfers) with the next batch's encode legs —
        the host-device link is full-duplex, so up and down legs that run
        concurrently cost max() instead of sum(). Host coding and jit
        dispatch both release the GIL."""
        pool = getattr(self, "_host_pool", None)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor

            pool = self._host_pool = ThreadPoolExecutor(max_workers=1)
        return pool

    @staticmethod
    def _decode_threaded() -> bool:
        """LMIC_DECODE_THREAD=1 moves decompress_async's host half to the
        worker thread. Default off: measured A/B on the tunnel TPU shows
        concurrent transfers interleave erratically there (1.1-2.6 MP/s
        run-to-run vs a stable 1.9-2.4 inline); the inline path still
        overlaps the final pixel download with the next batch's legs when
        the caller pipelines (bench.py bench_pipelined)."""
        import os

        return os.environ.get("LMIC_DECODE_THREAD", "0") == "1"


class FactorizedPriorCodec(CompressionCodec):
    """bmshj2018-factorized coding wrapper."""

    def __init__(self, module, variables):
        super().__init__(module, variables)
        cls = type(module)
        # analysis is wire-determining (its output becomes the coded
        # symbols): per-image B=1 slices through one shared compile
        self._g_a = _PerItem(jax.jit(
            lambda x: module.apply(variables, x, method=cls.g_a)
        ))
        self._g_s = jax.jit(
            lambda y: jnp.clip(
                module.apply(variables, y, method=cls.g_s), 0.0, 1.0
            )
        )

    def update(self, force: bool = False):
        if self.eb_state is not None and not force:
            return False
        from lmic_tpu.entropy.entropy_models import EntropyBottleneck

        eb = EntropyBottleneck(channels=self.module.M)
        self.eb_state = eb_update(
            eb, {"params": self.variables["params"]["entropy_bottleneck"]}
        )
        # the u8 fast-path jits capture medians from the previous state
        for name in ("_enc_u8", "_enc_u8_packed", "_dec_u8"):
            if hasattr(self, name):
                delattr(self, name)
        return True

    def _build_u8_fns(self):
        """Transfer-optimized device passes: images cross the host<->device
        link as uint8 and latents as channel-major int8 symbols (int16
        fallback when any symbol overflows int8 — measured +18% end-to-end
        on the tunnel-attached TPU, where link bytes dominate, not FLOPs).
        The wire-determining analysis runs per image (`_PerItem`); the
        packed-transfer layout is a batched layout-only post stage."""
        module, variables = self.module, self.variables
        cls = type(module)
        medians = jnp.asarray(self.eb_state.medians)

        def enc8(x_u8):
            x = x_u8.astype(jnp.float32) / 255.0
            y = module.apply(variables, x, method=cls.g_a)
            sym = jnp.round(y - medians)
            overflow = jnp.sum((sym < -128) | (sym > 127))
            return (
                jnp.moveaxis(sym, -1, 1).astype(jnp.int8),  # coder layout
                overflow.astype(jnp.int32).reshape(1),      # per-item flag
            )

        def pack(sym8, overflow):
            # single-fetch layout: [1B overflow flag | int8 symbols].
            # The tunnel-attached TPU pays a ~25 ms fixed cost per
            # device->host transfer, so the flag and the symbols must come
            # back in ONE buffer (measured: 3 separate fetches cost ~70 ms
            # more than one combined fetch at equal bytes). Layout-only:
            # safe to run at batch shape.
            flag = (jnp.sum(overflow) > 0).astype(jnp.uint8).reshape(1)
            return jnp.concatenate([flag, _bitcast_u8(sym8)])

        def enc16(x_u8):
            x = x_u8.astype(jnp.float32) / 255.0
            y = module.apply(variables, x, method=cls.g_a)
            sym = jnp.round(y - medians).astype(jnp.int16)
            return jnp.moveaxis(sym, -1, 1)

        def dec(sym_cmaj):
            y_hat = jnp.moveaxis(
                sym_cmaj.astype(jnp.float32), 1, -1
            ) + medians
            x = jnp.clip(
                module.apply(variables, y_hat, method=cls.g_s), 0.0, 1.0
            )
            return jnp.round(x * 255.0).astype(jnp.uint8)

        self._enc_u8_packed = _PerItem(jax.jit(enc8), post=jax.jit(pack))
        self._enc_u8 = _PerItem(jax.jit(enc16))
        self._dec_u8 = jax.jit(dec)       # int8 and int16 callers share it

    def _latent_shape(self, B, H, W):
        # stride-2 convs emit ceil(H/2) per stage (layers.py conv padding),
        # and nested ceil-divisions compose: 4 stages -> ceil(H/16)
        return (B, self.module.M, -(-H // 16), -(-W // 16))

    def _fetch_symbols(self, x_dev, packed):
        """ONE device->host fetch resolves flag + symbols; on the rare int8
        overflow rerun the int16 pass."""
        import time

        t0 = time.perf_counter()
        buf = np.asarray(packed)  # single transfer: [flag | int8 symbols]
        self._stat("enc_fetch_ms", t0)
        if buf[0] == 0:
            B, H, W = x_dev.shape[:3]
            return buf[1:].view(np.int8).reshape(self._latent_shape(B, H, W))
        return np.asarray(self._enc_u8(x_dev))  # pragma: no cover - rare

    def _code_symbols(self, sym):
        import time

        t0 = time.perf_counter()
        B, C = sym.shape[:2]
        indexes = np.broadcast_to(
            np.arange(C, dtype=np.int32)[:, None],
            (C, sym.shape[2] * sym.shape[3]),
        )
        from lmic_tpu.entropy import coder as _rans

        y_strings = _rans.encode_batch(
            sym.reshape(B, -1), indexes.reshape(-1), self.eb_state.table
        )
        self._stat("enc_rans_ms", t0)
        return {"strings": [y_strings], "shape": sym.shape[2:4]}

    def compress_async(self, x):
        """Dispatch the device half of compress and return a finalizer.

        JAX dispatch is asynchronous: the device pass (and the transfer
        back) runs while the host does other work — e.g. entropy-coding the
        PREVIOUS batch. `finalize()` blocks on the symbols and runs the
        host coder. uint8 fast path only.
        """
        self._check_updated()
        x = np.asarray(x)
        assert x.dtype == np.uint8, "compress_async: uint8 fast path only"
        if not hasattr(self, "_enc_u8"):
            self._build_u8_fns()
        x_dev = jnp.asarray(x)
        packed = self._enc_u8_packed(x_dev)  # async dispatch
        packed.copy_to_host_async()  # download starts when compute ends

        return lambda: self._code_symbols(self._fetch_symbols(x_dev, packed))

    def compress(self, x):
        """x: (B, H, W, C) float in [0,1] or uint8 (fast path)."""
        self._check_updated()
        x = np.asarray(x)
        if x.dtype == np.uint8:
            if not hasattr(self, "_enc_u8"):
                self._build_u8_fns()
            x_dev = jnp.asarray(x)
            sym = self._fetch_symbols(x_dev, self._enc_u8_packed(x_dev))
            return self._code_symbols(sym)
        y = np.asarray(self._g_a(jnp.asarray(x)))
        y_strings = self.eb_state.compress(y)
        return {"strings": [y_strings], "shape": y.shape[1:3]}

    def decompress_async(self, strings, shape):
        """Run the host decode half (inline by default; on the worker
        thread with LMIC_DECODE_THREAD=1 — see _decode_threaded) and return
        a finalizer producing the uint8 reconstruction: the pixel download
        proceeds in the background, so a pipelining caller overlaps it with
        the next batch's encode legs."""
        self._check_updated()
        if not hasattr(self, "_enc_u8"):
            self._build_u8_fns()
        if not self._decode_threaded():
            x_dev = self._decompress_u8_body(strings, shape)
            return lambda: {"x_hat": np.asarray(x_dev)}
        fut = self._host_worker.submit(
            self._decompress_u8_body, strings, shape
        )
        return lambda: {"x_hat": np.asarray(fut.result())}

    def _decompress_u8_body(self, strings, shape):
        import time

        from lmic_tpu.entropy import coder as _rans

        t0 = time.perf_counter()
        C = len(self.eb_state.medians)
        H, W = shape
        indexes = np.repeat(np.arange(C, dtype=np.int32), H * W)
        sym = _rans.decode_batch(strings[0], indexes, self.eb_state.table)
        sym = sym.reshape(len(strings[0]), C, H, W)
        sym = sym.astype(_narrowest_int(sym))
        self._stat("dec_rans_ms", t0)
        dev = self._dec_u8(jnp.asarray(sym))  # device value (async)
        # start the pixel download as soon as the synth finishes, not when
        # the caller joins — in the pipelined path the join happens a full
        # batch later, so the biggest transfer rides the idle link window
        dev.copy_to_host_async()
        return dev

    def decompress(self, strings, shape, u8: bool = False):
        self._check_updated()
        assert isinstance(strings, list) and len(strings) == 1
        if u8:
            import time

            if not hasattr(self, "_enc_u8"):
                self._build_u8_fns()
            dev = self._decompress_u8_body(strings, shape)
            t0 = time.perf_counter()
            out = np.asarray(dev)
            self._stat("dec_fetch_ms", t0)
            return {"x_hat": out}
        y_hat = self.eb_state.decompress(strings[0], tuple(shape))
        x_hat = np.asarray(self._g_s(jnp.asarray(y_hat)))
        return {"x_hat": x_hat}

    def _check_updated(self):
        if self.eb_state is None:
            raise RuntimeError("Uninitialized CDFs. Run update() first")


class HyperpriorCodec(CompressionCodec):
    """Coding wrapper for ScaleHyperprior / MeanScaleHyperprior.

    Device pass layout (one jit each way):
      encode: x -> y, z, z_hat(det), (sigma, mu), GC indexes, y symbols
      decode: z_hat -> (sigma, mu), indexes;  y_hat -> x_hat
    """

    def __init__(self, module, variables):
        super().__init__(module, variables)
        cls = type(module)

        def _analyze(x):
            return module.apply(variables, x, method=cls.analyze)

        def _dec_params(z_hat, scale_table):
            scales, means = module.apply(
                variables, z_hat, method=cls.hyper_to_params
            )
            gc = GaussianConditional()
            indexes = gc.build_indexes(scale_table, scales)
            return indexes, means

        def _dec_synth(symbols, means):
            y_hat = symbols.astype(jnp.float32)
            if means is not None:
                y_hat = y_hat + means
            return jnp.clip(
                module.apply(variables, y_hat, method=cls.g_s), 0.0, 1.0
            )

        # analysis is wire-determining: per-image B=1 slices (_PerItem)
        self._analyze = _PerItem(jax.jit(_analyze))
        # shared by compress AND decompress so entropy parameters — and
        # therefore scale-bucket indexes — are bit-identical on both
        # sides; run per image at the call site (_params_for_wire_z)
        self._dec_params = jax.jit(_dec_params)
        self._dec_synth = jax.jit(_dec_synth)

    def _build_u8_fns(self):
        """int8-transfer fast path (see FactorizedPriorCodec._build_u8_fns):
        pixels cross the link as uint8, z/y as int8 symbols (int16
        fallback), GC indexes as uint8. `_params_from_zsym` is the ONLY
        place entropy parameters are derived, used by both directions, so
        indexes agree bit-for-bit."""
        module, variables = self.module, self.variables
        cls = type(module)
        z_medians = jnp.asarray(self.eb_state.medians)
        table = jnp.asarray(self.gc_state.scale_table)
        gc = GaussianConditional()

        def analyze_u8(x_u8):
            x = x_u8.astype(jnp.float32) / 255.0
            y, z = module.apply(variables, x, method=cls.analyze)
            z_sym = jnp.round(z - z_medians)
            ovf = jnp.sum((z_sym < -128) | (z_sym > 127)).astype(jnp.int32)
            return y, jnp.moveaxis(z_sym, -1, 1).astype(jnp.int8), \
                ovf.reshape(1)

        def params_from_zsym(z_sym_cmaj):
            z_hat = jnp.moveaxis(
                z_sym_cmaj.astype(jnp.float32), 1, -1
            ) + z_medians
            scales, means = module.apply(
                variables, z_hat, method=cls.hyper_to_params
            )
            # indexes leave the device channel-major so the host coder's
            # flatten matches the reference's NCHW symbol order exactly
            indexes = jnp.moveaxis(
                gc.build_indexes(table, scales), -1, 1
            ).astype(jnp.uint8)
            return indexes, means

        def ysym(y, means):
            sym = jnp.round(y - means if means is not None else y)
            ovf = jnp.sum((sym < -128) | (sym > 127)).astype(jnp.int32)
            sym = jnp.moveaxis(sym, -1, 1)  # channel-major coding order
            return sym.astype(jnp.int8), sym.astype(jnp.int16), ovf

        def synth_u8(y_sym_cmaj, means):
            y_hat = jnp.moveaxis(y_sym_cmaj.astype(jnp.float32), 1, -1)
            if means is not None:
                y_hat = y_hat + means
            x = jnp.clip(
                module.apply(variables, y_hat, method=cls.g_s), 0.0, 1.0
            )
            return jnp.round(x * 255.0).astype(jnp.uint8)

        def pack_enc(z8, idx_u8, y8, zovf, yovf):
            # single-fetch layout: [zflag, yflag | z8 | idx | y8]. The
            # tunnel TPU pays ~25 ms fixed per device->host transfer; the
            # whole encode result must come back in ONE buffer. Bytes are
            # bit-identical to the separate arrays, so the coded stream is
            # unchanged. Layout-only: safe at batch shape. zovf is the
            # per-image (B,) counter from _PerItem-run analyze; yovf is
            # the batch-summed scalar from the (elementwise, batch-safe)
            # ysym pass.
            flags = jnp.stack(
                [jnp.sum(zovf) > 0, jnp.sum(yovf) > 0]
            ).astype(jnp.uint8)
            return jnp.concatenate([
                flags,
                _bitcast_u8(z8),
                idx_u8.reshape(-1),
                _bitcast_u8(y8),
            ])

        # analyze (g_a+h_a) and the params graph (h_s -> scale buckets)
        # are wire-determining: per-image B=1 slices through one shared
        # compile (_PerItem). ysym/synth/pack are elementwise/layout-only
        # and stay batched.
        self._analyze_u8 = _PerItem(jax.jit(analyze_u8))
        self._params_from_zsym = _PerItem(jax.jit(params_from_zsym))
        self._ysym = jax.jit(ysym)
        self._synth_u8 = jax.jit(synth_u8)
        self._pack_enc = jax.jit(pack_enc)

    def update(self, force: bool = False, scale_table=None):
        if self.eb_state is not None and self.gc_state is not None and not force:
            return False
        from lmic_tpu.entropy.entropy_models import EntropyBottleneck

        eb = EntropyBottleneck(channels=self.module.N)
        self.eb_state = eb_update(
            eb, {"params": self.variables["params"]["entropy_bottleneck"]}
        )
        if scale_table is None:
            scale_table = get_scale_table()
        self.gc_state = GaussianConditional().update(scale_table)
        # the u8 fast-path jits capture medians/scale table
        for name in ("_analyze_u8", "_params_from_zsym", "_ysym",
                     "_synth_u8", "_pack_enc"):
            if hasattr(self, name):
                delattr(self, name)
        return True

    def _check_updated(self):
        if self.eb_state is None or self.gc_state is None:
            raise RuntimeError("Uninitialized CDFs. Run update() first")

    def _params_for_wire_z(self, z_sym_cm: np.ndarray):
        """Entropy parameters as a pure function of the WIRE z symbols
        (channel-major int32, (B, C, h, w)). int8-fitting z runs the SAME
        `_params_from_zsym` graph the u8 paths use; wider z runs the float
        graph — so every encode/decode pair picks the same compiled graph
        from the same bytes, whichever API produced the stream (the
        shared-graph bitstream invariant; a 1-ulp divergence between the
        two compiled graphs at a scale-bucket boundary would otherwise
        desync a cross-API roundtrip). Returns (indexes channel-major
        int32, means NHWC or None)."""
        fits8 = (z_sym_cm.size == 0
                 or (z_sym_cm.min() >= -128 and z_sym_cm.max() <= 127))
        if fits8:
            if not hasattr(self, "_params_from_zsym"):
                self._build_u8_fns()
            idx_cm, means = self._params_from_zsym(
                jnp.asarray(z_sym_cm.astype(np.int8))
            )
            return (np.asarray(idx_cm).astype(np.int32),
                    None if means is None else np.asarray(means))
        C = len(self.eb_state.medians)
        z_hat = (z_sym_cm.astype(np.float32)
                 + self.eb_state.medians.reshape(1, C, 1, 1))
        table = jnp.asarray(self.gc_state.scale_table)
        z_dev = jnp.asarray(np.moveaxis(z_hat, 1, -1))
        # per image (B=1 slices, one shared compile): indexes must not
        # depend on batch grouping — see _PerItem
        outs = [
            jax.device_get(self._dec_params(z_dev[i:i + 1], table))
            for i in range(z_dev.shape[0])
        ]
        indexes = np.concatenate([np.asarray(o[0]) for o in outs], axis=0)
        means = (None if outs[0][1] is None else
                 np.concatenate([np.asarray(o[1]) for o in outs], axis=0))
        return (np.moveaxis(indexes.astype(np.int32), -1, 1), means)

    def compress(self, x):
        self._check_updated()
        x = np.asarray(x)
        self._check_dims(x)
        if x.dtype == np.uint8:
            return self._compress_u8(x)
        y, z = jax.device_get(self._analyze(jnp.asarray(x)))
        z_strings = self.eb_state.compress(z)
        # deterministic z_hat: round(z - median) + median equals the decoder's
        # coder roundtrip exactly (escape coding is lossless)
        C = z.shape[-1]
        medians = self.eb_state.medians.reshape(
            (1,) * (z.ndim - 1) + (C,)
        )
        z_sym_cm = np.moveaxis(
            np.round(z - medians).astype(np.int32), -1, 1
        )
        idx_cm, means = self._params_for_wire_z(z_sym_cm)
        symbols = np.round(y - means if means is not None else y).astype(
            np.int32
        )
        B = symbols.shape[0]
        # channel-major (NCHW-flat) symbol order — byte-identical to the
        # reference's per-image flatten (entropy_models.py:237-270)
        y_strings = rans.encode_batch(
            np.moveaxis(symbols, -1, 1).reshape(B, -1),
            idx_cm.reshape(B, -1),
            self.gc_state.table,
        )
        return {"strings": [y_strings, z_strings], "shape": z.shape[1:3]}

    def compress_async(self, x):
        """Dispatch the WHOLE device half of compress (uint8 fast path) —
        analyze, shared params graph, y symbols, and the single-transfer
        pack — and return a finalizer that fetches one buffer and runs the
        host entropy coding. The next batch's device pass overlaps this
        batch's coding."""
        self._check_updated()
        x = np.asarray(x)
        self._check_dims(x)
        assert x.dtype == np.uint8, "compress_async: uint8 fast path only"
        if not hasattr(self, "_analyze_u8"):
            self._build_u8_fns()
        x_dev = jnp.asarray(x)
        y_dev, z8, zovf = self._analyze_u8(x_dev)          # async
        idx_dev, means_dev = self._params_from_zsym(z8)    # async, shared
        y8, y16, yovf = self._ysym(y_dev, means_dev)       # async
        packed = self._pack_enc(z8, idx_dev, y8, zovf, yovf)  # async
        packed.copy_to_host_async()  # download starts when compute ends
        pending = (packed, y16)
        return lambda: self._finish_compress_u8(x, pending)

    def _latent_shapes(self, B, H, W):
        # ceil division: the conv stacks emit ceil(H/2) per stride-2 stage
        m = self.module
        return ((B, m.N, -(-H // 64), -(-W // 64)),
                (B, m.M, -(-H // 16), -(-W // 16)))

    def _finish_compress_u8(self, x: np.ndarray, pending):
        import time

        packed, y16 = pending
        t0 = time.perf_counter()
        buf = np.asarray(packed)  # ONE device->host transfer
        t0 = self._stat("enc_fetch_ms", t0)
        if buf[0]:  # pragma: no cover - extreme hyper latents
            return self.compress(x.astype(np.float32) / 255.0)
        zshape, yshape = self._latent_shapes(*x.shape[:3])
        zn, yn = int(np.prod(zshape)), int(np.prod(yshape))
        assert buf.size == 2 + zn + 2 * yn, (
            "packed encode layout mismatch (input must be padded to x64)"
        )
        z_sym = buf[2:2 + zn].view(np.int8).reshape(zshape)
        idx = buf[2 + zn:2 + zn + yn].reshape(yshape)
        if buf[1]:  # pragma: no cover - rare int8 y overflow
            ysym = np.asarray(y16)
        else:
            ysym = buf[2 + zn + yn:2 + zn + 2 * yn].view(np.int8).reshape(
                yshape
            )
        B, Cz = zshape[:2]
        ch_idx = np.broadcast_to(
            np.arange(Cz, dtype=np.int32)[:, None],
            (Cz, zshape[2] * zshape[3]),
        )
        z_strings = rans.encode_batch(
            z_sym.reshape(B, -1), ch_idx.reshape(-1), self.eb_state.table
        )
        y_strings = rans.encode_batch(
            ysym.reshape(B, -1), idx.reshape(B, -1), self.gc_state.table
        )
        self._stat("enc_rans_ms", t0)
        return {"strings": [y_strings, z_strings],
                "shape": zshape[2:4]}

    def _compress_u8(self, x: np.ndarray):
        return self.compress_async(x)()

    def decompress_async(self, strings, shape):
        """Run the host decode half (inline by default; on the worker
        thread with LMIC_DECODE_THREAD=1 — see _decode_threaded); the
        finalizer blocks on the uint8 reconstruction, whose download
        proceeds in the background. A pipelining caller overlaps this
        batch's decode legs (z decode, index download, y decode and
        upload, pixel download) with the next batch's encode legs."""
        self._check_updated()
        if not hasattr(self, "_analyze_u8"):
            self._build_u8_fns()
        if not self._decode_threaded():
            out = self._decompress_u8(strings, shape, _async=True)
            return out if callable(out) else (lambda: out)
        fut = self._host_worker.submit(
            functools.partial(self._decompress_u8, strings, shape,
                              _async=True)
        )

        def finalize():
            out = fut.result()
            return out() if callable(out) else out

        return finalize

    def _decompress_u8(self, strings, shape, _async: bool = False):
        import time

        if not hasattr(self, "_analyze_u8"):
            self._build_u8_fns()
        y_strings, z_strings = strings[0], strings[1]
        t0 = time.perf_counter()
        C = len(self.eb_state.medians)
        H, W = shape
        ch_idx = np.repeat(np.arange(C, dtype=np.int32), H * W)
        z_sym = rans.decode_batch(
            z_strings, ch_idx, self.eb_state.table
        ).reshape(len(z_strings), C, H, W)
        # int8 iff the values fit — identical to the encoder's dtype choice
        # (same values), so `_params_from_zsym` runs the same compiled graph.
        # Non-int8 z means the ENCODER fell back to the float jits; mirror
        # it so both sides derive indexes from the same compiled graph.
        if _narrowest_int(z_sym) is not np.int8:  # pragma: no cover - rare
            out = self.decompress(strings, shape)
            return {"x_hat": np.round(
                np.clip(out["x_hat"], 0.0, 1.0) * 255.0
            ).astype(np.uint8)}
        z8 = z_sym.astype(np.int8)
        t0 = self._stat("dec_z_rans_ms", t0)
        idx_dev, means_dev = self._params_from_zsym(jnp.asarray(z8))
        idx_dev.copy_to_host_async()
        idx = np.asarray(idx_dev, dtype=np.int32)
        t0 = self._stat("dec_idx_fetch_ms", t0)
        B = idx.shape[0]
        y_sym = rans.decode_batch(
            y_strings, idx.reshape(B, -1), self.gc_state.table
        ).reshape(idx.shape)
        y_up = y_sym.astype(_narrowest_int(y_sym))
        self._stat("dec_y_rans_ms", t0)
        x_dev = self._synth_u8(jnp.asarray(y_up), means_dev)  # async
        x_dev.copy_to_host_async()  # download starts when the synth ends

        def fetch():
            import time as _t

            t1 = _t.perf_counter()
            out = np.asarray(x_dev)
            self._stat("dec_fetch_ms", t1)
            return {"x_hat": out}

        if _async:
            return fetch
        return fetch()

    def decompress(self, strings, shape, u8: bool = False):
        self._check_updated()
        assert isinstance(strings, list) and len(strings) == 2
        if u8:
            return self._decompress_u8(strings, shape)
        y_strings, z_strings = strings[0], strings[1]
        C = len(self.eb_state.medians)
        h, w = shape
        ch_idx = np.repeat(np.arange(C, dtype=np.int32), h * w)
        z_sym_cm = rans.decode_batch(
            z_strings, ch_idx, self.eb_state.table
        ).reshape(len(z_strings), C, h, w)
        idx_cm, means = self._params_for_wire_z(z_sym_cm)
        symbols = rans.decode_batch(
            y_strings, idx_cm.reshape(idx_cm.shape[0], -1),
            self.gc_state.table,
        ).reshape(idx_cm.shape)
        symbols = np.moveaxis(symbols, 1, -1)
        x_hat = np.asarray(
            self._dec_synth(
                jnp.asarray(symbols),
                jnp.asarray(means) if means is not None else None,
            )
        )
        return {"x_hat": x_hat}
