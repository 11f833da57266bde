"""AOT serving bundles: `jax.export`-serialized codec inference graphs.

A deployment capability with no reference counterpart (the closest analogue
is its TorchScript support, tests/test_scripting.py, which cannot script
the codec path at all): `export_serving_bundle` freezes an updated codec's
uint8 fast-path device graphs — already shape-specialized, compiled-once
jits — into serialized StableHLO artifacts plus the baked integer coding
tables, and `load_serving_bundle` reconstitutes a working codec from the
bundle WITHOUT flax, model code, or weights. The loaded codec serves
`compress/compress_async/decompress/decompress_async` on the uint8 fast
path bit-identically to the live codec (tests/test_aot.py), so a serving
fleet can ship one directory per (arch, quality, shape) and never import
the model zoo.

Supported: the factorized + hyperprior family (the non-AR image codecs)
and ssf2020 (a 5-dim `input_shape` (1, T, H, W, C) exports the whole-GOP
chain of all three hyperprior sub-codecs, fixed to that GOP length;
per-sequence B=1 only — the live codec runs multi-sequence batches as
per-sequence chains so batch grouping cannot leak into the wire).
The AR wavefront decode streams symbols through `io_callback`, which
`jax.export` cannot serialize (tests/test_export.py pins this boundary).

Multi-chip bundles: `parallel.shard_codec(codec, mesh)` first, then export —
the serialized graphs carry the batch-axis shardings, and
`load_serving_bundle(path, mesh=...)` serves them SPMD over a same-size
mesh (args are committed to the exported shardings before each call).

Bundle layout:
    meta.json   format version, family, (B, H, W, C), N/M widths, fn list,
                nr_devices the graphs were exported for
    state.npz   EB/GC integer CDF tables, medians, scale table
    fns/*.bin   one serialized `jax.export.Exported` per device graph
                (dtype-variant graphs get a `__i8`/`__i16` suffix)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

# Per-family format version: video bundles (format 2) carry prefixed
# state keys / fn names that format-1 loaders cannot read, so they get
# their own version and old loaders reject them at the format gate.
# Image-family format 2: the wire-determining graphs (analysis, hyper
# params) are exported as B=1 `__one` graphs and re-wrapped in _PerItem
# on load, mirroring the live codec's per-image execution (batch
# grouping must not leak into the wire).
FAMILY_FORMAT = {"factorized": 2, "hyperprior": 2, "video": 2}

__all__ = ["export_serving_bundle", "load_serving_bundle"]


def _family(codec) -> str:
    from lmic_tpu.models.codec import FactorizedPriorCodec, HyperpriorCodec
    from lmic_tpu.models.video import ScaleSpaceFlowCodec

    if isinstance(codec, FactorizedPriorCodec):
        return "factorized"
    if isinstance(codec, HyperpriorCodec):
        return "hyperprior"
    if isinstance(codec, ScaleSpaceFlowCodec):
        return "video"
    raise ValueError(
        f"{type(codec).__name__} is not AOT-exportable: only the "
        "factorized/hyperprior family and ssf2020 have callback-free "
        "codec graphs (the AR decode wavefront streams host symbols via "
        "io_callback)"
    )


def _exportable(fn):
    """Resolve a codec device-pass attribute to its jit: sharded codecs
    wrap the batched jits in a device_put shim (parallel._apply_codec_
    sharding) that jax.export cannot serialize directly."""
    return getattr(fn, "_jitted", fn)


def _plan(codec, family, x_spec):
    """(fn, arg_specs) per export, chained through jax.eval_shape so every
    intermediate spec matches the live pipeline exactly. Wire-determining
    graphs are `_PerItem`s in the live codec: their shared B=1 inner jits
    export as `__one` graphs (the loader re-wraps them), while the
    batched layout/elementwise graphs export at the bundle's full B."""
    B = x_spec.shape[0]
    x1 = jax.ShapeDtypeStruct((1,) + tuple(x_spec.shape[1:]), x_spec.dtype)

    def at_B(t):
        return jax.tree.map(
            lambda s: jax.ShapeDtypeStruct((B,) + tuple(s.shape[1:]),
                                           s.dtype), t
        )

    if family == "factorized":
        sym8_1, ovf_1 = jax.eval_shape(codec._enc_u8_packed.inner, x1)
        sym8, ovf = at_B(sym8_1), at_B(ovf_1)
        sym16 = jax.ShapeDtypeStruct(sym8.shape, jnp.int16)
        return {
            "_enc_u8_packed__one": (codec._enc_u8_packed.inner, (x1,)),
            "_enc_u8_packed__post": (
                codec._enc_u8_packed.post, (sym8, ovf)
            ),
            "_enc_u8__one": (codec._enc_u8.inner, (x1,)),
            "_dec_u8__i8": (_exportable(codec._dec_u8), (sym8,)),
            "_dec_u8__i16": (_exportable(codec._dec_u8), (sym16,)),
        }
    y1, z8_1, zovf_1 = jax.eval_shape(codec._analyze_u8.inner, x1)
    idx1, means1 = jax.eval_shape(codec._params_from_zsym.inner, z8_1)
    y, z8, zovf = at_B(y1), at_B(z8_1), at_B(zovf_1)
    idx, means = at_B(idx1), at_B(means1)
    y8, y16, yovf = jax.eval_shape(_exportable(codec._ysym), y, means)
    return {
        "_analyze_u8__one": (codec._analyze_u8.inner, (x1,)),
        "_params_from_zsym__one": (
            codec._params_from_zsym.inner, (z8_1,)
        ),
        "_ysym": (_exportable(codec._ysym), (y, means)),
        "_pack_enc": (_exportable(codec._pack_enc), (z8, idx, y8, zovf, yovf)),
        "_synth_u8__i8": (_exportable(codec._synth_u8), (y8, means)),
        "_synth_u8__i16": (_exportable(codec._synth_u8), (y16, means)),
    }


def _video_plan(codec, x5_spec):
    """ssf2020 export plan: the whole-GOP device chain — per-frame
    transforms, the three sub-codecs' symbol/param graphs (incl. both
    decode symbol dtypes), and the packed-transfer graphs — chained through
    jax.eval_shape so every spec matches the live GOP pipeline exactly
    (models/video.py:_compress_chunk_dispatch/_decompress_chunk)."""
    B, T, H, W, C = x5_spec.shape
    plan = {
        "_ingest_u8": (codec._ingest_u8, (x5_spec,)),
        "_egress_u8": (
            codec._egress_u8,
            (jax.ShapeDtypeStruct((B, T, H, W, C), jnp.float32),),
        ),
    }
    x = jax.ShapeDtypeStruct((B, H, W, C), jnp.float32)

    def sub(which, y):
        st = codec.hp_states[which]
        z8, _ = jax.eval_shape(st._zsym, y)
        idx, means = jax.eval_shape(st._params_from_zsym, z8)
        y8, y16, _ = jax.eval_shape(st._ysym, y, means)
        plan[f"{which}__zsym"] = (st._zsym, (y,))
        plan[f"{which}__params_from_zsym"] = (st._params_from_zsym, (z8,))
        plan[f"{which}__ysym"] = (st._ysym, (y, means))
        plan[f"{which}__yhat__i8"] = (st._yhat, (y8, means))
        plan[f"{which}__yhat__i16"] = (st._yhat, (y16, means))
        plan[f"{which}__yhat_f32"] = (st._yhat_f32, (y, means))
        ovf = jax.ShapeDtypeStruct((), jnp.int32)
        return jax.eval_shape(st._yhat_f32, y, means), (z8, idx, y8, ovf, ovf)

    plan["_img_encode"] = (codec._img_encode, (x,))
    y_img = jax.eval_shape(codec._img_encode, x)
    yhat_img, part_img = sub("img", y_img)
    plan["_img_decode"] = (codec._img_decode, (yhat_img,))
    x_ref = jax.eval_shape(codec._img_decode, yhat_img)
    plan["_motion_encode"] = (codec._motion_encode, (x, x_ref))
    y_mot = jax.eval_shape(codec._motion_encode, x, x_ref)
    yhat_mot, part_mot = sub("motion", y_mot)
    plan["_motion_decode_predict"] = (
        codec._motion_decode_predict, (yhat_mot, x_ref)
    )
    plan["_res_encode"] = (codec._res_encode, (x,))
    y_res = jax.eval_shape(codec._res_encode, x)
    yhat_res, part_res = sub("res", y_res)
    plan["_res_decode"] = (codec._res_decode, (yhat_res, yhat_mot))

    parts = [part_img] + [part_mot, part_res] * (T - 1)
    plan["_pack_gop"] = (codec._pack_gop, (parts,))
    plan["_cat_u8"] = (codec._cat_u8, ([idx for _, idx, _, _, _ in parts],))
    return plan


def export_serving_bundle(codec, out_dir, input_shape) -> str:
    """Serialize `codec`'s uint8 fast-path graphs for `input_shape` —
    (B, H, W, C) for the image family, (B, T, H, W, C) for ssf2020 —
    into `out_dir`. The codec must be `update()`d; the graphs are exported
    exactly as the live codec built them, so the bundle codes
    bit-identical streams."""
    from jax import export as jexport

    codec._check_updated()
    family = _family(codec)
    if family == "video":
        if len(input_shape) != 5:
            raise ValueError("ssf2020 bundles take (B, T, H, W, C)")
        B, T, H, W, C = map(int, input_shape)
        if T < 2:
            raise ValueError("ssf2020 bundles need a GOP of >= 2 frames")
        if B != 1:
            raise ValueError(
                "ssf2020 bundles are per-sequence (B=1): the live codec "
                "runs multi-sequence batches as per-sequence GOP chains "
                "(batch grouping must not leak into the wire) — export "
                "B=1 and fan out at the caller"
            )
    else:
        B, H, W, C = map(int, input_shape)
        T = None
    # hyperprior: 4 encoder + 2 hyper stride-2 convs -> 64; ssf2020: 4
    # encoder + 3 hyper stride-2 convs -> 128 (video_eval PAD_MULTIPLE)
    mult = {"hyperprior": 64, "video": 128}.get(family)
    if mult and (H % mult or W % mult):
        raise ValueError(f"{family} bundles need {mult}-multiple H, W")
    if family != "video" and not hasattr(
        codec, "_enc_u8" if family == "factorized" else "_analyze_u8"
    ):
        codec._build_u8_fns()
    x_spec = jax.ShapeDtypeStruct(tuple(map(int, input_shape)), jnp.uint8)

    os.makedirs(os.path.join(out_dir, "fns"), exist_ok=True)
    plan = (_video_plan(codec, x_spec) if family == "video"
            else _plan(codec, family, x_spec))
    fn_names = []
    nr_devices = 1
    for name, (fn, specs) in plan.items():
        exp = jexport.export(fn)(*specs)
        nr_devices = max(nr_devices, exp.nr_devices)
        with open(os.path.join(out_dir, "fns", name + ".bin"), "wb") as f:
            f.write(exp.serialize())
        fn_names.append(name)

    state: Dict[str, Any] = {}

    def save_tables(prefix, eb_state, gc_state):
        state[f"{prefix}eb_cdf"] = eb_state.table.cdf
        state[f"{prefix}eb_cdf_length"] = eb_state.table.cdf_length
        state[f"{prefix}eb_offset"] = eb_state.table.offset
        state[f"{prefix}eb_medians"] = np.asarray(eb_state.medians)
        if gc_state is not None:
            state[f"{prefix}gc_cdf"] = gc_state.table.cdf
            state[f"{prefix}gc_cdf_length"] = gc_state.table.cdf_length
            state[f"{prefix}gc_offset"] = gc_state.table.offset
            state[f"{prefix}gc_scale_table"] = np.asarray(
                gc_state.scale_table
            )

    if family == "video":
        for which, st in codec.hp_states.items():
            save_tables(f"{which}__", st.eb_state, st.gc_state)
    else:
        save_tables("", codec.eb_state, codec.gc_state)
    np.savez(os.path.join(out_dir, "state.npz"), **state)

    meta = {
        "format": FAMILY_FORMAT[family],
        "family": family,
        "input_shape": list(map(int, input_shape)),
        "N": int(getattr(codec.module, "N", 0)),
        "M": int(getattr(codec.module, "M", 0)),
        "downsampling_factor": int(
            getattr(codec.module, "downsampling_factor", 0)
        ),
        "fns": fn_names,
        "nr_devices": nr_devices,
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


class _ModuleShim:
    """Width metadata the codec host logic reads off `self.module`."""

    def __init__(self, N, M, downsampling_factor):
        self.N = N
        self.M = M
        if downsampling_factor:
            self.downsampling_factor = downsampling_factor


def _frozen(*_a, **_k):
    raise RuntimeError(
        "AOT serving bundle: graphs are frozen at export; rebuild the "
        "bundle from the live codec instead"
    )


def _restrict_to_u8(codec, meta):
    """Frozen-bundle API guards, shared by all families: uint8 fast path
    only, input fixed to the exported shape. Installed over compress,
    decompress, AND their async variants — the async entry points reuse
    the same exported graphs and would otherwise bypass the checks and
    die deep inside `jax.export` with an opaque error."""
    fixed = tuple(meta["input_shape"])

    def check_x(x):
        x = np.asarray(x)
        if x.dtype != np.uint8:
            raise RuntimeError(
                "AOT serving bundle codes the uint8 fast path only"
            )
        if tuple(x.shape) != fixed:
            raise ValueError(
                f"bundle is fixed to input shape {meta['input_shape']}; "
                f"got {list(x.shape)}"
            )
        return x

    inner_c, inner_ca = codec.compress, codec.compress_async
    codec.compress = lambda x: inner_c(check_x(x))
    codec.compress_async = lambda x: inner_ca(check_x(x))

    inner_d = codec.decompress
    # the decode-side analogue of check_x: the exported graphs are fixed
    # to the latent geometry of `input_shape`, so a wrong `shape` (or a
    # wrong per-stream batch count) must fail with a clear ValueError
    # here, not a deep jax.export shape mismatch
    if meta["family"] == "factorized":
        dec_shape = (-(-fixed[1] // 16), -(-fixed[2] // 16))
    elif meta["family"] == "hyperprior":
        dec_shape = (-(-fixed[1] // 64), -(-fixed[2] // 64))
    else:
        dec_shape = None

    def check_strings(strings, shape):
        if dec_shape is None:  # video: per-frame strings/shape structure
            # the exported GOP graphs are serialized for a fixed frame
            # count and per-stream batch; a mismatch would die inside
            # jax.export with an opaque pytree error
            T, B = fixed[1], fixed[0]
            if len(strings) != T:
                raise ValueError(
                    f"bundle is fixed to {T}-frame GOPs; got "
                    f"{len(strings)} frame bodies"
                )

            def batch_of(s):
                while isinstance(s, dict):
                    s = next(iter(s.values()))
                return len(s[0])

            batches = [batch_of(s) for s in strings]
            if any(b != B for b in batches):
                raise ValueError(
                    f"bundle is fixed to batch size {B}; got per-frame "
                    f"batches {batches}"
                )
            return
        if tuple(map(int, shape)) != dec_shape:
            raise ValueError(
                f"bundle is fixed to input shape {meta['input_shape']} "
                f"(latent shape {list(dec_shape)}); got shape {list(shape)}"
            )
        if any(len(part) != fixed[0] for part in strings):
            raise ValueError(
                f"bundle is fixed to batch size {fixed[0]}; got "
                f"{[len(p) for p in strings]} streams"
            )

    def decompress(strings, shape, u8=False):
        # default False mirrors the class signature; the rare non-int8
        # escape inside the u8 decode body falls back to THIS method with
        # u8 unset expecting the float path — raising there (instead of
        # re-entering the u8 path) is the correct frozen-bundle behavior
        if not u8:
            raise RuntimeError(
                "AOT serving bundle decodes the uint8 fast path only "
                "(pass u8=True; escape fallbacks need the live codec)"
            )
        check_strings(strings, shape)
        return inner_d(strings, shape, u8=True)

    codec.decompress = decompress
    if dec_shape is not None:
        inner_ida = codec.decompress_async

        def image_decompress_async(strings, shape):
            check_strings(strings, shape)
            return inner_ida(strings, shape)

        codec.decompress_async = image_decompress_async
    if meta["family"] == "video":
        inner_da = codec.decompress_async

        def decompress_async(strings, shapes, u8=True):
            if not u8:
                raise RuntimeError(
                    "AOT serving bundle decodes the uint8 fast path only"
                )
            return inner_da(strings, shapes, u8=True)

        codec.decompress_async = decompress_async
    # else: the image-family decompress_async is u8-only by construction


def _mesh_call(exp, mesh):
    """Call a multi-device `Exported`: commit each arg to the sharding the
    graph was exported with (host numpy arrives uncommitted and is rejected
    in a 1-device calling context; device_put on an already-matching array
    is a no-op)."""
    shardings = exp.in_shardings_jax(mesh)

    def call(*args):
        # shardings are per flattened leaf (a None arg — e.g. the scale-only
        # hyperprior's absent means — contributes no leaves)
        leaves, treedef = jax.tree.flatten(args)
        leaves = [
            a if s is None else jax.device_put(a, s)
            for a, s in zip(leaves, shardings)
        ]
        return exp.call(*jax.tree.unflatten(treedef, leaves))

    return call


def _load_video_bundle(meta, fns, state):
    """Reconstitute a ssf2020 serving codec: three `_HyperpriorState` shims
    built from the saved tables, every device graph a deserialized export.
    The host GOP orchestration (models/video.py) runs unchanged on top."""
    from lmic_tpu.entropy.coder import CdfTable
    from lmic_tpu.entropy.entropy_models import (
        EBState, GaussianConditional, GCState,
    )
    from lmic_tpu.models.codec import CompressionCodec
    from lmic_tpu.models.video import ScaleSpaceFlowCodec, _HyperpriorState

    codec = object.__new__(ScaleSpaceFlowCodec)
    CompressionCodec.__init__(codec, _ModuleShim(0, 0, 0), None)
    codec._fanout_devices = None
    codec.hp_states = {}
    for which in ("img", "motion", "res"):
        st = object.__new__(_HyperpriorState)
        st.which = which
        p = f"{which}__"
        st.eb_state = EBState(
            table=CdfTable(state[p + "eb_cdf"], state[p + "eb_cdf_length"],
                           state[p + "eb_offset"]),
            medians=state[p + "eb_medians"],
        )
        st.gc_state = GCState(
            table=CdfTable(state[p + "gc_cdf"], state[p + "gc_cdf_length"],
                           state[p + "gc_offset"]),
            scale_table=state[p + "gc_scale_table"],
            gc=GaussianConditional(),
        )
        st._zsym = fns[p + "zsym"]
        st._params_from_zsym = fns[p + "params_from_zsym"]
        st._ysym = fns[p + "ysym"]
        st._yhat = (
            lambda s, m, _a=fns[p + "yhat__i8"], _b=fns[p + "yhat__i16"]:
            _a(s, m) if s.dtype == jnp.int8 else _b(s, m)
        )
        st._yhat_f32 = fns[p + "yhat_f32"]
        # the f32 escape paths (extreme-latent overflow) need the live codec
        st._rebuild = st._encode_z = st._params = _frozen
        codec.hp_states[which] = st
    for name in ("_ingest_u8", "_egress_u8", "_img_encode", "_img_decode",
                 "_motion_encode", "_motion_decode_predict", "_res_encode",
                 "_res_decode", "_pack_gop", "_cat_u8"):
        setattr(codec, name, fns[name])
    codec.update = codec.fanout = _frozen
    _restrict_to_u8(codec, meta)
    return codec


def load_serving_bundle(path, mesh=None):
    """Reconstitute a serving codec from an exported bundle. Returns a
    `FactorizedPriorCodec`/`HyperpriorCodec`/`ScaleSpaceFlowCodec` instance
    whose device graphs are the deserialized exports — uint8 fast path
    only, fixed to the bundle's input shape.

    Bundles exported from a `shard_codec`-sharded codec carry SPMD graphs:
    pass a `mesh` of the recorded `nr_devices` size (default: a 1-D mesh
    over the first `nr_devices` local devices)."""
    from jax import export as jexport

    from lmic_tpu.entropy.coder import CdfTable
    from lmic_tpu.entropy.entropy_models import (
        EBState, GaussianConditional, GCState,
    )
    from lmic_tpu.models.codec import (
        CompressionCodec, FactorizedPriorCodec, HyperpriorCodec,
    )

    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    expected = FAMILY_FORMAT.get(meta.get("family"))
    if expected is None or meta["format"] != expected:
        raise ValueError(
            f"unsupported bundle: family {meta.get('family')!r} format "
            f"{meta.get('format')!r} (supported: {FAMILY_FORMAT})"
        )
    if meta["family"] == "video" and int(meta["input_shape"][0]) != 1:
        # export now rejects B>1 (per-sequence wire rule), but format-2
        # bundles written before that gate carry batched GOP graphs whose
        # streams depend on batch grouping — refuse to serve them rather
        # than desync silently against per-sequence live streams
        raise ValueError(
            "unsupported bundle: multi-sequence (B>1) video bundles "
            "predate the per-sequence wire rule and their streams are "
            "not interchangeable with per-sequence codecs; re-export "
            "with B=1 and fan out at the caller"
        )
    nr_devices = int(meta.get("nr_devices", 1))
    if nr_devices == 1:
        if mesh is not None:
            raise ValueError(
                "bundle was exported from an unsharded codec; it runs "
                "single-device (shard the live codec before export for "
                "an SPMD bundle)"
            )
    else:
        if mesh is None:
            from lmic_tpu.parallel import make_mesh

            mesh = make_mesh(nr_devices)
        if mesh.size != nr_devices:
            raise ValueError(
                f"bundle was exported for {nr_devices} devices; got a "
                f"{mesh.size}-device mesh"
            )
    fns = {}
    for name in meta["fns"]:
        with open(os.path.join(path, "fns", name + ".bin"), "rb") as f:
            exp = jexport.deserialize(f.read())
        # per-exp: `__one` (B=1 per-item) graphs export single-device even
        # from a sharded codec; only the batched graphs carry the mesh
        fns[name] = exp.call if exp.nr_devices == 1 else _mesh_call(
            exp, mesh
        )
    state = np.load(os.path.join(path, "state.npz"))

    family = meta["family"]
    if family == "video":
        codec = _load_video_bundle(meta, fns, state)
        codec.bundle_meta = meta
        return codec
    cls = (FactorizedPriorCodec if family == "factorized"
           else HyperpriorCodec)
    codec = object.__new__(cls)
    CompressionCodec.__init__(
        codec,
        _ModuleShim(meta["N"], meta["M"], meta["downsampling_factor"]),
        None,
    )
    codec.eb_state = EBState(
        table=CdfTable(state["eb_cdf"], state["eb_cdf_length"],
                       state["eb_offset"]),
        medians=state["eb_medians"],
    )
    if "gc_cdf" in state:
        codec.gc_state = GCState(
            table=CdfTable(state["gc_cdf"], state["gc_cdf_length"],
                           state["gc_offset"]),
            scale_table=state["gc_scale_table"],
            gc=GaussianConditional(),
        )

    from lmic_tpu.models.codec import _PerItem

    # sharded bundles: the per-item B=1 graphs fan out round-robin over
    # the mesh like the live shard_codec does; single-device bundles run
    # them on the default device (devices=None)
    pi_devs = list(mesh.devices.flat) if nr_devices > 1 else None

    if family == "factorized":
        codec._enc_u8_packed = _PerItem(
            fns["_enc_u8_packed__one"], post=fns["_enc_u8_packed__post"],
            devices=pi_devs,
        )
        codec._enc_u8 = _PerItem(fns["_enc_u8__one"], devices=pi_devs)
        dec8, dec16 = fns["_dec_u8__i8"], fns["_dec_u8__i16"]
        codec._dec_u8 = (
            lambda s: dec8(s) if s.dtype == jnp.int8 else dec16(s)
        )
    else:
        codec._analyze_u8 = _PerItem(fns["_analyze_u8__one"],
                                     devices=pi_devs)
        codec._params_from_zsym = _PerItem(fns["_params_from_zsym__one"],
                                           devices=pi_devs)
        codec._ysym = fns["_ysym"]
        codec._pack_enc = fns["_pack_enc"]
        syn8, syn16 = fns["_synth_u8__i8"], fns["_synth_u8__i16"]
        codec._synth_u8 = (
            lambda s, m: syn8(s, m) if s.dtype == jnp.int8 else syn16(s, m)
        )

    # freeze everything that would rebuild or retrace graphs, and restrict
    # the public API to the uint8 paths the bundle carries
    codec.update = _frozen
    codec._build_u8_fns = _frozen
    _restrict_to_u8(codec, meta)
    codec.bundle_meta = meta
    return codec
