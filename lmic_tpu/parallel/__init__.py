"""Multi-chip scaling utilities.

The reference's only multi-device strategy is single-process
`nn.DataParallel` (examples/train.py:101-108). The TPU-native equivalent is
SPMD data parallelism over an ICI mesh: parameters replicated, the batch
sharded over the `data` axis, gradient reduction emitted by XLA as `psum`
collectives when the loss is jitted over the mesh. Larger models can extend
the same mesh with a `model` axis (the transforms here fit one chip, so the
default mesh is 1-D).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def check_homogeneous(devices):
    """Fan-out serving requires one device kind: entropy parameters are
    recomputed on both codec sides and must round identically."""
    kinds = {d.device_kind for d in devices}
    if len(kinds) > 1:
        raise ValueError(f"heterogeneous device set: {kinds}")
    return list(devices)


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D device mesh over all (or the first n) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = DATA_AXIS):
    """Place a host batch (pytree of arrays) sharded over the data axis."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. params) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def shard_codec(codec, mesh: Mesh, axis: str = DATA_AXIS):
    """Scale a codec's u8 fast paths across a mesh. Two mechanisms,
    matched to the bitstream invariants:

    - wire-determining graphs (analysis transforms, hyper params) run
      per image (B=1 through one shared compile — batch grouping must
      not leak into the wire; models.codec._PerItem) and are fanned out
      round-robin across the mesh, every chip running the same program;
    - the batch-safe graphs (elementwise symbol extraction, packing,
      pixel synthesis) are re-jitted SPMD over the batch axis (XLA
      partitions them batch-wise with no cross-chip collectives).

    Host entropy coding is already per-image. AR and video codecs route
    to their own per-image/per-sequence fan-outs instead.

    Serving pattern: `shard_codec(codec, make_mesh())` once, then feed
    batches whose leading dim divides the mesh size.
    """
    codec._check_updated()
    if hasattr(codec, "bundle_meta"):
        raise ValueError(
            "AOT serving bundles are frozen at a fixed input shape and "
            "cannot be re-sharded; shard the live codec BEFORE export "
            "(then load_serving_bundle(path, mesh=...)), or export "
            "per-device bundles and fan out at the caller level"
        )
    if hasattr(codec, "fanout"):
        # autoregressive family: images are independent, so the wavefront
        # scans (encode + the io_callback decode lanes) fan out one image
        # per chip instead of SPMD-sharding a single program
        return codec.fanout(list(mesh.devices.flat))
    if not hasattr(codec, "_build_u8_fns"):
        raise ValueError(f"{type(codec).__name__} has no u8 fast path")
    # state invalidation (update(force=True), reference-table adoption)
    # deletes the fast-path jits and the next compress rebuilds them via
    # _build_u8_fns — shadow the method on the instance so every rebuild
    # re-applies the sharding instead of silently reverting to one device.
    # Set _shard_spec BEFORE building so a re-shard onto a new mesh jits
    # against the new spec in one pass (not stale-then-correct twice).
    first = not hasattr(codec, "_shard_spec")
    codec._shard_spec = (mesh, axis)
    if first:
        inner_build = codec._build_u8_fns

        def build_and_shard():
            inner_build()
            _apply_codec_sharding(codec, *codec._shard_spec)

        codec._build_u8_fns = build_and_shard
    codec._build_u8_fns()
    return codec


def _apply_codec_sharding(codec, mesh: Mesh, axis: str) -> None:
    from lmic_tpu.models.codec import _PerItem

    data = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    devices = list(mesh.devices.flat)
    # per-jit input shardings: batch-dim arrays shard over `axis`, scalars
    # and per-image flag vectors (overflow counters) replicate
    specs = {
        "_enc_u8": (data,),
        "_enc_u8_packed": (data,),
        "_dec_u8": (data,),
        "_analyze_u8": (data,),
        "_params_from_zsym": (data,),
        "_ysym": (data, data),
        "_synth_u8": (data, data),
        "_pack_enc": (data, data, data, repl, repl),
    }
    for name, shardings in specs.items():
        fn = getattr(codec, name, None)
        if fn is None:
            continue
        if isinstance(fn, _PerItem):
            # wire-determining graphs run per image (B=1 through one
            # shared compile — batch grouping must not leak into the
            # wire); multi-device serving places the B=1 calls
            # round-robin across the mesh, every device running the
            # same program (homogeneous numerics)
            fn.devices = devices
            continue
        # re-jit the original python callable with sharded batch inputs.
        # Args are device_put onto their shardings first: upstream
        # per-item (_PerItem) stages leave results committed to one
        # device, and jit rejects committed args that mismatch
        # in_shardings instead of resharding them.
        inner = getattr(fn, "__wrapped__", fn)
        jitted = jax.jit(inner, in_shardings=shardings)

        def call(*args, _jit=jitted, _sh=shardings):
            # zip would silently drop extras on a spec-table/call-site
            # arity mismatch — fail loudly instead
            assert len(args) == len(_sh), (
                f"sharded codec call got {len(args)} args, spec table "
                f"has {len(_sh)} shardings"
            )
            args = [
                a if a is None else jax.device_put(a, s)
                for a, s in zip(args, _sh)
            ]
            return _jit(*args)

        call.__wrapped__ = inner  # keep re-shardable on a new mesh
        call._jitted = jitted     # jax.export needs the jit (utils/aot.py)
        setattr(codec, name, call)
