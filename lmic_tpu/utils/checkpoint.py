"""Checkpoint save/load: flax msgpack serialization of the full train state
(params + both optimizer states + step), plus deployment-checkpoint
finalization (`update_model`) that bakes the coder CDF tables and renames
with a content hash.

Reference behaviors: examples/train.py:276-282 (save incl. optimizers,
best-loss copy), compressai/utils/update_model/__main__.py:128-206
(CDF baking + sha256[:8] suffix)."""

from __future__ import annotations

import hashlib
import os
import pickle
import shutil
from typing import Any, Dict, Optional

import flax.serialization
import jax
import numpy as np


def save_checkpoint(path: str, state, extra: Optional[Dict[str, Any]] = None,
                    is_best: bool = False):
    """Serialize a TrainState (or any pytree) + metadata."""
    payload = {
        "state": flax.serialization.to_bytes(jax.device_get(state)),
        "extra": extra or {},
    }
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)
    if is_best:
        best = os.path.join(
            os.path.dirname(path) or ".",
            os.path.basename(path).replace(".ckpt", "") + "_best_loss.ckpt",
        )
        shutil.copyfile(path, best)


def load_checkpoint(path: str, state_template):
    """Restore into a template pytree (same structure as saved)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = flax.serialization.from_bytes(state_template, payload["state"])
    return state, payload.get("extra", {})


def load_train_params(path: str, params_template):
    """Restore ONLY the params subtree of a training checkpoint, without
    reconstructing the optimizer pytree. load_checkpoint needs a template
    whose optax state structure matches the one used at save time (lr
    schedule, clip norm, ...); deployment finalization only needs the
    weights, so decode the msgpack generically and restore the params
    branch structurally. Mirrors the reference update_model flow, which
    reads just the net state_dict (update_model/__main__.py:150-166)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    raw = flax.serialization.msgpack_restore(payload["state"])
    params = flax.serialization.from_state_dict(
        params_template, raw["params"]
    )
    return params, payload.get("extra", {})


def save_params(path: str, params):
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(jax.device_get(params)))


def load_params(path: str, params_template):
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(params_template, f.read())


def update_model_file(in_path: str, out_dir: str, codec, name: str,
                      update: bool = True) -> str:
    """Finalize a deployment checkpoint: run codec.update(force=True), store
    params + coding tables, and name the file with the sha256[:8] of its
    contents (reference update_model/__main__.py:179-205). Pass
    update=False when the codec already carries adopted coding tables
    (e.g. imported from a reference checkpoint's baked buffers)."""
    if update:
        codec.update(force=True)
    blob: Dict[str, Any] = {
        "params": flax.serialization.to_bytes(
            jax.device_get(codec.variables)
        ),
    }
    if codec.eb_state is not None:
        blob["eb_state"] = {
            "cdf": codec.eb_state.table.cdf,
            "cdf_length": codec.eb_state.table.cdf_length,
            "offset": codec.eb_state.table.offset,
            "medians": codec.eb_state.medians,
        }
    if codec.gc_state is not None:
        blob["gc_state"] = {
            "cdf": codec.gc_state.table.cdf,
            "cdf_length": codec.gc_state.table.cdf_length,
            "offset": codec.gc_state.table.offset,
            "scale_table": codec.gc_state.scale_table,
        }
    if getattr(codec, "hp_states", None):
        # ssf2020: one (EB, GC) pair per hyperprior sub-codec
        blob["hp_states"] = {
            which: {
                "eb": {
                    "cdf": hp.eb_state.table.cdf,
                    "cdf_length": hp.eb_state.table.cdf_length,
                    "offset": hp.eb_state.table.offset,
                    "medians": hp.eb_state.medians,
                },
                "gc": {
                    "cdf": hp.gc_state.table.cdf,
                    "cdf_length": hp.gc_state.table.cdf_length,
                    "offset": hp.gc_state.table.offset,
                    "scale_table": hp.gc_state.scale_table,
                },
            }
            for which, hp in codec.hp_states.items()
        }
    data = pickle.dumps(blob)
    digest = hashlib.sha256(data).hexdigest()[:8]
    out_path = os.path.join(out_dir, f"{name}-{digest}.ckpt")
    os.makedirs(out_dir, exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(data)
    return out_path


def load_updated_model(path: str, codec):
    """Load a deployment checkpoint produced by update_model_file into a
    codec of the right architecture."""
    from lmic_tpu.entropy.coder import CdfTable
    from lmic_tpu.entropy.entropy_models import EBState, GaussianConditional, GCState

    with open(path, "rb") as f:
        blob = pickle.load(f)
    variables = flax.serialization.from_bytes(
        codec.variables, blob["params"]
    )
    # re-wrap: the codec's jitted closures capture the variables at
    # construction time
    codec = type(codec)(codec.module, variables)
    if "eb_state" in blob:
        e = blob["eb_state"]
        codec.eb_state = EBState(
            table=CdfTable(e["cdf"], e["cdf_length"], e["offset"]),
            medians=np.asarray(e["medians"]),
        )
    if "gc_state" in blob:
        g = blob["gc_state"]
        codec.gc_state = GCState(
            table=CdfTable(g["cdf"], g["cdf_length"], g["offset"]),
            scale_table=np.asarray(g["scale_table"]),
            gc=GaussianConditional(),
        )
    if "hp_states" in blob:
        codec.update(force=True)  # build sub-states, then adopt tables
        for which, s in blob["hp_states"].items():
            hp = codec.hp_states[which]
            e, g = s["eb"], s["gc"]
            hp.eb_state = EBState(
                table=CdfTable(e["cdf"], e["cdf_length"], e["offset"]),
                medians=np.asarray(e["medians"]),
            )
            hp.gc_state = GCState(
                table=CdfTable(g["cdf"], g["cdf_length"], g["offset"]),
                scale_table=np.asarray(g["scale_table"]),
                gc=GaussianConditional(),
            )
            hp._rebuild()
    return codec
