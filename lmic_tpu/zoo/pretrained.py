"""Cross-framework weight import: reference PyTorch checkpoints -> lmic_tpu.

The reference distributes trained CompressAI-format PyTorch checkpoints
(compressai/zoo/pretrained.py, compressai/zoo/image.py:62-187). This module
converts such a `state_dict` into this framework's flax param tree so
reference-trained models run (and code bitstreams) here unchanged.

Layout rules (torch -> flax/NHWC):
- Conv2d weight OIHW -> HWIO: transpose(2, 3, 1, 0).
- ConvTranspose2d weight (I, O, kh, kw): our Deconv is an input-dilated
  CORRELATION (layers.py Deconv), while torch's transposed conv applies the
  kernel spatially flipped -> transpose(2, 3, 0, 1) then flip both spatial
  axes.
- GDN beta (C,) / gamma (C_out, C_in): stored in the same sqrt-reparam
  space on both sides -> direct copy.
- EntropyBottleneck `_matrix{k}/_bias{k}/_factor{k}/quantiles`: identical
  (C, a, b) shapes -> direct copy to `matrix_{k}/bias_{k}/factor_{k}`.
- MaskedConv2d: both sides apply the causal mask at call time -> plain
  OIHW -> HWIO on the raw weight; the `.mask` buffer is dropped.
- Coder-state buffers (`_quantized_cdf`, `_offset`, `_cdf_length`,
  `scale_table`, bound constants) are NOT parameters here: call
  `codec.update(force=True)` (or load a deployment checkpoint) after import.

Key renaming mirrors the reference's `load_pretrained`
(compressai/zoo/pretrained.py:36-64): strip `module.` (DataParallel) and
rename ParameterList-era keys (`...matrices.{k}` -> `..._matrix{k}`, same
for biases/factors).
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

__all__ = [
    "rename_reference_keys",
    "load_torch_state_dict",
    "import_reference_state_dict",
    "import_reference_coding_state",
    "load_reference_checkpoint",
]


def _np(t) -> np.ndarray:
    """torch.Tensor | np.ndarray -> float32/raw numpy (host)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def rename_reference_keys(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Reference `load_pretrained` semantics (zoo/pretrained.py:35-57):
    strip `module.` (DataParallel), rename ParameterList-era keys
    (`._matrices.{k}` -> `._matrix{k}`, same for `_biases`/`_factors` —
    the optional-underscore pattern also accepts the un-prefixed spelling),
    and `downsample` -> `skip` for old ResidualBlockWithStride
    checkpoints."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if ".downsample." in k:
            k = k.replace("downsample", "skip")
        k = re.sub(r"(.*)\._?matrices\.(\d+)$", r"\1._matrix\2", k)
        k = re.sub(r"(.*)\._?biases\.(\d+)$", r"\1._bias\2", k)
        k = re.sub(r"(.*)\._?factors\.(\d+)$", r"\1._factor\2", k)
        out[k] = v
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference .pth(.tar) checkpoint into {name: numpy}. Accepts
    either a bare state_dict or a training checkpoint with a 'state_dict'
    entry (reference examples/train.py:276-282)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    return {k: _np(v) for k, v in rename_reference_keys(blob).items()}


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """Conv2d OIHW -> HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def _deconv_kernel(w: np.ndarray) -> np.ndarray:
    """ConvTranspose2d (I, O, kh, kw) -> our input-dilated correlation
    kernel (kh, kw, I, O), spatially flipped."""
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])


def _seq_to_layers(sd: Dict[str, np.ndarray], prefix: str,
                   deconv_indices=(), conv_name: str = "Conv_0"):
    """Convert a torch nn.Sequential subtree `{prefix}.{i}.*` into our
    `layers_{i}` dict: convs/deconvs -> {conv_name: {kernel, bias}},
    GDN beta/gamma -> direct."""
    layers: Dict[str, Any] = {}
    for key, v in sd.items():
        if not key.startswith(prefix + "."):
            continue
        rest = key[len(prefix) + 1:]
        parts = rest.split(".")
        idx = int(parts[0])
        name = ".".join(parts[1:])
        slot = layers.setdefault(f"layers_{idx}", {})
        if name == "weight":
            k = (_deconv_kernel(v) if idx in deconv_indices
                 else _conv_kernel(v))
            slot.setdefault(conv_name, {})["kernel"] = k
        elif name == "bias":
            slot.setdefault(conv_name, {})["bias"] = v.astype(np.float32)
        elif name in ("beta", "gamma"):
            slot[name] = v.astype(np.float32)
        # reparam pedestals / lower bounds are constants -> dropped
    return layers


def _entropy_bottleneck(sd: Dict[str, np.ndarray],
                        prefix: str = "entropy_bottleneck"):
    eb: Dict[str, np.ndarray] = {}
    pat = re.compile(
        re.escape(prefix) + r"\._(matrix|bias|factor)(\d+)$"
    )
    for key, v in sd.items():
        m = pat.match(key)
        if m:
            eb[f"{m.group(1)}_{m.group(2)}"] = v.astype(np.float32)
        elif key == f"{prefix}.quantiles":
            eb["quantiles"] = v.astype(np.float32)
    return eb


# -- per-architecture importers ----------------------------------------------

def _import_factorized(sd):
    return {
        "entropy_bottleneck": _entropy_bottleneck(sd),
        "g_a_net": _seq_to_layers(sd, "g_a"),
        "g_s_net": _seq_to_layers(sd, "g_s", deconv_indices=(0, 2, 4, 6)),
    }


def _import_scale_hyperprior(sd):
    p = _import_factorized(sd)
    p["h_a_net"] = _seq_to_layers(sd, "h_a")
    # h_s: deconv, deconv, conv3x3 (reference google.py:252-259 / :371-379)
    p["h_s_net"] = _seq_to_layers(sd, "h_s", deconv_indices=(0, 2))
    return p


def _import_mean_scale(sd):
    return _import_scale_hyperprior(sd)


def _import_joint(sd):
    p = _import_scale_hyperprior(sd)
    p["entropy_parameters_net"] = _seq_to_layers(sd, "entropy_parameters")
    p["context_prediction"] = {
        "kernel": _conv_kernel(sd["context_prediction.weight"]),
        "bias": sd["context_prediction.bias"].astype(np.float32),
    }
    return p


# -- cheng2020: residual/attention block subtree converters -------------------
#
# Submodule name correspondences (torch module field -> our flax auto-name):
#   ResidualBlockWithStride: conv1->Conv_0, conv2->Conv_1, gdn->GDN_0,
#     skip->Conv_2                              (layers.py:244-260)
#   ResidualBlock: conv1->Conv_0, conv2->Conv_1 (+skip->Conv_2 if C changes)
#   ResidualBlockUpsample: subpel_conv->SubpelConv3x3_0, conv->Conv_0,
#     igdn->GDN_0, upsample->SubpelConv3x3_1    (layers.py:262-276)
#   AttentionBlock: conv_a.{j}-> _ResidualUnit_{j}, conv_b.{j} ->
#     _ResidualUnit_{3+j}, conv_b.3->Conv_0; each ResidualUnit's
#     conv.{0,2,4} -> Conv_{0,1,2}              (layers.py:295-322)


def _wb(sd, base):
    return {
        "kernel": _conv_kernel(sd[f"{base}.weight"]),
        "bias": sd[f"{base}.bias"].astype(np.float32),
    }


def _gdn(sd, base):
    return {
        "beta": sd[f"{base}.beta"].astype(np.float32),
        "gamma": sd[f"{base}.gamma"].astype(np.float32),
    }


def _block_rbs(sd, p):
    out = {
        "Conv_0": {"Conv_0": _wb(sd, f"{p}.conv1")},
        "Conv_1": {"Conv_0": _wb(sd, f"{p}.conv2")},
        "GDN_0": _gdn(sd, f"{p}.gdn"),
    }
    if f"{p}.skip.weight" in sd:
        out["Conv_2"] = {"Conv_0": _wb(sd, f"{p}.skip")}
    return out


def _block_rb(sd, p):
    out = {
        "Conv_0": {"Conv_0": _wb(sd, f"{p}.conv1")},
        "Conv_1": {"Conv_0": _wb(sd, f"{p}.conv2")},
    }
    if f"{p}.skip.weight" in sd:
        out["Conv_2"] = {"Conv_0": _wb(sd, f"{p}.skip")}
    return out


def _block_rbu(sd, p):
    return {
        "SubpelConv3x3_0": {"Conv_0": {"Conv_0": _wb(sd, f"{p}.subpel_conv.0")}},
        "Conv_0": {"Conv_0": _wb(sd, f"{p}.conv")},
        "GDN_0": _gdn(sd, f"{p}.igdn"),
        "SubpelConv3x3_1": {"Conv_0": {"Conv_0": _wb(sd, f"{p}.upsample.0")}},
    }


def _block_attn(sd, p):
    out = {}
    for j in range(3):
        out[f"_ResidualUnit_{j}"] = {
            "Conv_0": {"Conv_0": _wb(sd, f"{p}.conv_a.{j}.conv.0")},
            "Conv_1": {"Conv_0": _wb(sd, f"{p}.conv_a.{j}.conv.2")},
            "Conv_2": {"Conv_0": _wb(sd, f"{p}.conv_a.{j}.conv.4")},
        }
        out[f"_ResidualUnit_{3 + j}"] = {
            "Conv_0": {"Conv_0": _wb(sd, f"{p}.conv_b.{j}.conv.0")},
            "Conv_1": {"Conv_0": _wb(sd, f"{p}.conv_b.{j}.conv.2")},
            "Conv_2": {"Conv_0": _wb(sd, f"{p}.conv_b.{j}.conv.4")},
        }
    out["Conv_0"] = {"Conv_0": _wb(sd, f"{p}.conv_b.3")}
    return out


def _block_conv(sd, p):
    return {"Conv_0": _wb(sd, p)}


def _block_subpel(sd, p):
    # subpel_conv3x3 = Sequential(conv, PixelShuffle) -> inner conv at `.0`
    return {"Conv_0": {"Conv_0": _wb(sd, f"{p}.0")}}


_CHENG_BLOCK = {
    "rbs": _block_rbs,
    "rb": _block_rb,
    "rbu": _block_rbu,
    "attn": _block_attn,
    "conv": _block_conv,
    "subpel": _block_subpel,
}


def _cheng_seq(sd, prefix, schedule):
    return {
        f"layers_{i}": _CHENG_BLOCK[kind](sd, f"{prefix}.{i}")
        for i, kind in enumerate(schedule)
    }


def _import_cheng(sd, attention: bool):
    if attention:
        g_a = ["rbs", "rb", "rbs", "attn", "rb", "rbs", "rb", "conv", "attn"]
        g_s = ["attn", "rb", "rbu", "rb", "rbu", "attn", "rb", "rbu", "rb",
               "subpel"]
    else:
        g_a = ["rbs", "rb", "rbs", "rb", "rbs", "rb", "conv"]
        g_s = ["rb", "rbu", "rb", "rbu", "rb", "rbu", "rb", "subpel"]
    p = {
        "entropy_bottleneck": _entropy_bottleneck(sd),
        "g_a_net": _cheng_seq(sd, "g_a", g_a),
        "g_s_net": _cheng_seq(sd, "g_s", g_s),
        # h_a: 5 conv3x3 with leaky relus between (waseda.py:49-158)
        "h_a_net": {
            f"layers_{i}": _block_conv(sd, f"h_a.{i}")
            for i in (0, 2, 4, 6, 8)
        },
        # h_s: conv, subpel, conv, subpel, conv
        "h_s_net": {
            "layers_0": _block_conv(sd, "h_s.0"),
            "layers_2": _block_subpel(sd, "h_s.2"),
            "layers_4": _block_conv(sd, "h_s.4"),
            "layers_6": _block_subpel(sd, "h_s.6"),
            "layers_8": _block_conv(sd, "h_s.8"),
        },
        "entropy_parameters_net": _seq_to_layers(sd, "entropy_parameters"),
        "context_prediction": {
            "kernel": _conv_kernel(sd["context_prediction.weight"]),
            "bias": sd["context_prediction.bias"].astype(np.float32),
        },
    }
    return p


_IMPORTERS = {
    "bmshj2018-factorized": _import_factorized,
    "bmshj2018-hyperprior": _import_scale_hyperprior,
    "mbt2018-mean": _import_mean_scale,
    "mbt2018": _import_joint,
    "cheng2020-anchor": lambda sd: _import_cheng(sd, attention=False),
    "cheng2020-attn": lambda sd: _import_cheng(sd, attention=True),
}


def import_reference_state_dict(arch: str, state_dict: Dict[str, Any],
                                variables=None):
    """Convert a reference state_dict (names already normalized via
    rename_reference_keys, torch tensors or numpy) into flax `variables`.

    If `variables` (a template from module.init) is given, the result is
    validated leaf-by-leaf against its shapes.
    """
    sd = {k: _np(v) for k, v in rename_reference_keys(state_dict).items()}
    if arch not in _IMPORTERS:
        raise ValueError(
            f"no reference importer for '{arch}' "
            f"(available: {sorted(_IMPORTERS)})"
        )
    params = _IMPORTERS[arch](sd)
    if variables is not None:
        import jax

        ref_leaves = jax.tree_util.tree_flatten_with_path(
            variables["params"]
        )[0]
        got = dict(
            jax.tree_util.tree_flatten_with_path(params)[0]
        )
        for path, leaf in ref_leaves:
            if path not in got:
                raise KeyError(
                    f"missing imported param {jax.tree_util.keystr(path)}"
                )
            if got[path].shape != leaf.shape:
                raise ValueError(
                    f"shape mismatch at {jax.tree_util.keystr(path)}: "
                    f"imported {got[path].shape} vs model {leaf.shape}"
                )
        if len(got) != len(ref_leaves):
            extra = set(got) - {p for p, _ in ref_leaves}
            raise KeyError(
                "imported params not in model: "
                + ", ".join(jax.tree_util.keystr(p) for p in extra)
            )
    return {"params": params}


_FAST_PATH_ATTRS = (
    "_enc_u8", "_enc_u8_packed", "_dec_u8", "_analyze_u8",
    "_params_from_zsym", "_ysym", "_synth_u8", "_pack_enc",
    "_analyze_u8_ar", "_g_s_u8", "_hyper_params_scan",
)


def import_reference_coding_state(state_dict: Dict[str, Any], codec,
                                  eb_prefix: str = "entropy_bottleneck",
                                  gc_prefix: str = "gaussian_conditional",
                                  ) -> bool:
    """Adopt the BAKED integer coding tables from a reference checkpoint.

    The reference's `update_model` flow stores `_quantized_cdf/_offset/
    _cdf_length` (+ `scale_table`) buffers in deployment checkpoints and
    `from_state_dict` reloads them (models/utils.py:62-125). Recomputing the
    tables here via our own `update()` reproduces them only up to float
    ulps (torch's erfc != XLA's erfc in the last bit, so ~0.5% of quantized
    CDF entries come out off by one) — adopting the reference buffers makes
    bitstreams byte-identical across frameworks by construction.

    Returns True when baked tables were found and installed; False when the
    checkpoint has none (then call `codec.update(force=True)`)."""
    from lmic_tpu.entropy.coder import CdfTable
    from lmic_tpu.entropy.entropy_models import (
        EBState, GaussianConditional, GCState,
    )

    def buf(name):
        v = state_dict.get(name)
        if v is None:
            return None
        v = _np(v)
        return v if v.size else None

    eb_cdf = buf(f"{eb_prefix}._quantized_cdf")
    quantiles = buf(f"{eb_prefix}.quantiles")
    eb_len = buf(f"{eb_prefix}._cdf_length")
    eb_off = buf(f"{eb_prefix}._offset")
    if eb_cdf is None or quantiles is None or eb_len is None or eb_off is None:
        # a checkpoint can carry _quantized_cdf with empty companion
        # buffers (a non-deployment save mid-update) — treat it as having
        # no baked tables rather than crashing on None.astype
        return False
    gc_cdf = buf(f"{gc_prefix}._quantized_cdf")
    gc_len = buf(f"{gc_prefix}._cdf_length")
    gc_off = buf(f"{gc_prefix}._offset")
    gc_scales = buf(f"{gc_prefix}.scale_table")
    if gc_cdf is not None and (gc_len is None or gc_off is None
                               or gc_scales is None):
        return False
    if gc_cdf is None:
        # a codec with a gaussian-conditional stage is only partially
        # importable from this checkpoint: reporting success would leave
        # gc_state=None and fail later with a misleading 'Uninitialized
        # CDFs' — tell the caller to fall back to update(force=True).
        # Checked BEFORE any mutation so failure is side-effect-free (no
        # half-imported eb_state paired with stale fast-path jits).
        from lmic_tpu.models.codec import FactorizedPriorCodec

        if not isinstance(codec, FactorizedPriorCodec):
            return False
    codec.eb_state = EBState(
        table=CdfTable(
            eb_cdf.astype(np.int32),
            eb_len.astype(np.int32),
            eb_off.reshape(-1).astype(np.int32),
        ),
        medians=quantiles[:, 0, 1].astype(np.float32),
    )
    if gc_cdf is not None:
        codec.gc_state = GCState(
            table=CdfTable(
                gc_cdf.astype(np.int32),
                gc_len.astype(np.int32),
                gc_off.reshape(-1).astype(np.int32),
            ),
            scale_table=gc_scales.astype(np.float32),
            gc=GaussianConditional(),
        )
    # captured-state invalidation, as update(force=True) does
    for name in _FAST_PATH_ATTRS:
        if hasattr(codec, name):
            delattr(codec, name)
    if hasattr(codec, "_encode_scan_cache"):
        codec._encode_scan_cache.clear()
    return True


def import_reference_video_coding_state(state_dict: Dict[str, Any],
                                        codec) -> bool:
    """ssf2020 analogue of import_reference_coding_state: adopt the baked
    tables of all three hyperprior sub-codecs (img/motion/res —
    video/google.py:200-208) so deployed video bitstreams stay
    byte-compatible with the reference. Returns False when the checkpoint
    carries no baked buffers."""
    if "img_hyperprior.entropy_bottleneck._quantized_cdf" not in state_dict:
        return False
    codec.update(force=True)  # build the sub-states and their jits
    ok = True
    for which in ("img", "motion", "res"):
        hp = codec.hp_states[which]
        ok = import_reference_coding_state(
            state_dict, hp,
            eb_prefix=f"{which}_hyperprior.entropy_bottleneck",
            gc_prefix=f"{which}_hyperprior.gaussian_conditional",
        ) and ok
        hp._rebuild()  # the fast-path jits capture medians/scale table
    return ok


def load_reference_checkpoint(arch: str, path: str, quality: int = 1,
                              channel: int = 3, input_size=(256, 256),
                              update: bool = True, **kwargs):
    """One-call path from a reference .pth(.tar) file to a ready codec:
    read + rename + convert layouts, wrap in the architecture's codec class,
    and (by default) bake fresh integer coding tables."""
    import jax

    from lmic_tpu import zoo

    if arch == "ssf2020":
        codec = zoo.create_video_model(
            arch, quality, key=jax.random.key(0), input_size=input_size,
            **kwargs,
        )
    else:
        codec = zoo.create_model(
            arch, quality, key=jax.random.key(0), channel=channel,
            input_size=input_size, **kwargs,
        )
    sd = load_torch_state_dict(path)
    variables = import_reference_state_dict(arch, sd, codec.variables)
    codec = type(codec)(codec.module, variables)
    if update:
        # prefer the checkpoint's own baked tables (byte-exact interop with
        # reference bitstreams); recompute only when they're absent
        adopt = (import_reference_video_coding_state if arch == "ssf2020"
                 else import_reference_coding_state)
        if not adopt(sd, codec):
            codec.update(force=True)
    return codec


# -- ssf2020 video -------------------------------------------------------------

def _ssf_codec_seq(sd, prefix, kind, n_bias_ch=None):
    """img/res/motion encoder/decoder: torch Sequential conv/deconv at even
    indices (video/google.py:75-196) -> our Conv_{j}/Deconv_{j} stacks."""
    out = {}
    for j, i in enumerate((0, 2, 4, 6)):
        w = sd[f"{prefix}.{i}.weight"]
        if kind == "conv":
            out[f"Conv_{j}"] = {"Conv_0": {
                "kernel": _conv_kernel(w),
                "bias": sd[f"{prefix}.{i}.bias"].astype(np.float32),
            }}
        else:
            out[f"Deconv_{j}"] = {"Conv_0": {
                "kernel": _deconv_kernel(w),
                "bias": sd[f"{prefix}.{i}.bias"].astype(np.float32),
            }}
    return out


def _ssf_hyperprior(sd, prefix):
    """Hyperprior sub-codec (video/google.py:121-196): plain conv/deconv
    stacks plus the QReLU'd scale decoder whose layers are named fields
    (`deconv1..3`) rather than Sequential indices."""
    def cv(base, deconv=False):
        w = sd[f"{base}.weight"]
        return {"Conv_0": {
            "kernel": _deconv_kernel(w) if deconv else _conv_kernel(w),
            "bias": sd[f"{base}.bias"].astype(np.float32),
        }}

    return {
        "entropy_bottleneck": _entropy_bottleneck(
            sd, f"{prefix}.entropy_bottleneck"
        ),
        "hyper_encoder": {
            f"Conv_{j}": cv(f"{prefix}.hyper_encoder.{i}")
            for j, i in enumerate((0, 2, 4))
        },
        "hyper_decoder_mean": {
            f"Deconv_{j}": cv(f"{prefix}.hyper_decoder_mean.{i}", deconv=True)
            for j, i in enumerate((0, 2, 4))
        },
        "hyper_decoder_scale": {
            f"Deconv_{j}": cv(
                f"{prefix}.hyper_decoder_scale.deconv{i}", deconv=True
            )
            for j, i in enumerate((1, 2, 3))
        },
    }


def _import_ssf2020(sd):
    p = {}
    for name in ("img", "res", "motion"):
        p[f"{name}_encoder"] = _ssf_codec_seq(sd, f"{name}_encoder", "conv")
        p[f"{name}_decoder"] = _ssf_codec_seq(sd, f"{name}_decoder", "deconv")
        p[f"{name}_hyperprior"] = _ssf_hyperprior(sd, f"{name}_hyperprior")
    return p


_IMPORTERS["ssf2020"] = _import_ssf2020


# -- RGB-T paper models: Guided_compresser / Master_compresser -----------------

def _dense(sd, base):
    """torch Linear (out, in) -> flax Dense kernel (in, out)."""
    return {
        "kernel": np.ascontiguousarray(sd[f"{base}.weight"].T),
        "bias": sd[f"{base}.bias"].astype(np.float32),
    }


def _layernorm(sd, base):
    return {
        "scale": sd[f"{base}.weight"].astype(np.float32),
        "bias": sd[f"{base}.bias"].astype(np.float32),
    }


def _resblock64(sd, base):
    """master.py:29-60 ResidualBlock: conv1/conv2 (+1x1 skip iff C changes)
    -> our _ResBlock64 Conv_0/Conv_1 (+Conv_2)."""
    out = {
        "Conv_0": {"Conv_0": _wb(sd, f"{base}.conv1")},
        "Conv_1": {"Conv_0": _wb(sd, f"{base}.conv2")},
    }
    if f"{base}.skip.weight" in sd:
        out["Conv_2"] = {"Conv_0": _wb(sd, f"{base}.skip")}
    return out


def _feature_encoder(sd, base):
    """master.py:68-84 Feature_encoder: conv1 + 3 ResidualBlocks."""
    return {
        "Conv_0": {"Conv_0": _wb(sd, f"{base}.conv1")},
        "_ResBlock64_0": _resblock64(sd, f"{base}.resblock1"),
        "_ResBlock64_1": _resblock64(sd, f"{base}.resblock2"),
        "_ResBlock64_2": _resblock64(sd, f"{base}.resblock3"),
    }


def _feature_decoder(sd, base):
    """master.py:99-118 Feature_decoder: 3 ResidualBlocks + 1x1 shortcut
    conv + final transposed conv."""
    w = sd[f"{base}.deconv1.weight"]
    return {
        "_ResBlock64_0": _resblock64(sd, f"{base}.resblock1"),
        "_ResBlock64_1": _resblock64(sd, f"{base}.resblock2"),
        "_ResBlock64_2": _resblock64(sd, f"{base}.resblock3"),
        "Conv_0": {"Conv_0": _wb(sd, f"{base}.conv")},
        "Deconv_0": {"Conv_0": {
            "kernel": _deconv_kernel(w),
            "bias": sd[f"{base}.deconv1.bias"].astype(np.float32),
        }},
    }


def _channel_aligner(sd, base="ch_aligner"):
    """master.py:158-210 Channel_aligner: 4-conv shared trunk + beta/gamma
    heads (conv5 -> beta from master feature, conv6 -> gamma from guide)."""
    return {
        f"Conv_{i}": {"Conv_0": _wb(sd, f"{base}.conv{i + 1}")}
        for i in range(6)
    }


def _swin_block(sd, base):
    """master.py:572-706 SwinTransformerBlock (cross-attention variant)."""
    return {
        "norm1": _layernorm(sd, f"{base}.norm1"),
        "norm2": _layernorm(sd, f"{base}.norm2"),
        "WindowCrossAttention_0": {
            "qkv1": _dense(sd, f"{base}.attn.qkv1"),
            "qkv2": _dense(sd, f"{base}.attn.qkv2"),
            "proj": _dense(sd, f"{base}.attn.proj"),
            "relative_position_bias_table": sd[
                f"{base}.attn.relative_position_bias_table"
            ].astype(np.float32),
        },
        "Dense_0": _dense(sd, f"{base}.mlp.fc1"),
        "Dense_1": _dense(sd, f"{base}.mlp.fc2"),
    }


def _spatial_aligner(sd, base):
    """master.py:708-742 Spatial_aligner: 2 patch embeds, 2 Swin cross
    blocks (regular + shifted), transposed-conv recovery."""
    rw = sd[f"{base}.recovery.weight"]
    return {
        "patch_embed1": _wb(sd, f"{base}.patch_embeding1.proj"),
        "patch_embed2": _wb(sd, f"{base}.patch_embeding2.proj"),
        "block_0": _swin_block(sd, f"{base}.blocks.0"),
        "block_1": _swin_block(sd, f"{base}.blocks.1"),
        "recovery": {"Conv_0": {
            "kernel": _deconv_kernel(rw),
            "bias": sd[f"{base}.recovery.bias"].astype(np.float32),
        }},
    }


def _import_guided(sd):
    """Guided_compresser (master.py:1167-1464): mbt2018 machinery with the
    hidden-tap Encoder1/Decoder1 (named conv/gdn fields) instead of the
    unused inherited g_a/g_s Sequentials."""
    def dcv(base):
        w = sd[f"{base}.weight"]
        return {"Conv_0": {
            "kernel": _deconv_kernel(w),
            "bias": sd[f"{base}.bias"].astype(np.float32),
        }}

    p = {
        "entropy_bottleneck": _entropy_bottleneck(sd),
        "g_a_net": {
            **{f"Conv_{i}": {"Conv_0": _wb(sd, f"enc1.g_a_conv{i + 1}")}
               for i in range(4)},
            **{f"GDN_{i}": _gdn(sd, f"enc1.g_a_gdn{i + 1}")
               for i in range(3)},
        },
        "g_s_net": {
            **{f"Deconv_{i}": dcv(f"dec1.g_s_conv{i + 1}")
               for i in range(4)},
            **{f"GDN_{i}": _gdn(sd, f"dec1.g_s_gdn{i + 1}")
               for i in range(3)},
        },
        "h_a_net": _seq_to_layers(sd, "h_a"),
        "h_s_net": _seq_to_layers(sd, "h_s", deconv_indices=(0, 2)),
        "entropy_parameters_net": _seq_to_layers(sd, "entropy_parameters"),
        "context_prediction": {
            "kernel": _conv_kernel(sd["context_prediction.weight"]),
            "bias": sd["context_prediction.bias"].astype(np.float32),
        },
    }
    return p


def _import_master(sd):
    """Master_compresser (master.py:839-1161)."""
    def dcv(base):
        w = sd[f"{base}.weight"]
        return {"Conv_0": {
            "kernel": _deconv_kernel(w),
            "bias": sd[f"{base}.bias"].astype(np.float32),
        }}

    g_s = {
        **{f"Deconv_{i}": dcv(f"decoder.g_s_conv{i + 1}") for i in range(4)},
        **{f"GDN_{i}": _gdn(sd, f"decoder.g_s_gdn{i + 1}") for i in range(3)},
        **{f"sp_aligner{i + 1}": _spatial_aligner(
            sd, f"decoder.sp_aligner{i + 1}") for i in range(3)},
    }
    # guide-hidden downsample convs exist only in the channel=1 geometry
    # (guide at 2x master resolution); checked against the checkpoint
    if "decoder.downsample1.weight" in sd:
        g_s.update({
            f"Conv_{i}": {"Conv_0": _wb(sd, f"decoder.downsample{i + 1}")}
            for i in range(3)
        })
    return {
        "entropy_bottleneck": _entropy_bottleneck(sd),
        "fencoder1": _feature_encoder(sd, "fencoder1"),
        "fencoder2": _feature_encoder(sd, "fencoder2"),
        "fdecoder": _feature_decoder(sd, "fdecoder"),
        "ch_aligner": _channel_aligner(sd),
        "g_a_net": _seq_to_layers(sd, "g_a"),
        "g_s_net": g_s,
        "h_a_net": _seq_to_layers(sd, "h_a"),
        "h_s_net": _seq_to_layers(sd, "h_s", deconv_indices=(0, 2)),
        "entropy_parameters_net": _seq_to_layers(sd, "entropy_parameters"),
        "context_prediction": {
            "kernel": _conv_kernel(sd["context_prediction.weight"]),
            "bias": sd["context_prediction.bias"].astype(np.float32),
        },
    }


_IMPORTERS["guided"] = _import_guided
_IMPORTERS["master"] = _import_master


# -- RGB-T `_R` / `_D` variants ------------------------------------------------
#
# Reference: google.py:746-1423 (JointAutoregressiveHierarchicalPriors_R/_D)
# and waseda.py:162-694 (Cheng2020Anchor/Attention_R/_D). The torch
# state_dicts carry unused inherited g_a/g_s Sequentials (the classes build
# their own enc1/dec1 or pic2_*/fused transforms); those keys are simply
# not mapped.

def _deconv_wb(sd, base):
    return {"Conv_0": {
        "kernel": _deconv_kernel(sd[f"{base}.weight"]),
        "bias": sd[f"{base}.bias"].astype(np.float32),
    }}


def _esa(sd, p):
    """ESA (google.py:1432-1459) -> layers.ESA call-order auto-names:
    conv1, conv2 (raw nn.Conv), conv_max, conv3, conv3_, conv_f, conv4."""
    return {
        "Conv_0": {"Conv_0": _wb(sd, f"{p}.conv1")},
        "Conv_1": _wb(sd, f"{p}.conv2"),
        "Conv_2": {"Conv_0": _wb(sd, f"{p}.conv_max")},
        "Conv_3": {"Conv_0": _wb(sd, f"{p}.conv3")},
        "Conv_4": {"Conv_0": _wb(sd, f"{p}.conv3_")},
        "Conv_5": {"Conv_0": _wb(sd, f"{p}.conv_f")},
        "Conv_6": {"Conv_0": _wb(sd, f"{p}.conv4")},
    }


def _edge_fuse(sd, eg_x, eg_h, tran, attn):
    """One _EdgeFuse level: eg_ext{eg_x} on the master stream, eg_ext{eg_h}
    on the guide hidden map, tran_conv{tran} fusion, attention{attn} ESA
    (forward wiring at google.py:1158-1242)."""
    return {
        "Conv_0": {"Conv_0": _wb(sd, f"eg_ext{eg_x}.0")},
        "Conv_1": {"Conv_0": _wb(sd, f"eg_ext{eg_h}.0")},
        "Conv_2": {"Conv_0": _wb(sd, f"tran_conv{tran}")},
        "ESA_0": _esa(sd, f"attention{attn}"),
    }


def _cheng_h_nets(sd):
    """The cheng-style hyper pair shared by all waseda variants
    (waseda.py:179-200 / :489-510)."""
    return {
        "h_a_net": {
            f"layers_{i}": _block_conv(sd, f"h_a.{i}")
            for i in (0, 2, 4, 6, 8)
        },
        "h_s_net": {
            "layers_0": _block_conv(sd, "h_s.0"),
            "layers_2": _block_subpel(sd, "h_s.2"),
            "layers_4": _block_conv(sd, "h_s.4"),
            "layers_6": _block_subpel(sd, "h_s.6"),
            "layers_8": _block_conv(sd, "h_s.8"),
        },
    }


def _import_jahp_d(sd):
    """JointAutoregressiveHierarchicalPriors_D (google.py:1006-1423)."""
    p = {
        "entropy_bottleneck": _entropy_bottleneck(sd),
        "h_a_net": _seq_to_layers(sd, "h_a"),
        "h_s_net": _seq_to_layers(sd, "h_s", deconv_indices=(0, 2)),
        "entropy_parameters_net": _seq_to_layers(sd, "entropy_parameters"),
        "context_prediction": {
            "kernel": _conv_kernel(sd["context_prediction.weight"]),
            "bias": sd["context_prediction.bias"].astype(np.float32),
        },
    }
    for i in range(4):
        p[f"pic2_ga_convs_{i}"] = {"Conv_0": _wb(sd, f"pic2_g_a_conv{i + 1}")}
        p[f"pic2_gs_convs_{i}"] = _deconv_wb(sd, f"pic2_g_s_conv{i + 1}")
    for i in range(3):
        p[f"pic2_ga_gdns_{i}"] = _gdn(sd, f"pic2_g_a_gdn{i + 1}")
        p[f"pic2_gs_gdns_{i}"] = _gdn(sd, f"pic2_g_s_gdn{i + 1}")
        p[f"enc_fuse_{i}"] = _edge_fuse(
            sd, 2 * i + 1, 2 * i + 2, i + 1, i + 1
        )
        p[f"dec_fuse_{i}"] = _edge_fuse(
            sd, 2 * i + 7, 2 * i + 8, i + 4, i + 4
        )
    return p


def _import_cheng_anchor_r(sd):
    """Cheng2020Anchor_R (waseda.py:162-209): JAHP_R's hidden-tap GDN
    transforms (enc1/dec1) with the cheng hyper pair."""
    p = _import_guided(sd)
    p.update(_cheng_h_nets(sd))
    return p


def _import_cheng_attn_r(sd):
    """Cheng2020Attention_R (waseda.py:212-261): Encoder_cheng/Decoder_cheng
    hidden-tap transforms (waseda.py:409-460) + cheng hyper pair."""
    p = _import_cheng_anchor_r(sd)
    p["g_a_net"] = {
        "ResidualBlockWithStride_0": _block_rbs(sd, "enc.res_stride1"),
        "ResidualBlock_0": _block_rb(sd, "enc.res1"),
        "ResidualBlockWithStride_1": _block_rbs(sd, "enc.res_stride2"),
        "AttentionBlock_0": _block_attn(sd, "enc.atten1"),
        "ResidualBlock_1": _block_rb(sd, "enc.res2"),
        "ResidualBlockWithStride_2": _block_rbs(sd, "enc.res_stride3"),
        "ResidualBlock_2": _block_rb(sd, "enc.res3"),
        "Conv_0": {"Conv_0": _wb(sd, "enc.conv")},
        "AttentionBlock_1": _block_attn(sd, "enc.atten2"),
    }
    p["g_s_net"] = {
        "AttentionBlock_0": _block_attn(sd, "dec.atten1"),
        "ResidualBlock_0": _block_rb(sd, "dec.res1"),
        "ResidualBlockUpsample_0": _block_rbu(sd, "dec.res_stride1"),
        "ResidualBlock_1": _block_rb(sd, "dec.res2"),
        "ResidualBlockUpsample_1": _block_rbu(sd, "dec.res_stride2"),
        "AttentionBlock_1": _block_attn(sd, "dec.atten2"),
        "ResidualBlock_2": _block_rb(sd, "dec.res3"),
        "ResidualBlockUpsample_2": _block_rbu(sd, "dec.res_stride3"),
        "ResidualBlock_3": _block_rb(sd, "dec.res4"),
        "SubpelConv3x3_0": _block_subpel(sd, "dec.conv"),
    }
    return p


def _import_cheng_anchor_d(sd):
    """Cheng2020Anchor_D (waseda.py:463-530): JAHP_D fused-GDN body with
    the cheng hyper pair."""
    p = _import_jahp_d(sd)
    p.update(_cheng_h_nets(sd))
    return p


def _import_cheng_attn_d(sd):
    """Cheng2020Attention_D (waseda.py:533-694): residual/attention fused
    transforms. The inherited pic2_* convs are unused by its forward."""
    p = {
        "entropy_bottleneck": _entropy_bottleneck(sd),
        "entropy_parameters_net": _seq_to_layers(sd, "entropy_parameters"),
        "context_prediction": {
            "kernel": _conv_kernel(sd["context_prediction.weight"]),
            "bias": sd["context_prediction.bias"].astype(np.float32),
        },
        "ga_blocks_pre_0": _block_rbs(sd, "g_a_rbs1"),
        "g_a_rb1": _block_rb(sd, "g_a_rb1"),
        "g_a_rbs2": _block_rbs(sd, "g_a_rbs2"),
        "g_a_att1": _block_attn(sd, "g_a_att1"),
        "g_a_rb2": _block_rb(sd, "g_a_rb2"),
        "g_a_rbs3": _block_rbs(sd, "g_a_rbs3"),
        "g_a_rb3": _block_rb(sd, "g_a_rb3"),
        "g_a_conv": {"Conv_0": _wb(sd, "g_a_conv")},
        "g_a_att2": _block_attn(sd, "g_a_att2"),
        "g_s_att1": _block_attn(sd, "g_s_att1"),
        "g_s_rb1": _block_rb(sd, "g_s_rb1"),
        "g_s_rbs1": _block_rbu(sd, "g_s_rbs1"),
        "g_s_rb2": _block_rb(sd, "g_s_rb2"),
        "g_s_rbs2": _block_rbu(sd, "g_s_rbs2"),
        "g_s_att2": _block_attn(sd, "g_s_att2"),
        "g_s_rb3": _block_rb(sd, "g_s_rb3"),
        "g_s_rbs3": _block_rbu(sd, "g_s_rbs3"),
        "g_s_rb4": _block_rb(sd, "g_s_rb4"),
        "g_s_conv": _block_subpel(sd, "g_s_conv"),
    }
    p.update(_cheng_h_nets(sd))
    for i in range(3):
        p[f"enc_fuse_{i}"] = _edge_fuse(
            sd, 2 * i + 1, 2 * i + 2, i + 1, i + 1
        )
        p[f"dec_fuse_{i}"] = _edge_fuse(
            sd, 2 * i + 7, 2 * i + 8, i + 4, i + 4
        )
    return p


_IMPORTERS["mbt2018_R"] = _import_guided
_IMPORTERS["mbt2018_D"] = _import_jahp_d
_IMPORTERS["cheng2020-anchor_R"] = _import_cheng_anchor_r
_IMPORTERS["cheng2020-attn_R"] = _import_cheng_attn_r
_IMPORTERS["cheng2020-anchor_D"] = _import_cheng_anchor_d
_IMPORTERS["cheng2020-attn_D"] = _import_cheng_attn_d
