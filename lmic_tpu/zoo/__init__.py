"""Model zoo: architecture registry, per-quality configs, constructors.

Mirrors the reference registry (compressai/zoo/image.py:189-246,
compressai/zoo/__init__.py:41-56). `create_model` builds the flax module,
initializes variables, and returns the host codec wrapper ready for
training or (after `update()`) coding.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lmic_tpu.models.codec import (
    CompressionCodec,
    FactorizedPriorCodec,
    HyperpriorCodec,
)
from lmic_tpu.models.image import (
    FactorizedPrior,
    MeanScaleHyperprior,
    ScaleHyperprior,
)
from lmic_tpu.models.joint import (
    JointARCodec,
    JointAutoregressiveHierarchicalPriors,
)
from lmic_tpu.models.cheng import Cheng2020Anchor, Cheng2020Attention
from lmic_tpu.models.video import ScaleSpaceFlow, ScaleSpaceFlowCodec
from lmic_tpu.models.rgbt import (
    GuidedCodec,
    GuidedCompresser,
    MasterCodec,
    MasterCompresser,
)
from lmic_tpu.models.rgbt_joint import (
    Cheng2020Anchor_D,
    Cheng2020Anchor_R,
    Cheng2020Attention_D,
    Cheng2020Attention_R,
    FusedARCodec,
    JointAutoregressiveHierarchicalPriors_D,
    JointAutoregressiveHierarchicalPriors_R,
)

# quality -> ctor args (reference zoo/image.py:189-246)
cfgs: Dict[str, Dict[int, Tuple[int, ...]]] = {
    # RGBT paper models: fixed N=M=192 across the lambda table
    # (examples/train.py:373-385)
    "guided": {q: (192, 192) for q in range(1, 8)},
    "master": {q: (192, 192) for q in range(1, 8)},
    "bmshj2018-factorized": {
        **{q: (128, 192) for q in range(1, 6)},
        **{q: (192, 320) for q in range(6, 9)},
    },
    "bmshj2018-hyperprior": {
        **{q: (128, 192) for q in range(1, 6)},
        **{q: (192, 320) for q in range(6, 9)},
    },
    "mbt2018-mean": {
        **{q: (128, 192) for q in range(1, 5)},
        **{q: (192, 320) for q in range(5, 9)},
    },
    "mbt2018": {
        **{q: (192, 192) for q in range(1, 5)},
        **{q: (192, 320) for q in range(5, 9)},
    },
    "cheng2020-anchor": {
        **{q: (128,) for q in range(1, 4)},
        **{q: (192,) for q in range(4, 7)},
    },
    "cheng2020-attn": {
        **{q: (128,) for q in range(1, 4)},
        **{q: (192,) for q in range(4, 7)},
    },
    # RGB-T guide/dependent variants: the reference constructs them with
    # the class defaults N=M=192 (google.py:758, waseda.py:176) across the
    # lambda table, like the paper pair
    "mbt2018_R": {q: (192, 192) for q in range(1, 8)},
    "mbt2018_D": {q: (192, 192) for q in range(1, 8)},
    "cheng2020-anchor_R": {q: (192,) for q in range(1, 8)},
    "cheng2020-anchor_D": {q: (192,) for q in range(1, 8)},
    "cheng2020-attn_R": {q: (192,) for q in range(1, 8)},
    "cheng2020-attn_D": {q: (192,) for q in range(1, 8)},
}

# architecture -> (module class, codec wrapper class)
model_architectures: Dict[str, Tuple[Any, Any]] = {
    "bmshj2018-factorized": (FactorizedPrior, FactorizedPriorCodec),
    "bmshj2018-hyperprior": (ScaleHyperprior, HyperpriorCodec),
    "mbt2018-mean": (MeanScaleHyperprior, HyperpriorCodec),
    "mbt2018": (JointAutoregressiveHierarchicalPriors, JointARCodec),
    "cheng2020-anchor": (Cheng2020Anchor, JointARCodec),
    "cheng2020-attn": (Cheng2020Attention, JointARCodec),
    "guided": (GuidedCompresser, GuidedCodec),
    "master": (MasterCompresser, MasterCodec),
    "mbt2018_R": (JointAutoregressiveHierarchicalPriors_R, GuidedCodec),
    "mbt2018_D": (JointAutoregressiveHierarchicalPriors_D, FusedARCodec),
    "cheng2020-anchor_R": (Cheng2020Anchor_R, GuidedCodec),
    "cheng2020-anchor_D": (Cheng2020Anchor_D, FusedARCodec),
    "cheng2020-attn_R": (Cheng2020Attention_R, GuidedCodec),
    "cheng2020-attn_D": (Cheng2020Attention_D, FusedARCodec),
}


def register_architecture(name, module_cls, codec_cls):
    model_architectures[name] = (module_cls, codec_cls)


def make_module(architecture: str, quality: int, channel: int = 3, **kwargs):
    """Build the (uninitialized) flax module for an architecture/quality."""
    if architecture not in model_architectures:
        raise ValueError(f'Invalid architecture name "{architecture}"')
    if quality not in cfgs[architecture]:
        raise ValueError(f'Invalid quality value "{quality}"')
    args = cfgs[architecture][quality]
    module_cls, _ = model_architectures[architecture]
    # kwargs may override the quality table's widths (parity/testing)
    if len(args) == 2:
        N = kwargs.pop("N", args[0])
        M = kwargs.pop("M", args[1])
    else:
        # single-arg families (cheng2020*) use M = N (waseda.py:63)
        N = kwargs.pop("N", args[0])
        M = kwargs.pop("M", N)
    return module_cls(N=N, M=M, channel=channel, **kwargs)


def create_model(
    architecture: str,
    quality: int,
    key=None,
    channel: int = 3,
    input_size: Tuple[int, int] = (256, 256),
    variables=None,
    **kwargs,
) -> CompressionCodec:
    """Construct module + variables and wrap in the codec class."""
    module = make_module(architecture, quality, channel=channel, **kwargs)
    _, codec_cls = model_architectures[architecture]
    if variables is None:
        if key is None:
            key = jax.random.key(0)
        H, W = input_size
        x = jnp.zeros((1, H, W, channel), jnp.float32)
        rngs = {"params": key, "noise": jax.random.fold_in(key, 1)}
        if architecture == "master":
            # the conditioned codec also needs the decoded guide and its
            # hidden decoder taps to trace shapes (models/rgbt.py)
            roles = module._roles()
            if roles["guided_stride"] == 2:   # guide at 2x master res
                gH, gW = 2 * H, 2 * W
            else:                              # master at 2x guide res
                gH, gW = H // 2, W // 2
            guided_hat = jnp.zeros(
                (1, gH, gW, roles["guided_chl"]), jnp.float32
            )
            yg = gH // 16
            hidden = {
                f"gs{i + 1}": jnp.zeros(
                    (1, yg * 2 ** (i + 1), (gW // 16) * 2 ** (i + 1),
                     module.N), jnp.float32,
                )
                for i in range(3)
            }
            variables = module.init(rngs, x, guided_hat, hidden)
        elif architecture.endswith("_D"):
            # dependent-modality codecs take the _R model's hidden maps at
            # the master's own pyramid resolutions (same-size pair)
            N = module.N
            hidden = {
                f"ga{i + 1}": jnp.zeros(
                    (1, H >> (i + 1), W >> (i + 1), N), jnp.float32
                )
                for i in range(3)
            }
            hidden.update({
                f"gs{i + 1}": jnp.zeros(
                    (1, (H >> 4) << (i + 1), (W >> 4) << (i + 1), N),
                    jnp.float32,
                )
                for i in range(3)
            })
            variables = module.init(rngs, x, hidden)
        else:
            variables = module.init(rngs, x)
    return codec_cls(module, variables)


video_architectures = {
    "ssf2020": (ScaleSpaceFlow, ScaleSpaceFlowCodec),
}


def create_video_model(architecture="ssf2020", quality: int = 1, key=None,
                       input_size=(256, 256)):
    module_cls, codec_cls = video_architectures[architecture]
    module = module_cls()
    if key is None:
        key = jax.random.key(0)
    frames = jnp.zeros((1, 2, *input_size, 3), jnp.float32)
    variables = module.init(
        {"params": key, "noise": jax.random.fold_in(key, 1)}, frames
    )
    return codec_cls(module, variables)


def image_models():
    return dict(model_architectures)


def video_models():
    return dict(video_architectures)


# populated as families land (mbt2018, cheng2020*, ssf2020, RGBT pair)
def available_models():
    return sorted(model_architectures)


# pretrained-checkpoint registry (urls.py keeps the big tables out of the
# import path of training jobs)
from lmic_tpu.zoo.urls import (  # noqa: E402
    fetch_pretrained,
    load_pretrained_model,
    model_urls,
    pretrained_url,
)
