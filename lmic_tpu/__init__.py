"""lmic_tpu — TPU-native learned multi-modality image & video compression.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
CompressAI-based reference (SZU-AdvTech-2022/165, "Learning based
Multi-modality Image and Video Compression", CVPR 2022):

- On-device entropy models (factorized EntropyBottleneck, GaussianConditional)
  with differentiable likelihoods for training and integer CDF tables for
  coding (reference: compressai/entropy_models/entropy_models.py).
- A native C++ rANS range coder with a batched numpy API reached through
  ctypes (reference: compressai/cpp_exts/rans/rans_interface.cpp) — stream
  format compatible (16-bit precision, 4-bit bypass escape coding).
- The image codec zoo (bmshj2018-factorized, bmshj2018-hyperprior,
  mbt2018-mean, mbt2018, cheng2020-anchor/attn), the ssf2020 video codec, and
  the RGB-T Guided/Master multimodal pair (reference: compressai/models/).
- Training (rate-distortion loss, dual optimizers), evaluation and file-codec
  utilities (reference: examples/train.py, examples/codec_rgbt.py,
  compressai/utils/).

Design: all hot compute is jitted JAX (NHWC conv layouts for the TPU MXU);
model state is an explicit pytree; host-side wrapper classes orchestrate
`compress`/`decompress` by running jitted device functions once per image and
crossing to the native coder with batched int32 arrays (never per-symbol
Python lists). Multi-chip scaling uses `jax.sharding.Mesh` + NamedSharding
over the batch axis (data parallel) — see `lmic_tpu.parallel`.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("LMIC_PLATFORM"):
    # Deployment-environment escape hatch: some TPU images pin the jax
    # platform from sitecustomize *after* env parsing, so JAX_PLATFORMS
    # alone cannot select the CPU backend for host-side CLI runs. Setting
    # LMIC_PLATFORM=cpu forces it at package import, before any tracing.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["LMIC_PLATFORM"])
elif _os.environ.get("PALLAS_AXON_POOL_IPS"):
    # Tunnel-attached TPU (axon): host callbacks (io_callback) hang over
    # the tunnel, so the autoregressive decode scan needs a CPU device to
    # run on (models/joint.py). Register the CPU platform alongside the
    # TPU; the TPU stays the default backend.
    import jax as _jax

    _platforms = _os.environ.get("JAX_PLATFORMS", "axon")
    if "cpu" not in _platforms:
        _jax.config.update("jax_platforms", _platforms + ",cpu")

from lmic_tpu import ops  # noqa: F401

_entropy_coder = "rans"


def available_entropy_coders():
    """Names of usable entropy coders (reference: compressai/__init__.py:50)."""
    return ["rans"]


def get_entropy_coder():
    return _entropy_coder


def set_entropy_coder(name):
    global _entropy_coder
    if name not in available_entropy_coders():
        raise ValueError(
            f'Invalid entropy coder "{name}", choose from '
            f"({', '.join(available_entropy_coders())})"
        )
    _entropy_coder = name
