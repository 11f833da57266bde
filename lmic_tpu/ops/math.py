"""Core autograd ops: bounded max with pass-through gradient, STE rounding,
non-negative reparametrization.

Reference semantics: compressai/ops/bound_ops.py:36-80,
compressai/ops/parametrizers.py:38-64, compressai/ops/ops.py:35-49.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x, bound):
    """`max(x, bound)` with a custom gradient.

    The gradient passes through where `x >= bound`, or where the incoming
    gradient would push `x` up toward the bound (grad < 0 in minimization
    convention). Reference: compressai/ops/bound_ops.py:40-42.
    """
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    gx = jnp.where(pass_through, g, jnp.zeros_like(g))
    # No gradient w.r.t. the bound (reference returns None for it).
    return gx, jnp.zeros_like(bound)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)


class LowerBound:
    """Callable wrapper matching the reference module API."""

    def __init__(self, bound: float):
        self.bound = float(bound)

    def __call__(self, x):
        return lower_bound(x, jnp.asarray(self.bound, dtype=x.dtype))


def ste_round(x):
    """Round with straight-through (identity) gradient.

    Reference: compressai/ops/ops.py:35-49 (`round(x) - detach(x) + x`).
    """
    return jnp.round(x) - jax.lax.stop_gradient(x) + x


# Alias used by the video models (reference: compressai/models/utils.py:149).
quantize_ste = ste_round


class NonNegativeParametrizer:
    """sqrt-space reparametrization keeping values >= `minimum`.

    Stored parameter p relates to the effective value v by
    `v = lower_bound(p, sqrt(minimum + eps^2))^2 - eps^2` with
    eps = 2^-18. Reference: compressai/ops/parametrizers.py:38-64.
    """

    def __init__(self, minimum: float = 0.0, reparam_offset: float = 2**-18):
        self.minimum = float(minimum)
        self.reparam_offset = float(reparam_offset)
        self.pedestal = self.reparam_offset**2
        self._bound = (self.minimum + self.pedestal) ** 0.5

    def init(self, x):
        """Map an initial effective value to parameter space."""
        return jnp.sqrt(jnp.maximum(x + self.pedestal, self.pedestal))

    def __call__(self, x):
        out = lower_bound(x, jnp.asarray(self._bound, dtype=x.dtype))
        return out**2 - self.pedestal


def from_amp(x):
    """Upcast AMP activations (bf16/f16) to f32 at the entropy/loss
    boundaries; identity for f32 and f64. Never downcasts — the f64
    gradient-parity tests (tests/test_pretrained_import.py) run the
    whole graph in x64, and an unconditional f32 cast here would
    truncate it to f32 precision."""
    if x.dtype in (jnp.bfloat16, jnp.float16):
        return x.astype(jnp.float32)
    return x
