"""Training: rate-distortion loss, dual optimizers, jitted SPMD train step.

Reference semantics (examples/train.py):
- RateDistortionLoss: loss = lambda[q] * MSE(x_hat, x) + bpp, with the fork's
  lambda table [256, 512, 1024, 2048, 4096, 8192, 10240] indexed by quality
  and bpp = sum(-log2 likelihood) / (N*H*W)  (train.py:59-82).
- Two Adam optimizers: main lr 1e-4 on all params except the bottleneck
  `quantiles`, aux lr 1e-3 on the quantiles (train.py:111-142). The aux loss
  stops gradients into the transform params and the RD loss (training mode)
  never touches the quantiles, so a single backward with per-group
  transforms reproduces the reference's two backward passes exactly.
- Gradient clipping at global norm 1.0 (train.py:182), StepLR(40, 0.5).

TPU mapping: the train step is one jitted SPMD program over a `data` mesh
axis — batch sharded, params replicated, gradient psum inserted by XLA.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

# fork's lambda table, indexed by quality - 1 (examples/train.py:65)
LAMBDA_TABLE = (256, 512, 1024, 2048, 4096, 8192, 10240)


def rate_distortion_loss(output, target, lmbda: float):
    """Returns dict(loss, mse_loss, bpp_loss)."""
    num_pixels = target.shape[0] * target.shape[1] * target.shape[2]
    bpp = sum(
        jnp.sum(jnp.log(lik)) / (-jnp.log(2.0) * num_pixels)
        for lik in output["likelihoods"].values()
    )
    mse = jnp.mean((output["x_hat"] - target) ** 2)
    return {"loss": lmbda * mse + bpp, "mse_loss": mse, "bpp_loss": bpp}


def _param_labels(params):
    def label(path, _):
        return "aux" if path[-1].key == "quantiles" else "main"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    learning_rate=1e-4,
    aux_learning_rate=1e-3,
    clip_grad_norm: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    """Dual optimizer: Adam(lr) on transform params (with grad clipping),
    Adam(aux_lr) on bottleneck quantiles."""
    main_chain = []
    if clip_grad_norm is not None:
        main_chain.append(optax.clip_by_global_norm(clip_grad_norm))
    main_chain.append(optax.adam(learning_rate))
    return optax.multi_transform(
        {"main": optax.chain(*main_chain), "aux": optax.adam(aux_learning_rate)},
        _param_labels,
    )


def step_lr(base_lr: float, steps_per_epoch: int, step_size: int = 40,
            gamma: float = 0.5):
    """StepLR(step_size epochs, gamma) as an optax schedule."""

    def schedule(count):
        epoch = count // steps_per_epoch
        return base_lr * gamma ** (epoch // step_size)

    return schedule


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(params, optimizer) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    module,
    optimizer: optax.GradientTransformation,
    lmbda: float,
    matmul_precision: Optional[str] = None,
    remat: bool = False,
) -> Callable:
    """Build the jitted SPMD train step.

    step(state, batch, key) -> (state, metrics). `batch` is (B, H, W, C)
    in [0, 1]; shard it over the data mesh axis with
    lmic_tpu.parallel.shard_batch and the gradient psum is emitted by XLA.

    matmul_precision="bfloat16" runs the conv/matmul FLOPs through the MXU
    in bf16 while keeping f32 parameters and likelihood math — the TPU
    analogue of the reference's AMP autocast (train.py:172-186; no loss
    scaling needed: bf16 keeps f32's exponent range).

    remat=True rematerializes the forward pass in the backward
    (jax.checkpoint): activations are recomputed instead of stored,
    trading ~1/3 more FLOPs for the ability to fit larger batches or
    crops in HBM. Gradients are numerically identical.
    """

    def apply_train(params, batch, key):
        return module.apply(
            {"params": params}, batch, training=True, rngs={"noise": key}
        )

    if remat:
        apply_train = jax.checkpoint(apply_train)

    def loss_fn(params, batch, key):
        if matmul_precision:
            with jax.default_matmul_precision(matmul_precision):
                out = apply_train(params, batch, key)
        else:
            out = apply_train(params, batch, key)
        rd = rate_distortion_loss(out, batch, lmbda)
        aux = module.apply(
            {"params": params}, method=type(module).aux_loss
        )
        total = rd["loss"] + aux
        return total, {
            "loss": rd["loss"],
            "mse_loss": rd["mse_loss"],
            "bpp_loss": rd["bpp_loss"],
            "aux_loss": aux,
        }

    @jax.jit
    def train_step(state: TrainState, batch, key):
        key = jax.random.fold_in(key, state.step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, key
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    return train_step


def make_eval_step(module, lmbda: float) -> Callable:
    @jax.jit
    def eval_step(params, batch):
        out = module.apply({"params": params}, batch, training=False)
        rd = rate_distortion_loss(out, batch, lmbda)
        psnr = -10.0 * jnp.log10(rd["mse_loss"])
        return {**rd, "psnr": psnr}

    return eval_step
