"""Training CLI — the examples/train.py equivalent.

Supports the reference's two recipes (examples/train.py:145-274):
- single-model training (any zoo image arch, incl. the Guided_compresser)
  with the RD loss `lambda[q] * MSE + bpp` and dual Adam optimizers;
- master training: the (frozen) guide runs in eval mode inside the same jit,
  its reconstruction + hidden maps feeding the MasterCompresser.

Data-parallel over all local devices via the `data` mesh axis.

Usage:
  python -m lmic_tpu.utils.train_cli --arch bmshj2018-factorized -q 1 \
      -d /path/dataset --epochs 100 --batch-size 16
  python -m lmic_tpu.utils.train_cli --arch master -q 3 \
      -d /path/FLIR/train/RGB --guided-checkpoint guided.ckpt ...
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lmic_tpu import parallel, zoo
from lmic_tpu.utils import checkpoint as ckpt
from lmic_tpu.utils.train import (
    LAMBDA_TABLE,
    TrainState,
    create_train_state,
    make_optimizer,
    make_train_step,
    rate_distortion_loss,
)

# archs whose transform stacks plumb an activation compute dtype
# (models/image.py `dtype` field + boundary casts); --amp is gated on this
AMP_ARCHS = {
    "bmshj2018-factorized",
    "bmshj2018-hyperprior",
    "mbt2018-mean",
    "mbt2018",
    "cheng2020-anchor",
    "cheng2020-attn",
    "guided",
}


def make_master_train_step(master_module, guided_module, guided_params,
                           optimizer, lmbda: float):
    """Jitted master step: guide eval forward under stop_gradient feeding the
    master training forward (reference train.py:208-274)."""

    def loss_fn(params, master_batch, guided_batch, key):
        g_out = guided_module.apply(
            {"params": guided_params}, guided_batch, training=False
        )
        guided_hat = jax.lax.stop_gradient(g_out["x_hat"])
        hidden = jax.lax.stop_gradient(g_out["hidden"])
        out = master_module.apply(
            {"params": params}, master_batch, guided_hat, hidden,
            training=True, rngs={"noise": key},
        )
        rd = rate_distortion_loss(out, master_batch, lmbda)
        aux = master_module.apply(
            {"params": params}, method=type(master_module).aux_loss
        )
        total = rd["loss"] + aux
        return total, {**rd, "aux_loss": aux}

    @jax.jit
    def step(state: TrainState, master_batch, guided_batch, key):
        key = jax.random.fold_in(key, state.step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, master_batch, guided_batch, key
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state,
                       step=state.step + 1),
            metrics,
        )

    return step


def parse_args(argv):
    p = argparse.ArgumentParser(description="lmic_tpu training")
    p.add_argument("--arch", default="bmshj2018-factorized",
                   help="architecture name from the zoo")
    p.add_argument("-q", "--quality", type=int, default=1)
    p.add_argument("-d", "--dataset", required=True)
    p.add_argument("--channel", type=int, default=3)
    p.add_argument("-e", "--epochs", type=int, default=100)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("--aux-learning-rate", type=float, default=1e-3)
    p.add_argument("-n", "--batch-size", type=int, default=16)
    p.add_argument("--patch-size", type=int, nargs=2, default=(256, 256))
    p.add_argument("--crop-size", type=int, nargs=2, default=(512, 640),
                   help="guide crop for master training")
    p.add_argument("--seed", type=int, default=1926)
    p.add_argument("--clip-max-norm", type=float, default=1.0)
    p.add_argument("--checkpoint", default=None, help="resume path")
    p.add_argument("--guided-checkpoint", default=None,
                   help="frozen guide params for master training")
    p.add_argument("--save-path", default="checkpoint.ckpt")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 matmul precision on the MXU (reference AMP "
                        "equivalent; params/likelihoods stay f32)")
    p.add_argument("--amp", action="store_true",
                   help="bf16 ACTIVATIONS through the transform stacks "
                        "(halves the HBM traffic that bounds the step; "
                        "params, quantization noise, and likelihoods stay "
                        "f32). Google-family, mbt2018, cheng2020, and "
                        "guided archs.")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize the forward in the backward "
                        "(jax.checkpoint): ~1/3 more FLOPs for larger "
                        "batches/crops per chip; identical gradients")
    p.add_argument("--prefetch", type=int, default=2,
                   help="host batches prepared ahead on a background "
                        "thread (0 disables)")
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--devices", type=int, default=None,
                   help="train on the first N local devices (default: all; "
                        "batch size must divide the device count)")
    return p.parse_args(argv)


def _batches(dl, n: int):
    """Apply background prefetch when requested."""
    if n and n > 0:
        from lmic_tpu.datasets import prefetch

        return prefetch(iter(dl), size=n)
    return dl


def train_single(args):
    from lmic_tpu.datasets import DataLoader, ImageFolder
    from lmic_tpu.utils.train import make_eval_step, step_lr

    lmbda = LAMBDA_TABLE[args.quality - 1]
    kwargs = {}
    if getattr(args, "amp", False):
        if args.arch not in AMP_ARCHS:
            raise SystemExit(
                f"--amp supports {sorted(AMP_ARCHS)}; {args.arch} does not "
                "plumb an activation dtype through its transforms yet"
            )
        kwargs["dtype"] = jnp.bfloat16
    codec = zoo.create_model(
        args.arch, args.quality, key=jax.random.key(args.seed),
        channel=args.channel, input_size=tuple(args.patch_size), **kwargs,
    )
    module = codec.module

    if args.channel == 3:
        ds = ImageFolder(args.dataset, "train",
                         patch_size=tuple(args.patch_size), seed=args.seed)
    else:
        # channel-aware loader (grayscale modalities stay single-channel,
        # reference image_rgbt_t.py semantics)
        from lmic_tpu.datasets import ImageFolderT

        ds = ImageFolderT(args.dataset, "train",
                          patch_size=tuple(args.patch_size),
                          channel=args.channel, seed=args.seed)
    dl = DataLoader(ds, args.batch_size, seed=args.seed)
    # held-out test epoch for best-checkpoint selection when the dataset
    # has a test split (the reference recipe, examples/train.py test_epoch;
    # a sampled train-loss mean is noisy)
    test_dl = None
    if (Path(args.dataset) / "test").is_dir():
        loader_cls = type(ds)
        kwargs = {"channel": args.channel} if args.channel != 3 else {}
        test_ds = loader_cls(args.dataset, "test", train=False,
                             patch_size=tuple(args.patch_size), **kwargs)
        test_dl = DataLoader(test_ds, args.batch_size, shuffle=False,
                             seed=0)

    steps_per_epoch = args.steps_per_epoch or max(1, len(dl))
    # StepLR(40 epochs, 0.5) on the main optimizer (reference train.py:395)
    optimizer = make_optimizer(
        step_lr(args.learning_rate, steps_per_epoch),
        args.aux_learning_rate, args.clip_max_norm,
    )
    state = create_train_state(codec.variables["params"], optimizer)
    start_epoch, best_loss = 0, float("inf")
    if args.checkpoint:
        state, extra = ckpt.load_checkpoint(args.checkpoint, state)
        start_epoch = extra.get("epoch", 0) + 1
        best_loss = extra.get("best_loss", float("inf"))

    mesh = parallel.make_mesh(args.devices)
    state = parallel.replicate(mesh, state)
    step_fn = make_train_step(
        module, optimizer, lmbda,
        matmul_precision="bfloat16" if args.bf16 else None,
        remat=args.remat,
    )
    eval_fn = make_eval_step(module, lmbda) if test_dl else None
    key = jax.random.key(args.seed)

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        running = []
        for i, batch in enumerate(_batches(dl, args.prefetch)):
            if args.steps_per_epoch and i >= args.steps_per_epoch:
                break
            batch = parallel.shard_batch(mesh, batch.astype(np.float32))
            state, metrics = step_fn(state, batch, key)
            if i % args.log_every == 0:
                m = jax.device_get(metrics)
                running.append(float(m["loss"]))
                print(
                    f"epoch {epoch} it {i}: loss={float(m['loss']):.4f} "
                    f"mse={float(m['mse_loss']):.6f} "
                    f"bpp={float(m['bpp_loss']):.4f} "
                    f"aux={float(m['aux_loss']):.1f}",
                    flush=True,
                )
        if test_dl is not None:
            test_losses = [
                float(jax.device_get(eval_fn(
                    state.params,
                    parallel.shard_batch(mesh, b.astype(np.float32)),
                )["loss"]))
                for b in test_dl
            ]
            if test_losses:
                epoch_loss = float(np.mean(test_losses))
                print(f"epoch {epoch} test loss={epoch_loss:.4f}",
                      flush=True)
            else:  # test split smaller than one batch: fall back
                epoch_loss = (float(np.mean(running)) if running
                              else float("inf"))
        else:
            epoch_loss = float(np.mean(running)) if running else float("inf")
        is_best = epoch_loss < best_loss
        best_loss = min(epoch_loss, best_loss)
        ckpt.save_checkpoint(
            args.save_path, state,
            {"epoch": epoch, "best_loss": best_loss, "arch": args.arch,
             "quality": args.quality},
            is_best=is_best,
        )
        print(f"epoch {epoch} done in {time.time()-t0:.1f}s "
              f"loss={epoch_loss:.4f}{' (best)' if is_best else ''}",
              flush=True)
    return state


def train_master(args):
    from lmic_tpu.datasets import DataLoader, ImageFolderRGB

    lmbda = LAMBDA_TABLE[args.quality - 1]
    guided_codec = zoo.create_model(
        "guided", args.quality, key=jax.random.key(args.seed),
        channel=1 if args.channel == 3 else 3,
        first_stride=2,
        input_size=tuple(args.crop_size),
    )
    if args.guided_checkpoint:
        from lmic_tpu.utils.train import step_lr as _sched

        # only the params matter for the frozen guide, but deserialization
        # needs a structure-matching opt_state template: guide checkpoints
        # carry a StepLR schedule state (count); tolerate older
        # constant-lr checkpoints too
        def _load(optimizer):
            template = create_train_state(
                guided_codec.variables["params"], optimizer
            )
            return ckpt.load_checkpoint(args.guided_checkpoint, template)

        try:
            g_state, _ = _load(
                make_optimizer(_sched(args.learning_rate, 1))
            )
        except ValueError:  # constant-lr era checkpoint
            g_state, _ = _load(make_optimizer())
        guided_params = g_state.params
    else:
        print("WARNING: training master against a randomly initialized "
              "guide (pass --guided-checkpoint)", flush=True)
        guided_params = guided_codec.variables["params"]

    ds = ImageFolderRGB(args.dataset, crop_size=tuple(args.crop_size),
                        channel=args.channel, seed=args.seed)
    dl = DataLoader(ds, args.batch_size, seed=args.seed)

    # build master with role-correct shapes: the RGB modality is the 2x
    # stream (channel=3 -> master is RGB at 2x; channel=1 -> guide is RGB
    # at 2x and the thermal master stays at crop_size)
    master_module = zoo.make_module("master", args.quality,
                                    channel=args.channel)
    H, W = args.crop_size
    if args.channel == 3:
        xm = jnp.zeros((1, 2 * H, 2 * W, 3))
        xg = jnp.zeros((1, H, W, 1))
    else:
        xm = jnp.zeros((1, H, W, 1))
        xg = jnp.zeros((1, 2 * H, 2 * W, 3))
    g_out = guided_codec.module.apply(
        {"params": guided_params}, xg, training=False
    )
    variables = master_module.init(
        {"params": jax.random.key(args.seed),
         "noise": jax.random.key(args.seed + 1)},
        xm, g_out["x_hat"], g_out["hidden"],
    )
    from lmic_tpu.utils.train import step_lr

    # StepLR(40 epochs, 0.5) on the main optimizer (reference train.py:395)
    optimizer = make_optimizer(
        step_lr(args.learning_rate,
                args.steps_per_epoch or max(1, len(dl))),
        args.aux_learning_rate, args.clip_max_norm,
    )
    state = create_train_state(variables["params"], optimizer)
    start_epoch, best_loss = 0, float("inf")
    if args.checkpoint:
        state, extra = ckpt.load_checkpoint(args.checkpoint, state)
        start_epoch = extra.get("epoch", 0) + 1
        best_loss = extra.get("best_loss", float("inf"))

    mesh = parallel.make_mesh(args.devices)
    state = parallel.replicate(mesh, state)
    step_fn = make_master_train_step(
        master_module, guided_codec.module, guided_params, optimizer, lmbda
    )
    key = jax.random.key(args.seed)

    for epoch in range(start_epoch, args.epochs):
        t0 = time.time()
        running = []
        for i, (x, guided) in enumerate(_batches(dl, args.prefetch)):
            if args.steps_per_epoch and i >= args.steps_per_epoch:
                break
            x = parallel.shard_batch(mesh, x.astype(np.float32))
            guided = parallel.shard_batch(mesh, guided.astype(np.float32))
            state, metrics = step_fn(state, x, guided, key)
            if i % args.log_every == 0:
                m = jax.device_get(metrics)
                running.append(float(m["loss"]))
                print(
                    f"epoch {epoch} it {i}: loss={float(m['loss']):.4f} "
                    f"mse={float(m['mse_loss']):.6f} "
                    f"bpp={float(m['bpp_loss']):.4f}",
                    flush=True,
                )
        epoch_loss = float(np.mean(running)) if running else float("inf")
        is_best = epoch_loss < best_loss
        best_loss = min(epoch_loss, best_loss)
        ckpt.save_checkpoint(
            args.save_path, state,
            {"epoch": epoch, "best_loss": best_loss, "arch": "master",
             "quality": args.quality},
            is_best=is_best,
        )
        print(f"epoch {epoch} done in {time.time()-t0:.1f}s "
              f"loss={epoch_loss:.4f}", flush=True)
    return state


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.arch.endswith("_D"):
        raise SystemExit(
            f"{args.arch} is a paired dependent-modality model: its forward "
            "consumes the matching '_R' model's hidden maps per batch and "
            "has no standalone training recipe (the reference provides "
            "none either) — train the '_R' model instead"
        )
    try:
        if args.arch == "master":
            train_master(args)
        else:
            train_single(args)
    except Exception:
        # long training runs should leave a postmortem trail
        # (reference examples/train.py:481-491)
        import traceback

        with open("error.log", "a") as f:
            f.write(traceback.format_exc() + "\n")
        raise


if __name__ == "__main__":
    main()
