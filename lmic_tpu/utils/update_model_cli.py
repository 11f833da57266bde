"""Finalize a training checkpoint for deployment.

Loads a training checkpoint, bakes the integer coding tables
(`codec.update(force=True)`), and writes a deployment checkpoint named
`<arch>-q<q>-<sha256[:8]>.ckpt`.

Reference: `compressai/utils/update_model/__main__.py:128-206` (load
checkpoint -> net.update(force=True) -> save `{name}-{sha256[:8]}.pth.tar`,
with special-casing for Guided_compresser / Master_compresser; here the
architecture is an explicit flag instead of filename parsing).
"""

from __future__ import annotations

import argparse
import os
import sys

import jax

from lmic_tpu import zoo
from lmic_tpu.utils import checkpoint as ckpt


def parse_args(argv):
    p = argparse.ArgumentParser(description="lmic_tpu update_model")
    p.add_argument("checkpoint", help="training checkpoint (.ckpt)")
    p.add_argument("-a", "--arch", default="bmshj2018-factorized")
    p.add_argument("-q", "--quality", type=int, default=1)
    p.add_argument("--channel", type=int, default=3)
    p.add_argument("-d", "--dir", dest="out_dir", default=".",
                   help="output directory")
    p.add_argument("-n", "--name", default=None,
                   help="output stem (default: <arch>-q<quality>)")
    p.add_argument("--no-update", action="store_true",
                   help="skip CDF re-baking (reference --no-update)")
    p.add_argument("--raw-params", action="store_true",
                   help="checkpoint holds bare params (save_params), not a "
                        "TrainState")
    p.add_argument("--from-torch", action="store_true",
                   help="checkpoint is a reference PyTorch .pth(.tar): "
                        "convert via zoo.pretrained and bake tables")
    p.add_argument("--aot-shape", default=None, metavar="Bx[Tx]HxWxC",
                   help="additionally export an AOT serving bundle "
                        "(jax.export graphs + baked tables, loadable "
                        "without model code) for this input shape, e.g. "
                        "8x768x512x3 (ssf2020: BxTxHxW[xC] GOP shape); "
                        "non-AR archs only")
    return p.parse_args(argv)


def run(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.arch == "ssf2020":
        codec = zoo.create_video_model(
            args.arch, args.quality, key=jax.random.key(0)
        )
    else:
        codec = zoo.create_model(
            args.arch, args.quality, channel=args.channel,
            key=jax.random.key(0),
        )
    baked = False
    if args.from_torch:
        from lmic_tpu.zoo.pretrained import (
            import_reference_coding_state,
            import_reference_state_dict,
            import_reference_video_coding_state,
            load_torch_state_dict,
        )

        sd = load_torch_state_dict(args.checkpoint)
        params = import_reference_state_dict(
            args.arch, sd, codec.variables
        )["params"]
        codec = type(codec)(codec.module, {"params": params})
        # adopt the reference's baked CDF buffers when present — keeps
        # bitstreams byte-compatible with the original torch deployment
        baked = (import_reference_video_coding_state(sd, codec)
                 if args.arch == "ssf2020"
                 else import_reference_coding_state(sd, codec))
    elif args.raw_params:
        params = ckpt.load_params(
            args.checkpoint, codec.variables["params"]
        )
    else:
        # params-only restore: works for checkpoints saved with ANY
        # optimizer configuration (lr schedule / clip norm change the
        # optax state structure, which a full-state template must match)
        params, _ = ckpt.load_train_params(
            args.checkpoint, codec.variables["params"]
        )
    if not args.from_torch:
        codec = type(codec)(codec.module, {"params": params})
    name = args.name or f"{args.arch}-q{args.quality}"
    os.makedirs(args.out_dir, exist_ok=True)
    if args.no_update:
        out = f"{args.out_dir}/{name}.ckpt"
        ckpt.save_params(out, params)
    else:
        out = ckpt.update_model_file(
            args.checkpoint, args.out_dir, codec, name, update=not baked
        )
    if args.aot_shape:
        from lmic_tpu.utils.aot import export_serving_bundle

        shape = tuple(int(d) for d in args.aot_shape.lower().split("x"))
        want = 5 if args.arch == "ssf2020" else 4
        if len(shape) == want - 1:
            shape = (*shape, 3)
        if len(shape) != want:
            raise SystemExit(
                "--aot-shape must be BxTxHxW[xC] for ssf2020, "
                "BxHxW[xC] otherwise"
            )
        codec.update()  # no-op if already baked
        bundle = export_serving_bundle(
            codec, f"{args.out_dir}/{name}-aot", shape
        )
        print(bundle)
    print(out)
    return out


def main(argv=None):
    run(argv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
