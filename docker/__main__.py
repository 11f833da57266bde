"""Docker helper: prints the build/run commands for the lmic_tpu image.

Reference: CompressAI/docker/__main__.py (command generator CLI).
Usage: python -m docker [build|run] [--tag ...] [--gpu|--tpu]
(run from the repo root; `python docker` also works).
"""

import argparse
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description="lmic_tpu docker helper")
    p.add_argument("action", choices=["build", "run"], nargs="?",
                   default="build")
    p.add_argument("--tag", default="lmic_tpu:latest")
    p.add_argument("--base-image", default="python:3.12-slim")
    p.add_argument("--tpu", action="store_true",
                   help="install jax[tpu] (TPU VM)")
    p.add_argument("--cpu", action="store_true",
                   help="use docker/Dockerfile.cpu (CPU-only jax wheel, "
                        "reference Dockerfile.cpu analogue)")
    p.add_argument("--data", default=None,
                   help="host dataset dir to mount at /data")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.action == "build":
        if args.cpu:
            cmd = (
                f"docker build -f docker/Dockerfile.cpu -t {args.tag} "
                f"--build-arg BASE_IMAGE={args.base_image} ."
            )
        else:
            pip_extra = "jax[tpu]" if args.tpu else "jax"
            cmd = (
                f"docker build -f docker/Dockerfile -t {args.tag} "
                f"--build-arg BASE_IMAGE={args.base_image} "
                f"--build-arg PIP_EXTRA='{pip_extra}' ."
            )
    else:
        mounts = f"-v {args.data}:/data " if args.data else ""
        net = "--net=host --privileged " if args.tpu else ""
        cmd = f"docker run --rm -it {net}{mounts}{args.tag}"
    print(cmd)
    return 0


if __name__ == "__main__":
    sys.exit(main())
