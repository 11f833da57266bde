"""RD evaluation CLI — the compressai.utils.eval_model equivalent
(__main__t.py single-modality and __main__rgbt.py paired modes).

Two evaluation modes, like the reference:
- entropy-estimation: forward-only, bpp from likelihoods;
- real codec: compress/decompress through the rANS coder with wall-clock
  encode/decode timing.

Images are padded to a multiple of 64 (2^6) for the hyperprior family and
unpadded before metrics (reference __main__t.py:101-140). For the RGBT pair
the bpp adds the beta/gamma side info: 64*2*4*8 bits
(__main__rgbt.py:142). Results append to JSON like the reference.

Usage:
  python -m lmic_tpu.utils.eval_model --arch mbt2018-mean -q 1 \
      --checkpoint model.ckpt -d /path/images --output results.json
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time
from pathlib import Path
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from lmic_tpu import zoo
from lmic_tpu.utils.metrics import ms_ssim, psnr


def pad_to_multiple(x: np.ndarray, p: int = 64):
    """Center-pad (B, H, W, C) to multiples of p (replicate edges like the
    reference's F.pad mode constant 0? — the reference uses zero padding)."""
    H, W = x.shape[1:3]
    new_h = (H + p - 1) // p * p
    new_w = (W + p - 1) // p * p
    pl_h = (new_h - H) // 2
    pl_w = (new_w - W) // 2
    pad = ((0, 0), (pl_h, new_h - H - pl_h), (pl_w, new_w - W - pl_w), (0, 0))
    return np.pad(x, pad), (H, W, pl_h, pl_w)


def unpad(x: np.ndarray, meta):
    H, W, pl_h, pl_w = meta
    return x[:, pl_h : pl_h + H, pl_w : pl_w + W]


def load_image(path, channel=3) -> np.ndarray:
    img = Image.open(path)
    img = img.convert("RGB" if channel == 3 else "L")
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr[None]


def eval_image_forward(codec, x: np.ndarray) -> Dict[str, float]:
    """Entropy-estimation mode."""
    xp, meta = pad_to_multiple(x)
    out = codec(jnp.asarray(xp), training=False)
    num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
    bpp = sum(
        float(-jnp.sum(jnp.log2(lik))) for lik in out["likelihoods"].values()
    ) / num_pixels
    x_hat = unpad(np.clip(np.asarray(out["x_hat"]), 0, 1), meta)
    return {
        "psnr": float(psnr(jnp.asarray(x_hat), jnp.asarray(x))),
        "ms-ssim": float(ms_ssim(jnp.asarray(x_hat), jnp.asarray(x))),
        "bpp": bpp,
    }


def eval_image_codec(codec, x: np.ndarray) -> Dict[str, float]:
    """Real rANS codec mode with timing."""
    xp, meta = pad_to_multiple(x)
    t0 = time.perf_counter()
    out = codec.compress(xp)
    enc_time = time.perf_counter() - t0
    t0 = time.perf_counter()
    rec = codec.decompress(out["strings"], out["shape"])
    dec_time = time.perf_counter() - t0
    num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
    bpp = sum(len(s) for grp in out["strings"] for s in grp) * 8.0 / num_pixels
    x_hat = unpad(rec["x_hat"], meta)
    return {
        "psnr": float(psnr(jnp.asarray(x_hat), jnp.asarray(x))),
        "ms-ssim": float(ms_ssim(jnp.asarray(x_hat), jnp.asarray(x))),
        "bpp": bpp,
        "encoding_time": enc_time,
        "decoding_time": dec_time,
    }


def eval_rgbt_pair(guided_codec, master_codec, x, guided,
                   entropy_estimation: bool = False) -> Dict[str, float]:
    """Paired eval (reference __main__rgbt.py): code the guide, decode it,
    condition the master. bpp counts master strings + beta/gamma side info
    (64*2*4 bytes)."""
    num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
    t0 = time.perf_counter()
    g_out = guided_codec.compress(guided)
    g_dec = guided_codec.decompress(g_out["strings"], g_out["shape"])
    m_out = master_codec.compress(x, g_dec["x_hat"])
    enc_time = time.perf_counter() - t0
    t0 = time.perf_counter()
    m_dec = master_codec.decompress(m_out, g_dec)
    dec_time = time.perf_counter() - t0
    bits = sum(len(s) for grp in m_out["strings"] for s in grp) * 8.0
    bits += 64 * 2 * 4 * 8  # beta/gamma floats (reference __main__rgbt.py:142)
    return {
        "psnr": float(psnr(jnp.asarray(m_dec["x_hat"]), jnp.asarray(x))),
        "ms-ssim": float(
            ms_ssim(jnp.asarray(m_dec["x_hat"]), jnp.asarray(x))
        ),
        "bpp": bits / num_pixels,
        "encoding_time": enc_time,
        "decoding_time": dec_time,
    }


def parse_args(argv):
    p = argparse.ArgumentParser(description="lmic_tpu RD evaluation")
    p.add_argument("--arch", default="bmshj2018-factorized")
    p.add_argument("-q", "--quality", type=int, default=1)
    p.add_argument("-d", "--dataset", required=True)
    p.add_argument("--channel", type=int, default=3)
    p.add_argument("--checkpoint", default=None,
                   help="deployment checkpoint from update_model")
    p.add_argument("--entropy-estimation", action="store_true")
    p.add_argument("--output", default=None, help="JSON results path")
    p.add_argument("--half", action="store_true",
                   help="(accepted for reference-CLI parity; bf16 eval TBD)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    codec = zoo.create_model(
        args.arch, args.quality, channel=args.channel
    )
    if args.checkpoint:
        from lmic_tpu.utils.checkpoint import load_updated_model

        codec = load_updated_model(args.checkpoint, codec)
    elif not args.entropy_estimation:
        codec.update(force=True)

    files = sorted(
        f for f in Path(args.dataset).iterdir()
        if f.suffix.lower() in {".png", ".jpg", ".jpeg"}
    )
    import contextlib

    # --half: bf16 matmul passes on the MXU for the transforms (the torch
    # reference's .half() eval analogue); coding decisions stay f32
    precision_ctx = (
        jax.default_matmul_precision("bfloat16") if args.half
        else contextlib.nullcontext()
    )
    results: List[Dict[str, float]] = []
    with precision_ctx:
        for f in files:
            x = load_image(f, args.channel)
            if args.entropy_estimation:
                m = eval_image_forward(codec, x)
            else:
                m = eval_image_codec(codec, x)
            results.append(m)
            print(
                f"{f.name}: "
                + " ".join(f"{k}={v:.4f}" for k, v in m.items()),
                flush=True,
            )

    agg = {
        k: float(np.mean([r[k] for r in results]))
        for k in results[0]
    } if results else {}
    summary = {
        "name": args.arch,
        "description": f"q={args.quality} "
        + ("entropy-estimation" if args.entropy_estimation else "rans"),
        "results": agg,
    }
    print(json.dumps(summary, indent=2))
    if args.output:
        existing = []
        if os.path.exists(args.output):
            with open(args.output) as fh:
                existing = json.load(fh)
        existing.append(summary)
        with open(args.output, "w") as fh:
            json.dump(existing, fh, indent=2)


if __name__ == "__main__":
    main()
