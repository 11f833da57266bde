"""ssf2020 video evaluation CLI (reference:
compressai/utils/video/eval_model/__main__.py:244-568).

Per raw YUV sequence: convert YUV420 -> RGB444 (bicubic chroma upsampling +
BT.709), pad to a multiple of 2^7, run the frame-chained codec over GOPs,
report per-frame PSNR / MS-SSIM in both RGB and YUV domains and the bitrate
in kbps.

Usage:
  python -m lmic_tpu.utils.video_eval -d /path/*.yuv --gop 12 \
      --checkpoint ssf.ckpt
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from lmic_tpu.datasets.rawvideo import RawVideoSequence, VideoFormat
from lmic_tpu.transforms import rgb2ycbcr, ycbcr2rgb, yuv_420_to_444
from lmic_tpu.utils.metrics import ms_ssim, psnr

PAD_MULTIPLE = 2**7


def yuv420_frame_to_rgb(frame, bitdepth: int = 8) -> np.ndarray:
    """Structured (y, u, v) record -> (1, H, W, 3) float RGB."""
    max_val = 2**bitdepth - 1
    y = np.asarray(frame["y"], np.float32)[None, :, :, None] / max_val
    u = np.asarray(frame["u"], np.float32)[None, :, :, None] / max_val
    v = np.asarray(frame["v"], np.float32)[None, :, :, None] / max_val
    yuv = np.asarray(yuv_420_to_444((jnp.asarray(y), jnp.asarray(u),
                                     jnp.asarray(v)), mode="bicubic"))
    return np.asarray(ycbcr2rgb(jnp.asarray(yuv)))


def pad_frames(x: np.ndarray, p: int = PAD_MULTIPLE):
    H, W = x.shape[1:3]
    nh, nw = -(-H // p) * p, -(-W // p) * p
    return np.pad(x, ((0, 0), (0, nh - H), (0, nw - W), (0, 0))), (H, W)


def eval_sequence(codec, seq: RawVideoSequence, gop: int = 12,
                  max_frames: int = None) -> Dict[str, float]:
    n = len(seq) if max_frames is None else min(len(seq), max_frames)
    metrics: Dict[str, List[float]] = {
        "psnr-rgb": [], "ms-ssim-rgb": [], "psnr-yuv": [],
    }
    total_bytes = 0
    enc_time = dec_time = 0.0

    for start in range(0, n, gop):
        frames = [
            yuv420_frame_to_rgb(seq[i], seq.bitdepth)
            for i in range(start, min(start + gop, n))
        ]
        clip = np.concatenate(frames)[None]  # (1, T, H, W, 3)
        padded, (H, W) = pad_frames(clip.reshape(-1, *clip.shape[2:]))
        padded = padded[None]
        t0 = time.perf_counter()
        strings, shapes = codec.compress(padded)
        enc_time += time.perf_counter() - t0
        t0 = time.perf_counter()
        rec = codec.decompress(strings, shapes)
        dec_time += time.perf_counter() - t0
        rec = np.clip(rec[:, :, :H, :W], 0, 1)

        for t in range(clip.shape[1]):
            a, b = jnp.asarray(rec[0, t][None]), jnp.asarray(clip[0, t][None])
            metrics["psnr-rgb"].append(float(psnr(a, b)))
            metrics["ms-ssim-rgb"].append(float(ms_ssim(a, b)))
            metrics["psnr-yuv"].append(
                float(psnr(rgb2ycbcr(a), rgb2ycbcr(b)))
            )
        for frame_strings in strings:
            for group in _iter_strings(frame_strings):
                total_bytes += len(group)

    fps = float(seq.framerate) if seq.framerate else 30.0
    out = {k: float(np.mean(v)) for k, v in metrics.items()}
    out["bitrate"] = total_bytes * 8 * fps / n / 1000.0  # kbps
    out["encoding_time"] = enc_time / n
    out["decoding_time"] = dec_time / n
    return out


def _iter_strings(obj):
    if isinstance(obj, bytes):
        yield obj
    elif isinstance(obj, dict):
        for v in obj.values():
            yield from _iter_strings(v)
    elif isinstance(obj, (list, tuple)):
        for v in obj:
            yield from _iter_strings(v)


def main(argv=None):
    p = argparse.ArgumentParser(description="ssf2020 video evaluation")
    p.add_argument("-d", "--dataset", required=True,
                   help="directory of .yuv files (or one file)")
    p.add_argument("--gop", type=int, default=12)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--output", default=None)
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from lmic_tpu import zoo

    codec = zoo.create_video_model("ssf2020", input_size=(256, 256))
    if args.checkpoint:
        from lmic_tpu.utils.checkpoint import load_params

        codec.variables = load_params(args.checkpoint, codec.variables)
        codec = type(codec)(codec.module, codec.variables)
    codec.update(force=True)

    path = Path(args.dataset)
    files = [path] if path.is_file() else sorted(path.glob("*.yuv"))
    results = []
    for f in files:
        seq = RawVideoSequence.from_file(str(f))
        if seq.video_format != VideoFormat.YUV420:
            print(f"skipping {f.name}: unsupported format")
            continue
        m = eval_sequence(codec, seq, args.gop, args.max_frames)
        m["file"] = f.name
        results.append(m)
        print(f"{f.name}: " + " ".join(
            f"{k}={v:.4f}" for k, v in m.items() if k != "file"
        ), flush=True)

    if args.output and results:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
