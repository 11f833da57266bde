"""ssf2020 video evaluation CLI (reference:
compressai/utils/video/eval_model/__main__.py:244-568).

Per raw YUV sequence: convert YUV420 -> RGB444 (bicubic chroma upsampling +
BT.709), pad centered to a multiple of 2^7, run the frame-chained codec
over GOPs, and report the reference's metric set per frame:

- psnr-y / psnr-u / psnr-v computed in the 420 domain on rounded
  [0, 2^bitdepth-1] integer values (reference __main__.py:141-160:
  reconstruction RGB -> YCbCr -> avg-pool 420 against the ORIGINAL
  planes), psnr-yuv = (4*y + u + v) / 6;
- psnr-rgb / mse-rgb on rounded [0, max_val] values and ms-ssim-rgb, both
  against the bicubic-upsampled original (:162-173);
- bitrate in kbps (coded bytes in real-coder mode, likelihood estimate
  with --entropy-estimation, :176-183,303).

Output follows the reference schema (:359-399, :545-568): one JSON per
sequence in the output directory ({stem}-{trained_net}.json with
source/name/description/results), metrics averaged across sequences, and
a cumulative {arch}-{description}.json whose results arrays append one
entry per run — the document lmic-plot consumes.

Usage:
  lmic-video-eval -d /path/to/yuvs --gop 12 --checkpoint ssf.ckpt -o out/
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from lmic_tpu.datasets.rawvideo import RawVideoSequence, VideoFormat
from lmic_tpu.transforms import (
    rgb2ycbcr,
    ycbcr2rgb,
    yuv_420_to_444,
    yuv_444_to_420,
)
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
    """Centered zero padding to a multiple of p (reference
    __main__.py:119-139 / codec_rgbt.py:279-293), so bitstreams stay
    file-compatible with the reference codec app.

    Returns (padded, padding) with padding = (left, right, top, bottom).
    """
    H, W = x.shape[1:3]
    nh, nw = -(-H // p) * p, -(-W // p) * p
    left = (nw - W) // 2
    top = (nh - H) // 2
    padding = (left, nw - W - left, top, nh - H - top)
    padded = np.pad(
        x,
        ((0, 0), (padding[2], padding[3]), (padding[0], padding[1]), (0, 0)),
    )
    return padded, padding


def crop_frames(x: np.ndarray, padding: Tuple[int, int, int, int]):
    """Inverse of pad_frames on (..., H, W, C)."""
    left, right, top, bottom = padding
    H, W = x.shape[-3], x.shape[-2]
    return x[..., top:H - bottom or None, left:W - right or None, :]


def compute_metrics_for_frame(org_frame, rec_rgb: np.ndarray,
                              bitdepth: int = 8) -> Dict[str, float]:
    """Reference metric set for ONE frame (__main__.py:141-175).

    org_frame: the raw YUV420 record; rec_rgb: (1, H, W, 3) float [0,1]
    reconstruction already cropped to the original geometry.
    """
    max_val = 2**bitdepth - 1
    out: Dict[str, float] = {}

    # YUV metrics in the 420 domain on rounded integer values
    rec = jnp.clip(jnp.asarray(rec_rgb), 0.0, 1.0)
    rec_yuv = yuv_444_to_420(rgb2ycbcr(rec), mode="avg_pool")
    for comp, plane in zip("yuv", rec_yuv):
        org = np.asarray(org_frame[comp], np.float32)
        rec_p = np.round(np.clip(
            np.asarray(plane)[0, :, :, 0] * max_val, 0, max_val
        ))
        mse = float(np.mean((org - rec_p) ** 2))
        out[f"psnr-{comp}"] = float(
            20 * np.log10(max_val) - 10 * np.log10(max(mse, 1e-12))
        )
    out["psnr-yuv"] = (
        4 * out["psnr-y"] + out["psnr-u"] + out["psnr-v"]
    ) / 6

    # RGB metrics vs the bicubic-upsampled original, on rounded values
    org_rgb = np.round(np.clip(
        yuv420_frame_to_rgb(org_frame, bitdepth) * max_val, 0, max_val
    ))
    rec_255 = np.round(np.asarray(rec) * max_val)
    mse_rgb = float(np.mean((org_rgb - rec_255) ** 2))
    out["mse-rgb"] = mse_rgb
    out["psnr-rgb"] = float(
        20 * np.log10(max_val) - 10 * np.log10(max(mse_rgb, 1e-12))
    )
    out["ms-ssim-rgb"] = float(ms_ssim(
        jnp.asarray(org_rgb / max_val), jnp.asarray(rec_255 / max_val)
    ))
    return out


def eval_sequence(codec, seq: RawVideoSequence, gop: int = 12,
                  max_frames: Optional[int] = None,
                  entropy_estimation: bool = False) -> Dict[str, float]:
    n = len(seq) if max_frames is None else min(len(seq), max_frames)
    metrics: Dict[str, List[float]] = defaultdict(list)
    total_bytes = 0
    est_bits = 0.0
    enc_time = dec_time = 0.0

    for start in range(0, n, gop):
        idxs = range(start, min(start + gop, n))
        frames = [yuv420_frame_to_rgb(seq[i], seq.bitdepth) for i in idxs]
        clip = np.concatenate(frames)[None]  # (1, T, H, W, 3)
        padded, padding = pad_frames(clip.reshape(-1, *clip.shape[2:]))
        padded = padded[None]
        if entropy_estimation:
            out = codec(jnp.asarray(padded), training=False)
            rec = np.asarray(out["x_hat"])
            for lk in out["likelihoods"]:
                for sub in lk.values():
                    for part in sub.values():
                        est_bits += float(
                            -jnp.sum(jnp.log2(part))
                        )
        else:
            t0 = time.perf_counter()
            strings, shapes = codec.compress(padded)
            enc_time += time.perf_counter() - t0
            t0 = time.perf_counter()
            rec = codec.decompress(strings, shapes)
            dec_time += time.perf_counter() - t0
            for frame_strings in strings:
                for group in _iter_strings(frame_strings):
                    total_bytes += len(group)
        rec = np.clip(crop_frames(rec, padding), 0, 1)

        for t, i in enumerate(idxs):
            m = compute_metrics_for_frame(
                seq[i], rec[0, t][None], seq.bitdepth
            )
            for k, v in m.items():
                metrics[k].append(v)

    fps = float(seq.framerate) if seq.framerate else 30.0
    out = {k: float(np.mean(v)) for k, v in metrics.items()}
    if entropy_estimation:
        # mean estimated bits/frame * fps -> kbps (reference :345-349)
        out["bitrate"] = est_bits * fps / n / 1000.0
    else:
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


def aggregate_results(seq_results: List[Dict[str, float]]) -> Dict[str, float]:
    """Mean per metric over sequences (reference __main__.py:88-100)."""
    agg: Dict[str, List[float]] = defaultdict(list)
    for r in seq_results:
        for k, v in r.items():
            agg[k].append(v)
    return {k: float(np.mean(v)) for k, v in agg.items()}


def main(argv=None):
    p = argparse.ArgumentParser(description="ssf2020 video evaluation")
    p.add_argument("-d", "--dataset", required=True,
                   help="directory of .yuv files (or one file)")
    p.add_argument("-a", "--arch", default="ssf2020")
    p.add_argument("-q", "--quality", type=int, default=1)
    p.add_argument("-m", "--metric", choices=["mse", "ms-ssim"],
                   default="mse")
    p.add_argument("--gop", type=int, default=12)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--entropy-estimation", action="store_true",
                   help="estimate the rate from likelihoods (no coder)")
    p.add_argument("-o", "--output", default=None,
                   help="output directory: per-sequence JSONs plus the "
                        "cumulative {arch}-{description}.json "
                        "(reference schema)")
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    from lmic_tpu import zoo

    codec = zoo.create_video_model(args.arch, quality=args.quality,
                                   input_size=(256, 256))
    if args.checkpoint:
        from lmic_tpu.utils.checkpoint import load_params

        codec.variables = load_params(args.checkpoint, codec.variables)
        codec = type(codec)(codec.module, codec.variables)
    codec.update(force=True)

    description = ("entropy-estimation" if args.entropy_estimation
                   else "ans")
    trained_net = f"{args.arch}-{args.metric}-{args.quality}-{description}"

    path = Path(args.dataset)
    files = [path] if path.is_file() else sorted(path.glob("*.yuv"))
    outdir = Path(args.output) if args.output else None
    if outdir:
        outdir.mkdir(parents=True, exist_ok=True)
    seq_results = []
    for f in files:
        seq = RawVideoSequence.from_file(str(f))
        if seq.video_format != VideoFormat.YUV420:
            print(f"skipping {f.name}: unsupported format")
            continue
        try:
            m = eval_sequence(codec, seq, args.gop, args.max_frames,
                              entropy_estimation=args.entropy_estimation)
        finally:
            seq.close()  # drop the mmap before the next sequence
        seq_results.append(m)
        print(f"{f.name}: " + " ".join(
            f"{k}={v:.4f}" for k, v in m.items()
        ), flush=True)
        if outdir:
            doc = {
                "source": f.stem,
                "name": args.arch,
                "description": f"Inference ({description})",
                "results": m,
            }
            with open(outdir / f"{f.stem}-{trained_net}.json", "w") as fd:
                json.dump(doc, fd, indent=2)

    if not seq_results:
        return
    agg = aggregate_results(seq_results)
    if outdir:
        # cumulative per-arch document: results arrays gain one entry per
        # run (reference __main__.py:545-568; consumed by lmic-plot)
        # metric in the filename: an mse and an ms-ssim run must not
        # merge into one cumulative document (lmic-plot draws one series
        # per file)
        cum_path = outdir / f"{args.arch}-{args.metric}-{description}.json"
        if cum_path.exists():
            with open(cum_path) as fd:
                output = json.load(fd)
        else:
            output = {
                "name": f"{args.arch}-{args.metric}",
                "description": f"Inference ({description})",
                "results": defaultdict(list),
            }
        results = defaultdict(list, output["results"])
        results["q"].append(trained_net)
        for k, v in agg.items():
            results[k].append(v)
        output["results"] = dict(results)
        with open(cum_path, "w") as fd:
            json.dump(output, fd, indent=2)
        print(json.dumps(output, indent=2))


if __name__ == "__main__":
    main()
