"""Bisect a traditional codec's quality to match a target bpp/psnr/ms-ssim
(reference: compressai/utils/find_close/__main__.py:67-106).

Usage:
  python -m lmic_tpu.utils.find_close jpeg image.png 0.5 --metric bpp
"""

from __future__ import annotations

import argparse
import sys

from lmic_tpu.utils.bench_codecs import CODECS


QUALITY_RANGES = {
    "jpeg": (1, 100),
    "webp": (1, 100),
    "jpeg2000": (1, 200),
    "bpg": (0, 51),
}
# metrics that decrease as quality parameter increases
INVERSE = {"bpg": True}


def find_closest(codec_name: str, img_path: str, target: float,
                 metric: str = "bpp", max_iters: int = 12):
    codec = CODECS[codec_name]()
    lo, hi = QUALITY_RANGES[codec_name]
    inverse = INVERSE.get(codec_name, False)
    best = None
    for _ in range(max_iters):
        if hi - lo <= 1:
            break
        mid = (lo + hi) // 2
        res = codec.run(img_path, mid)
        value = res[metric]
        best = (mid, res)
        higher_quality = value < target
        if inverse:
            higher_quality = not higher_quality
        if higher_quality:
            lo = mid
        else:
            hi = mid
    return best


def main(argv=None):
    p = argparse.ArgumentParser(description="match a codec to a target")
    p.add_argument("codec", choices=sorted(CODECS))
    p.add_argument("image")
    p.add_argument("target", type=float)
    p.add_argument("--metric", default="bpp",
                   choices=["bpp", "psnr", "ms-ssim"])
    args = p.parse_args(argv if argv is not None else sys.argv[1:])
    quality, res = find_closest(args.codec, args.image, args.target,
                                args.metric)
    print(f"quality={quality}: "
          + " ".join(f"{k}={v:.4f}" for k, v in res.items()))


if __name__ == "__main__":
    main()
