"""RD-curve plotting CLI (reference: compressai/utils/plot/__main__.py).

Reads eval-JSON files (the format written by lmic_tpu.utils.eval_model or
reference CompressAI results files with per-quality arrays) and renders
rate-distortion curves with matplotlib.

Usage:
  python -m lmic_tpu.utils.plot_cli -f results/*.json --metric psnr \
      -o rd_curve.png
"""

from __future__ import annotations

import argparse
import json
import sys


def load_series(path: str, metric: str):
    with open(path) as f:
        data = json.load(f)
    entries = data if isinstance(data, list) else [data]
    series = []
    for e in entries:
        res = e.get("results", e)
        name = e.get("name", path)
        bpp = res.get("bpp")
        val = res.get(metric) or res.get(metric.replace("_", "-"))
        if bpp is None or val is None:
            continue
        if not isinstance(bpp, list):
            bpp, val = [bpp], [val]
        pairs = sorted(zip(bpp, val))
        series.append((name, [p[0] for p in pairs], [p[1] for p in pairs]))
    return series


def main(argv=None):
    p = argparse.ArgumentParser(description="RD curve plotting")
    p.add_argument("-f", "--results-file", nargs="+", required=True)
    p.add_argument("--metric", default="psnr",
                   choices=["psnr", "ms-ssim", "ms_ssim"])
    p.add_argument("-t", "--title", default="RD curves")
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args(argv if argv is not None else sys.argv[1:])

    import matplotlib

    if args.output:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(9, 6))
    for path in args.results_file:
        for name, bpp, val in load_series(path, args.metric):
            ax.plot(bpp, val, ".-", label=name)
    ax.set_xlabel("Bit-rate [bpp]")
    ax.set_ylabel(
        "PSNR [dB]" if args.metric == "psnr" else "MS-SSIM"
    )
    ax.set_title(args.title)
    ax.grid(True, alpha=0.3)
    ax.legend(loc="lower right")
    if args.output:
        fig.savefig(args.output, dpi=150, bbox_inches="tight")
        print(f"saved {args.output}")
    else:
        plt.show()


if __name__ == "__main__":
    main()
