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
    if entropy_estimation:
        g_fwd = guided_codec.module.apply(
            guided_codec.variables, jnp.asarray(guided), training=False
        )
        hidden = {k: v for k, v in g_fwd["hidden"].items()
                  if k.startswith("gs")}
        m_fwd = master_codec.module.apply(
            master_codec.variables, jnp.asarray(x),
            g_fwd["x_hat"], hidden, training=False,
        )
        bits = sum(
            float(-jnp.sum(jnp.log2(lik)))
            for lik in m_fwd["likelihoods"].values()
        ) + 64 * 2 * 4 * 8
        x_hat = jnp.clip(m_fwd["x_hat"], 0.0, 1.0)  # reference clamp_(0,1)
        return {
            "psnr": float(psnr(x_hat, jnp.asarray(x))),
            "ms-ssim": float(ms_ssim(x_hat, jnp.asarray(x))),
            "bpp": bits / num_pixels,
        }
    t0 = time.perf_counter()
    # the encoder reconstructs the guide from its own encode scan
    # (bit-equal to a decompress of the streams) instead of decoding its
    # own streams like the reference flow does
    g_out = guided_codec.compress(guided, hidden=False, reconstruct=True)
    m_out = master_codec.compress(x, g_out["x_hat"])
    enc_time = time.perf_counter() - t0
    g_dec = {"x_hat": g_out["x_hat"], "hidden": g_out["hidden_dec"]}
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


def eval_rd_pair(guided_codec, master_codec, x, guided,
                 entropy_estimation: bool = False) -> Dict[str, float]:
    """Paired eval for the `_R`/`_D` variants (same-size modalities).

    The reference fork ships no eval CLI for these models; the metric set
    mirrors the guided/master pair minus the beta/gamma side info the
    `_D` architecture does not transmit (it fuses hidden maps instead —
    google.py:1006-1423)."""
    num_pixels = x.shape[0] * x.shape[1] * x.shape[2]
    if entropy_estimation:
        g_fwd = guided_codec.module.apply(
            guided_codec.variables, jnp.asarray(guided), training=False
        )
        m_fwd = master_codec.module.apply(
            master_codec.variables, jnp.asarray(x), g_fwd["hidden"],
            training=False,
        )
        bits = sum(
            float(-jnp.sum(jnp.log2(lik)))
            for lik in m_fwd["likelihoods"].values()
        )
        x_hat = jnp.clip(m_fwd["x_hat"], 0.0, 1.0)  # reference clamp_(0,1)
        return {
            "psnr": float(psnr(x_hat, jnp.asarray(x))),
            "ms-ssim": float(ms_ssim(x_hat, jnp.asarray(x))),
            "bpp": bits / num_pixels,
        }
    t0 = time.perf_counter()
    g_out = guided_codec.compress(guided)
    g_dec = guided_codec.decompress(g_out["strings"], g_out["shape"])
    m_out = master_codec.compress(x, g_out["hidden"])
    enc_time = time.perf_counter() - t0
    t0 = time.perf_counter()
    m_dec = master_codec.decompress(
        m_out["strings"], m_out["shape"], g_dec["hidden"]
    )
    dec_time = time.perf_counter() - t0
    bits = sum(len(s) for grp in m_out["strings"] for s in grp) * 8.0
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
                   help="bf16 matmul precision for the whole coding graph "
                        "(the torch reference's .half() eval analogue). "
                        "Entropy parameters are derived in bf16 too, so "
                        "bitstreams written under --half must also be "
                        "decoded under --half")
    # RGBT paired mode (reference __main__rgbt.py): --arch master +
    # checkpoints for both stages; dataset dir holds the master modality
    # with the guide found by RGB<->thermal_8_bit path substitution
    p.add_argument("--rgbt", action="store_true",
                   help="paired guided+master eval over ImageFolderTest")
    p.add_argument("--guided-checkpoint", default=None)
    p.add_argument("--crop-size", type=int, nargs=2, default=(512, 640),
                   help="master-modality crop; both sides must be "
                        "divisible by 64 (reference hard-wires 512 640)")
    p.add_argument("--test-ids", default=None,
                   help="comma-separated id substrings, or 'all' "
                        "(default: the reference's 20 fixed FLIR ids)")
    return p.parse_args(argv)


def run_rgbt(args) -> List[Dict[str, float]]:
    from lmic_tpu.datasets.image import ImageFolderTest
    from lmic_tpu.utils.checkpoint import load_updated_model

    rd_pair = args.arch.endswith("_D")
    if rd_pair:
        # `cheng2020-attn_D` pairs with `cheng2020-attn_R` etc.; the
        # modalities are same-size (google.py:746,1006)
        # _D init needs >=128 px: ESA's valid-padded 7x7 maxpool vanishes
        # below 16 px at the deepest fusion level
        guided_codec = zoo.create_model(
            args.arch[:-2] + "_R", args.quality, channel=4 - args.channel,
            input_size=(128, 128),
        )
        master_codec = zoo.create_model(
            args.arch, args.quality, channel=args.channel,
            input_size=(128, 128),
        )
    else:
        guided_codec = zoo.create_model(
            "guided", args.quality, channel=4 - args.channel,
            input_size=(64, 64),
        )
        master_codec = zoo.create_model(
            "master", args.quality, channel=args.channel,
            input_size=(128, 128),
        )
    if args.guided_checkpoint:
        guided_codec = load_updated_model(args.guided_checkpoint,
                                          guided_codec)
    else:
        guided_codec.update(force=True)
    if args.checkpoint:
        master_codec = load_updated_model(args.checkpoint, master_codec)
    else:
        master_codec.update(force=True)

    if args.test_ids == "all":
        test_ids = [""]  # substring match: everything
    elif args.test_ids:
        test_ids = args.test_ids.split(",")
    else:
        test_ids = None  # the reference's fixed FLIR validation ids
    ds = ImageFolderTest(args.dataset, crop_size=tuple(args.crop_size),
                         channel=args.channel, test_ids=test_ids)
    results = []
    warmed = False
    for i in range(len(ds)):
        x, guided = ds[i]
        if rd_pair:
            from lmic_tpu.datasets.image import _resize_np

            guided = _resize_np(guided, x.shape[:2])  # same-size pair
            m = eval_rd_pair(
                guided_codec, master_codec, x[None], guided[None],
                entropy_estimation=args.entropy_estimation,
            )
        else:
            m = eval_rgbt_pair(
                guided_codec, master_codec, x[None], guided[None],
                entropy_estimation=args.entropy_estimation,
            )
        if not warmed and not args.entropy_estimation:
            # first call included jit compiles: redo it so the recorded
            # encoding/decoding_time measure coding, not compilation
            warmed = True
            continue_fn = (eval_rd_pair if rd_pair else eval_rgbt_pair)
            m = continue_fn(
                guided_codec, master_codec, x[None], guided[None],
                entropy_estimation=False,
            )
        warmed = True
        results.append(m)
        print(f"[{i}] " + " ".join(f"{k}={v:.4f}" for k, v in m.items()),
              flush=True)
    return results


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.rgbt:
        codec, files = None, []
    else:
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

    # --half: bf16 matmul passes on the MXU for every jit under this
    # context — transforms AND the entropy-parameter graphs. Encode and
    # decode below run in the same process/context so they stay
    # consistent, but a --half bitstream is only decodable under --half.
    precision_ctx = (
        jax.default_matmul_precision("bfloat16") if args.half
        else contextlib.nullcontext()
    )
    results: List[Dict[str, float]] = []
    with precision_ctx:
        if args.rgbt:
            results = run_rgbt(args)
            files = []
        warmed = False
        for f in files:
            x = load_image(f, args.channel)
            if args.entropy_estimation:
                m = eval_image_forward(codec, x)
            else:
                m = eval_image_codec(codec, x)
                if not warmed:
                    # first call included jit compiles: redo it so the
                    # recorded timings measure coding, not compilation
                    m = eval_image_codec(codec, x)
                warmed = True
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
