"""File codec CLI — the examples/codec_rgbt.py equivalent.

Binary container format (mirroring codec_rgbt.py:141-249):
  header:  magic u16 | model-id u8 | (metric<<4 | quality-1) u8
  size:    original (h, w) as u32 pair, bitdepth u8
  master:  64 float32 beta + 64 float32 gamma (lossless side info,
           codec_rgbt.py:377-380)
  body:    latent shape (h, w) u32 pair, then per stream group: number of
           strings u8, then per string u32 length + raw bytes

Like the reference decoder (codec_rgbt.py:511-554), the RGBT master file
does NOT embed the guide bitstream: the decoder re-codes the guide from its
own file/path and uses its reconstruction + hidden maps.
"""

from __future__ import annotations

import argparse
import struct
import sys
import time
from pathlib import Path

import numpy as np
from PIL import Image

from lmic_tpu import zoo

MAGIC = 0x1C1C
MODEL_IDS = {
    "bmshj2018-factorized": 0,
    "bmshj2018-hyperprior": 1,
    "mbt2018-mean": 2,
    "mbt2018": 3,
    "cheng2020-anchor": 4,
    "cheng2020-attn": 5,
    "guided": 6,
    "master": 7,
}
ID_TO_MODEL = {v: k for k, v in MODEL_IDS.items()}
METRIC_IDS = {"mse": 0, "ms-ssim": 1}


def write_uchars(f, values):
    f.write(struct.pack(f">{len(values)}B", *values))


def read_uchars(f, n):
    return struct.unpack(f">{n}B", f.read(n))


def write_uints(f, values):
    f.write(struct.pack(f">{len(values)}I", *values))


def read_uints(f, n):
    return struct.unpack(f">{n}I", f.read(4 * n))


def write_floats(f, values):
    f.write(struct.pack(f">{len(values)}f", *values))


def read_floats(f, n):
    return struct.unpack(f">{n}f", f.read(4 * n))


def write_body(f, shape, string_groups):
    write_uints(f, (shape[0], shape[1]))
    write_uchars(f, (len(string_groups),))
    for group in string_groups:
        write_uchars(f, (len(group),))
        for s in group:
            write_uints(f, (len(s),))
            f.write(s)


def read_body(f):
    shape = read_uints(f, 2)
    (n_groups,) = read_uchars(f, 1)
    groups = []
    for _ in range(n_groups):
        (n,) = read_uchars(f, 1)
        group = []
        for _ in range(n):
            (ln,) = read_uints(f, 1)
            group.append(f.read(ln))
        groups.append(group)
    return shape, groups


def _load(path, channel=3):
    img = Image.open(path).convert("RGB" if channel == 3 else "L")
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr[None]


def _save(arr, path):
    arr = np.clip(arr[0] * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def pad_to(x, p=64):
    H, W = x.shape[1:3]
    nh, nw = -(-H // p) * p, -(-W // p) * p
    return np.pad(x, ((0, 0), (0, nh - H), (0, nw - W), (0, 0))), (H, W)


def encode_image(input_path, output_path, codec, arch, quality,
                 metric="mse"):
    x = _load(input_path)
    xp, (H, W) = pad_to(x)
    out = codec.compress(xp)
    with open(output_path, "wb") as f:
        write_uints(f, (MAGIC,))
        write_uchars(f, (MODEL_IDS[arch],
                         (METRIC_IDS[metric] << 4) | (quality - 1)))
        write_uints(f, (H, W))
        write_uchars(f, (8,))  # bitdepth
        write_body(f, out["shape"], out["strings"])
    return Path(output_path).stat().st_size


def decode_image(input_path, output_path, make_codec):
    with open(input_path, "rb") as f:
        (magic,) = read_uints(f, 1)
        assert magic == MAGIC, "invalid file"
        model_id, mq = read_uchars(f, 2)
        quality = (mq & 0x0F) + 1
        arch = ID_TO_MODEL[model_id]
        H, W = read_uints(f, 2)
        (bitdepth,) = read_uchars(f, 1)
        shape, strings = read_body(f)
    codec = make_codec(arch, quality)
    rec = codec.decompress(strings, shape)
    _save(rec["x_hat"][:, :H, :W], output_path)
    return arch, quality


def encode_rgbt(master_path, guide_path, output_path, guided_codec,
                master_codec, quality, metric="mse"):
    """Guide is coded + decoded, master conditioned on the reconstruction;
    beta/gamma go into the container (codec_rgbt.py:328-386)."""
    x = _load(master_path, channel=3)
    guided = _load(guide_path, channel=1)
    g_out = guided_codec.compress(guided)
    g_dec = guided_codec.decompress(g_out["strings"], g_out["shape"])
    m_out = master_codec.compress(x, g_dec["x_hat"])
    beta = np.asarray(m_out["beta"]).reshape(-1)
    gamma = np.asarray(m_out["gamma"]).reshape(-1)
    with open(output_path, "wb") as f:
        write_uints(f, (MAGIC,))
        write_uchars(f, (MODEL_IDS["master"],
                         (METRIC_IDS[metric] << 4) | (quality - 1)))
        write_uints(f, (x.shape[1], x.shape[2]))
        write_uchars(f, (8,))
        write_floats(f, beta.tolist())
        write_floats(f, gamma.tolist())
        write_body(f, m_out["shape"], m_out["strings"])
    return Path(output_path).stat().st_size


def decode_rgbt(input_path, guide_path, output_path, guided_codec,
                master_codec):
    """The decoder re-codes the guide from its own source
    (codec_rgbt.py:538-544)."""
    with open(input_path, "rb") as f:
        (magic,) = read_uints(f, 1)
        assert magic == MAGIC
        model_id, mq = read_uchars(f, 2)
        H, W = read_uints(f, 2)
        (bitdepth,) = read_uchars(f, 1)
        beta = np.asarray(read_floats(f, 64), np.float32).reshape(1, 1, 1, 64)
        gamma = np.asarray(read_floats(f, 64), np.float32).reshape(
            1, 1, 1, 64
        )
        shape, strings = read_body(f)
    guided = _load(guide_path, channel=1)
    g_out = guided_codec.compress(guided)
    g_dec = guided_codec.decompress(g_out["strings"], g_out["shape"])
    rec = master_codec.decompress(
        {"strings": strings, "shape": shape, "beta": beta, "gamma": gamma},
        g_dec,
    )
    _save(rec["x_hat"][:, :H, :W], output_path)


def parse_args(argv):
    p = argparse.ArgumentParser(description="lmic_tpu file codec")
    sub = p.add_subparsers(dest="command", required=True)
    e = sub.add_parser("encode")
    e.add_argument("input")
    e.add_argument("-o", "--output", default="out.bin")
    e.add_argument("--arch", default="bmshj2018-factorized")
    e.add_argument("-q", "--quality", type=int, default=1)
    e.add_argument("--checkpoint", default=None)
    d = sub.add_parser("decode")
    d.add_argument("input")
    d.add_argument("-o", "--output", default="out.png")
    d.add_argument("--checkpoint", default=None)
    return p.parse_args(argv)


def _build(arch, quality, checkpoint=None):
    codec = zoo.create_model(arch, quality)
    if checkpoint:
        from lmic_tpu.utils.checkpoint import load_updated_model

        codec = load_updated_model(checkpoint, codec)
    else:
        codec.update(force=True)
    return codec


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.command == "encode":
        codec = _build(args.arch, args.quality, args.checkpoint)
        t0 = time.perf_counter()
        size = encode_image(args.input, args.output, codec, args.arch,
                            args.quality)
        print(f"encoded {size} bytes in {time.perf_counter()-t0:.2f}s")
    else:
        t0 = time.perf_counter()
        arch, q = decode_image(
            args.input, args.output,
            lambda a, q: _build(a, q, args.checkpoint),
        )
        print(f"decoded [{arch} q={q}] in {time.perf_counter()-t0:.2f}s")


if __name__ == "__main__":
    main()
