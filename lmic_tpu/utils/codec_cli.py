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

# Container format magic doubles as a layout version: bump it whenever the
# header layout changes so files written by an older lmic-codec are REJECTED
# ("invalid file") instead of silently misparsed. 0x1C1D: RGBT header grew a
# master-channel byte and padding switched to centered (reference convention).
MAGIC = 0x1C1D
# previous layouts, recognized only to fail loudly (the auto-detect would
# otherwise misparse them as reference-container files)
RETIRED_MAGICS = {0x1C1C}
MODEL_IDS = {
    "bmshj2018-factorized": 0,
    "bmshj2018-hyperprior": 1,
    "mbt2018-mean": 2,
    "mbt2018": 3,
    "cheng2020-anchor": 4,
    "cheng2020-attn": 5,
    "guided": 6,
    "master": 7,
    "ssf2020": 8,
}
ID_TO_MODEL = {v: k for k, v in MODEL_IDS.items()}
METRIC_IDS = {"mse": 0, "ms-ssim": 1}


# Read-side hardening: every length/shape field in a container comes from
# the (untrusted) file, so reads are exact (truncation is an error, not a
# short buffer) and stream lengths are bounded by the bytes actually left
# in the file BEFORE allocating — a flipped length byte raises a clean
# ValueError instead of a MemoryError or a silently-short stream. The
# reference's own read_body (codec_rgbt.py:224-249) has no such guard.
# Latent shape dims are bounded at 2^16 (a 65k-latent side is a >4M-pixel
# image side — far beyond anything either framework codes).
_MAX_SHAPE = 1 << 16


def _read_exact(f, n):
    buf = f.read(n)
    if len(buf) != n:
        raise ValueError(
            f"corrupt container: wanted {n} bytes, file ends after "
            f"{len(buf)}"
        )
    return buf


def _read_stream(f, ln):
    pos = f.tell()
    end = f.seek(0, 2)
    f.seek(pos)
    if ln > end - pos:
        raise ValueError(
            f"corrupt container: stream length {ln} exceeds the "
            f"{end - pos} bytes left in the file"
        )
    return _read_exact(f, ln)


def _check_shape(shape):
    if any(not 0 < s <= _MAX_SHAPE for s in shape):
        raise ValueError(f"corrupt container: implausible shape {shape}")
    return shape


def write_uchars(f, values):
    f.write(struct.pack(f">{len(values)}B", *values))


def read_uchars(f, n):
    return struct.unpack(f">{n}B", _read_exact(f, n))


def write_uints(f, values):
    f.write(struct.pack(f">{len(values)}I", *values))


def read_uints(f, n):
    return struct.unpack(f">{n}I", _read_exact(f, 4 * n))


def write_floats(f, values):
    f.write(struct.pack(f">{len(values)}f", *values))


def read_floats(f, n):
    return struct.unpack(f">{n}f", _read_exact(f, 4 * n))


def write_body(f, shape, string_groups):
    write_uints(f, (shape[0], shape[1]))
    write_uchars(f, (len(string_groups),))
    for group in string_groups:
        write_uchars(f, (len(group),))
        for s in group:
            write_uints(f, (len(s),))
            f.write(s)


def read_body(f):
    shape = _check_shape(read_uints(f, 2))
    (n_groups,) = read_uchars(f, 1)
    groups = []
    for _ in range(n_groups):
        (n,) = read_uchars(f, 1)
        group = []
        for _ in range(n):
            (ln,) = read_uints(f, 1)
            group.append(_read_stream(f, ln))
        groups.append(group)
    return shape, groups


# ---------------------------------------------------------------------------
# Reference container (examples/codec_rgbt.py) — byte-compatible read/write
# ---------------------------------------------------------------------------
#
# Layout (codec_rgbt.py:141-249,355-386): NO magic; 1B model id (the
# fork's `models` dict enumeration order :71-72) + 1B (metric<<4 |
# quality-1), u32 (h, w), u8 bitdepth, [video: u32 num_frames], then per
# body u32 (shape_h, shape_w, n_strings) and per stream u32 length + raw
# bytes. The byte-interop family: the non-AR image codecs and ssf2020
# (same symbol order by construction), plus the AR image codecs via the
# raster-order compat scans (JointARCodec.compress_raster/
# decompress_raster — the fast wavefront order stays lmic-container
# only). master/guided remain lmic-only for now (their container embeds
# the guide-conditioned master AR streams).

REF_MODEL_IDS = {
    "bmshj2018-factorized": 0,
    "bmshj2018-hyperprior": 1,
    "mbt2018-mean": 2,
    "mbt2018": 3,
    "cheng2020-anchor": 4,
    "cheng2020-attn": 5,
    "ssf2020": 6,
    "master": 7,
    "guided": 8,
}
REF_ID_TO_MODEL = {v: k for k, v in REF_MODEL_IDS.items()}
REF_INTEROP_ARCHS = {
    "bmshj2018-factorized", "bmshj2018-hyperprior", "mbt2018-mean",
    "mbt2018", "cheng2020-anchor", "cheng2020-attn",
    "ssf2020",
}


def write_body_ref(f, shape, string_groups):
    write_uints(f, (shape[0], shape[1], len(string_groups)))
    for group in string_groups:
        assert len(group) == 1, "reference container is single-image"
        write_uints(f, (len(group[0]),))
        f.write(group[0])


def read_body_ref(f):
    h, w, n = read_uints(f, 3)
    _check_shape((h, w))
    if n > 255:  # the reference writes at most a few streams per body
        raise ValueError(f"corrupt container: implausible stream count {n}")
    return (h, w), [
        [_read_stream(f, read_uints(f, 1)[0])] for _ in range(n)
    ]


def encode_image_ref(input_path, output_path, codec, arch, quality,
                     metric="mse"):
    """Write a file the reference's decode_image reads byte-for-byte.

    Like the reference encoder (codec_rgbt.py:355 — its pad call is
    commented out), the image is coded UNPADDED; dimensions must already
    be multiples of 64.
    """
    x = _load(input_path)
    H, W = x.shape[1:3]
    if H % 64 or W % 64:
        raise SystemExit(
            "reference container encodes unpadded images; dimensions must "
            f"be multiples of 64 (got {H}x{W})"
        )
    # AR codecs emit the reference's per-pixel raster symbol order via
    # the compat scans; the non-AR family's order already matches
    out = (codec.compress_raster(x)
           if hasattr(codec, "compress_raster") else codec.compress(x))
    with open(output_path, "wb") as f:
        write_uchars(f, (REF_MODEL_IDS[arch],
                         (METRIC_IDS[metric] << 4) | (quality - 1)))
        write_uints(f, (H, W))
        write_uchars(f, (8,))
        write_body_ref(f, out["shape"], out["strings"])
    return Path(output_path).stat().st_size


def decode_image_ref(f, output_path, make_codec, arch, quality):
    H, W = _check_shape(read_uints(f, 2))
    (bitdepth,) = read_uchars(f, 1)
    shape, strings = read_body_ref(f)
    codec = make_codec(arch, quality)
    rec = (codec.decompress_raster(strings, shape)
           if hasattr(codec, "decompress_raster")
           else codec.decompress(strings, shape))
    _save(crop_center(rec["x_hat"], H, W), output_path)


def encode_video_ref(input_path, output_path, codec, quality, metric="mse",
                     num_frames: int = -1):
    """Reference video container (codec_rgbt.py:389-450): the reference's
    bare header (no magic) + write_body_ref frame bodies; the frame loop is
    shared with encode_video."""
    return encode_video(input_path, output_path, codec, quality, metric,
                        num_frames, container="reference")


def decode_video_ref(f, output_path, make_codec, quality):
    """Mirror of encode_video_ref / the reference's decode_video; shares
    the frame loop with decode_video."""
    return decode_video(f, output_path, make_codec, quality,
                        body_reader=read_body_ref)


def _load(path, channel=3):
    img = Image.open(path).convert("RGB" if channel == 3 else "L")
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr[None]


def _save(arr, path):
    # nan_to_num: a corrupted bitstream decodes to garbage symbols and can
    # reach the transforms as NaN — save black pixels, not a cast warning
    arr = np.clip(
        np.nan_to_num(arr[0]) * 255.0 + 0.5, 0, 255
    ).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def pad_to(x, p=64):
    """Centered zero pad to a multiple of p (the reference's pad
    convention, codec_rgbt.py:279-293)."""
    H, W = x.shape[1:3]
    nh, nw = -(-H // p) * p, -(-W // p) * p
    left, top = (nw - W) // 2, (nh - H) // 2
    return np.pad(
        x, ((0, 0), (top, nh - H - top), (left, nw - W - left), (0, 0))
    ), (H, W)


def crop_center(x, H, W):
    """Centered crop back to (H, W) — the inverse of pad_to
    (codec_rgbt.py:296-308)."""
    Hp, Wp = x.shape[1:3]
    top, left = (Hp - H) // 2, (Wp - W) // 2
    return x[:, top:top + H, left:left + W]


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
        H, W = _check_shape(read_uints(f, 2))
        (bitdepth,) = read_uchars(f, 1)
        shape, strings = read_body(f)
    codec = make_codec(arch, quality)
    rec = codec.decompress(strings, shape)
    _save(crop_center(rec["x_hat"], H, W), output_path)
    return arch, quality


def encode_rgbt(master_path, guide_path, output_path, guided_codec,
                master_codec, quality, metric="mse", channel=1):
    """Guide is coded + decoded, master conditioned on the reconstruction;
    beta/gamma go into the container (codec_rgbt.py:328-386). `channel` is
    the master's channel count; the guide gets the complementary modality
    (eval CLI convention: master=channel, guide=4-channel)."""
    x = _load(master_path, channel=channel)
    guided = _load(guide_path, channel=4 - channel)
    # the RGBT container stores no padding geometry (reference convention:
    # codec_rgbt.py hard-wires aligned sizes), so reject bad dimensions
    # loudly BEFORE the expensive guide coding — same policy the codec
    # itself enforces (MasterCodec.check_geometry)
    try:
        master_codec.check_geometry(
            *x.shape[1:3], tuple(guided.shape[1:3]), guide_what="guide image"
        )
    except ValueError as e:
        raise SystemExit(str(e))
    # reconstruct=True yields the decoder's exact x_hat from the encode
    # scan (bit-equal by the roundtrip invariant) — no decode pass needed
    # on the encoder side, identical container bytes
    g_out = guided_codec.compress(guided, hidden=False, reconstruct=True)
    m_out = master_codec.compress(x, g_out["x_hat"])
    beta = np.asarray(m_out["beta"]).reshape(-1)
    gamma = np.asarray(m_out["gamma"]).reshape(-1)
    with open(output_path, "wb") as f:
        write_uints(f, (MAGIC,))
        write_uchars(f, (MODEL_IDS["master"],
                         (METRIC_IDS[metric] << 4) | (quality - 1)))
        write_uints(f, (x.shape[1], x.shape[2]))
        # channel byte: decoding must rebuild the SAME guided/master pair
        # regardless of the decoder's --channel flag
        write_uchars(f, (8, channel))
        write_floats(f, beta.tolist())
        write_floats(f, gamma.tolist())
        write_body(f, m_out["shape"], m_out["strings"])
    return Path(output_path).stat().st_size


def decode_rgbt(input_path, guide_path, output_path, build_guided,
                build_master):
    """The decoder re-codes the guide from its own source
    (codec_rgbt.py:538-544). The master channel count comes from the
    container header; `build_guided`/`build_master` are channel->codec
    factories."""
    with open(input_path, "rb") as f:
        (magic,) = read_uints(f, 1)
        assert magic == MAGIC
        model_id, mq = read_uchars(f, 2)
        H, W = _check_shape(read_uints(f, 2))
        bitdepth, channel = read_uchars(f, 2)
        beta = np.asarray(read_floats(f, 64), np.float32).reshape(1, 1, 1, 64)
        gamma = np.asarray(read_floats(f, 64), np.float32).reshape(
            1, 1, 1, 64
        )
        shape, strings = read_body(f)
    guided_codec = build_guided(4 - channel)
    master_codec = build_master(channel)
    guided = _load(guide_path, channel=4 - channel)
    # validate the header geometry on its own first: a corrupt/foreign
    # stream must be blamed on the bitstream, not on the guide image
    try:
        gH, gW = master_codec.check_geometry(H, W)
    except ValueError as e:
        raise SystemExit(f"corrupt or incompatible RGBT bitstream: {e}")
    # the header carries the master geometry, so a wrong-sized guide source
    # is detectable up front — fail with the same message the encoder gives
    # instead of a raw XLA shape error deep inside the aligners
    if guided.shape[1:3] != (gH, gW):
        raise SystemExit(
            f"guide image must be {gH}x{gW} for this {H}x{W} master "
            f"bitstream at channel={channel}; got "
            f"{guided.shape[1]}x{guided.shape[2]} — use the guide the "
            "stream was encoded with (or a same-size copy)"
        )
    # the guide re-code is a local deterministic computation (the decoder
    # has the guide source): reconstruct=True yields the decode-identical
    # x_hat/gs* straight from the encode scan, skipping a decode pass
    g_out = guided_codec.compress(guided, hidden=False, reconstruct=True)
    rec = master_codec.decompress(
        {"strings": strings, "shape": shape, "beta": beta, "gamma": gamma},
        {"x_hat": g_out["x_hat"], "hidden": g_out["hidden_dec"]},
    )
    _save(crop_center(rec["x_hat"], H, W), output_path)


def encode_rgbt_ref(master_path, guide_path, output_path, guided_codec,
                    master_codec, quality, metric="mse", channel=1):
    """Reference master container (codec_rgbt.py:328-386): bare header +
    (h, w) + bitdepth + 64 beta + 64 gamma floats + body, the master AR
    streams in the reference's raster symbol order
    (MasterCodec.compress(order="raster")). The guide is re-coded locally
    on both sides and never stored, exactly like the reference app."""
    x = _load(master_path, channel=channel)
    guided = _load(guide_path, channel=4 - channel)
    try:
        master_codec.check_geometry(
            *x.shape[1:3], tuple(guided.shape[1:3]), guide_what="guide image"
        )
    except ValueError as e:
        raise SystemExit(str(e))
    g_out = guided_codec.compress(guided, hidden=False, reconstruct=True)
    m_out = master_codec.compress(x, g_out["x_hat"], order="raster")
    beta = np.asarray(m_out["beta"], np.float32).reshape(-1)
    gamma = np.asarray(m_out["gamma"], np.float32).reshape(-1)
    with open(output_path, "wb") as f:
        write_uchars(f, (REF_MODEL_IDS["master"],
                         (METRIC_IDS[metric] << 4) | (quality - 1)))
        write_uints(f, (x.shape[1], x.shape[2]))
        write_uchars(f, (8,))
        write_floats(f, beta.tolist())
        write_floats(f, gamma.tolist())
        write_body_ref(f, m_out["shape"], m_out["strings"])
    return Path(output_path).stat().st_size


def decode_rgbt_ref(f, guide_path, output_path, build_guided, build_master,
                    channel=1):
    """Mirror of encode_rgbt_ref / the reference's master decode_image
    (codec_rgbt.py:511-554). The reference header does NOT carry the
    master channel count (its app takes it from the CLI, deriving the
    guide path by substitution) — `channel` must match the encode."""
    H, W = read_uints(f, 2)
    (bitdepth,) = read_uchars(f, 1)
    beta = np.asarray(read_floats(f, 64), np.float32).reshape(1, 1, 1, 64)
    gamma = np.asarray(read_floats(f, 64), np.float32).reshape(1, 1, 1, 64)
    shape, strings = read_body_ref(f)
    guided_codec = build_guided(4 - channel)
    master_codec = build_master(channel)
    guided = _load(guide_path, channel=4 - channel)
    try:
        gH, gW = master_codec.check_geometry(H, W)
    except ValueError as e:
        raise SystemExit(f"corrupt or incompatible RGBT bitstream: {e}")
    if guided.shape[1:3] != (gH, gW):
        raise SystemExit(
            f"guide image must be {gH}x{gW} for this {H}x{W} master "
            f"bitstream at channel={channel}; got "
            f"{guided.shape[1]}x{guided.shape[2]}"
        )
    g_out = guided_codec.compress(guided, hidden=False, reconstruct=True)
    rec = master_codec.decompress(
        {"strings": strings, "shape": shape, "beta": beta, "gamma": gamma},
        {"x_hat": g_out["x_hat"], "hidden": g_out["hidden_dec"]},
        order="raster",
    )
    _save(crop_center(rec["x_hat"], H, W), output_path)


def encode_video(input_path, output_path, codec, quality, metric="mse",
                 num_frames: int = -1, container: str = "native"):
    """ssf2020 file coding on a raw YUV420 sequence: one reference chain
    over the whole sequence — keyframe body, then per inter frame one
    body for motion and one for residual (codec_rgbt.py:389-450).
    container="reference" writes the reference's bare header + body layout
    (byte-compatible with its decode_video) instead of ours."""
    from lmic_tpu.datasets.rawvideo import RawVideoSequence, VideoFormat
    from lmic_tpu.utils.video_eval import pad_frames, yuv420_frame_to_rgb

    ref = container == "reference"
    body_writer = write_body_ref if ref else write_body
    seq = RawVideoSequence.from_file(str(input_path))
    if seq.video_format != VideoFormat.YUV420:
        raise NotImplementedError(f"unsupported format: {seq.video_format}")
    n = len(seq) if num_frames < 0 else min(num_frames, len(seq))
    with open(output_path, "wb") as f:
        if not ref:
            write_uints(f, (MAGIC,))
        write_uchars(f, ((REF_MODEL_IDS if ref else MODEL_IDS)["ssf2020"],
                         (METRIC_IDS[metric] << 4) | (quality - 1)))
        write_uints(f, (seq.height, seq.width))
        write_uchars(f, (seq.bitdepth,))
        write_uints(f, (n,))
        x_ref = None
        for i in range(n):
            x, _ = pad_frames(yuv420_frame_to_rgb(seq[i], seq.bitdepth),
                              p=128)
            if i == 0:
                x_ref, out = codec.encode_keyframe(x)
                body_writer(f, out["shape"], out["strings"])
            else:
                x_ref, out = codec.encode_inter(x, x_ref)
                for part in ("motion", "residual"):
                    body_writer(f, out["shape"][part], out["strings"][part])
            x_ref = np.clip(np.asarray(x_ref), 0.0, 1.0)
    seq.close()
    return Path(output_path).stat().st_size


def _rgb_to_yuv420_planes(rgb, bitdepth=8):
    """(1, H, W, 3) float RGB -> (y, u, v) integer planes (BT.709,
    avg-pool chroma subsampling like the reference's convert_rgb_yuv420)."""
    import jax.numpy as jnp

    from lmic_tpu.transforms import rgb2ycbcr, yuv_444_to_420

    max_val = 2**bitdepth - 1
    dtype = np.uint8 if bitdepth == 8 else np.uint16
    y, u, v = yuv_444_to_420(rgb2ycbcr(jnp.asarray(rgb)))
    return tuple(
        np.clip(
            np.round(np.asarray(t)[0, :, :, 0] * max_val), 0, max_val
        ).astype(dtype)
        for t in (y, u, v)
    )


def decode_video(f, output_path, make_codec, quality,
                 body_reader=read_body):
    """Mirror of encode_video; writes the reconstruction back as raw
    YUV420 (or the last frame as an image for non-.yuv outputs).
    `body_reader` selects the container body layout (read_body_ref for
    reference-written files)."""
    H, W = _check_shape(read_uints(f, 2))
    (bitdepth,) = read_uchars(f, 1)
    (n,) = read_uints(f, 1)
    if n > 1_000_000:
        raise ValueError(f"corrupt container: implausible frame count {n}")
    codec = make_codec("ssf2020", quality)
    out_is_yuv = str(output_path).endswith(".yuv")
    x_ref = None
    img = None
    for i in range(n):
        if i == 0:
            shape, strings = body_reader(f)
            x_ref = codec.decode_keyframe(strings, shape)
        else:
            mshape, mstrings = body_reader(f)
            rshape, rstrings = body_reader(f)
            x_ref = codec.decode_inter(
                x_ref,
                {"motion": mstrings, "residual": rstrings},
                {"motion": mshape, "residual": rshape},
            )
        x_ref = np.clip(np.asarray(x_ref), 0.0, 1.0)
        img = crop_center(x_ref, H, W)
        if out_is_yuv:
            y, u, v = _rgb_to_yuv420_planes(img, bitdepth)
            with open(output_path, "wb" if i == 0 else "ab") as fout:
                for plane in (y, u, v):
                    plane.tofile(fout)
    if not out_is_yuv and img is not None:
        _save(img, output_path)
    return n


def parse_args(argv):
    p = argparse.ArgumentParser(description="lmic_tpu file codec")
    sub = p.add_subparsers(dest="command", required=True)
    e = sub.add_parser("encode")
    e.add_argument("input", help="image, .yuv sequence (ssf2020), or the "
                                 "master image when --guide is given")
    e.add_argument("-o", "--output", default="out.bin")
    e.add_argument("--arch", default="bmshj2018-factorized")
    e.add_argument("-q", "--quality", type=int, default=1)
    e.add_argument("--checkpoint", default=None)
    e.add_argument("--frames", type=int, default=-1,
                   help="ssf2020: number of frames to code (-1 = all)")
    e.add_argument("--guide", default=None,
                   help="RGBT: guide-image path (arch becomes master)")
    e.add_argument("--guided-checkpoint", default=None,
                   help="RGBT: deployment checkpoint for the guide codec")
    e.add_argument("--channel", type=int, default=1,
                   help="RGBT: master channel count")
    e.add_argument("--container", choices=["lmic", "reference"],
                   default="lmic",
                   help="bitstream container: this framework's (default) "
                        "or the reference codec app's byte-compatible "
                        "layout (non-AR + ssf2020 family; "
                        "codec_rgbt.py:188-249). Decode auto-detects.")
    d = sub.add_parser("decode")
    d.add_argument("input")
    d.add_argument("-o", "--output", default="out.png",
                   help="image path, or .yuv for video bitstreams")
    d.add_argument("--checkpoint", default=None)
    d.add_argument("--guide", default=None,
                   help="RGBT: guide-image path (the master file does not "
                        "embed the guide bitstream; codec_rgbt.py:538-544)")
    d.add_argument("--guided-checkpoint", default=None)
    # --channel matters ONLY for reference-container master files: the
    # reference header does not record the master channel count (its app
    # takes it from the CLI — codec_rgbt.py:511-524). Native lmic master
    # files carry a channel byte and ignore this flag.
    d.add_argument("--channel", type=int, default=1,
                   help="reference-container master files: the master "
                        "channel count used at encode (1=thermal master)")
    return p.parse_args(argv)


def _build(arch, quality, checkpoint=None, channel=3):
    if arch == "ssf2020":
        codec = zoo.create_video_model("ssf2020", quality)
    else:
        codec = zoo.create_model(arch, quality, channel=channel)
    if checkpoint:
        from lmic_tpu.utils.checkpoint import load_updated_model

        codec = load_updated_model(checkpoint, codec)
    else:
        codec.update(force=True)
    return codec


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])
    if args.command == "encode":
        t0 = time.perf_counter()
        reference = getattr(args, "container", "lmic") == "reference"
        if args.guide is not None or args.arch == "master":
            if args.guide is None:
                raise SystemExit("encode --arch master requires --guide")
            guided = _build("guided", args.quality, args.guided_checkpoint,
                            channel=4 - args.channel)
            master = _build("master", args.quality, args.checkpoint,
                            channel=args.channel)
            enc = encode_rgbt_ref if reference else encode_rgbt
            size = enc(args.input, args.guide, args.output,
                       guided, master, args.quality,
                       channel=args.channel)
        elif args.arch == "ssf2020":
            codec = _build("ssf2020", args.quality, args.checkpoint)
            enc = encode_video_ref if reference else encode_video
            size = enc(args.input, args.output, codec,
                       args.quality, num_frames=args.frames)
        else:
            if args.arch not in MODEL_IDS:
                raise SystemExit(
                    f"arch {args.arch!r} has no container id; file coding "
                    f"supports: {', '.join(sorted(MODEL_IDS))}"
                )
            if reference and args.arch not in REF_INTEROP_ARCHS:
                raise SystemExit(
                    "reference container supports the byte-interop family "
                    f"only: {', '.join(sorted(REF_INTEROP_ARCHS))}"
                )
            codec = _build(args.arch, args.quality, args.checkpoint)
            enc = encode_image_ref if reference else encode_image
            size = enc(args.input, args.output, codec, args.arch,
                       args.quality)
        print(f"encoded {size} bytes in {time.perf_counter()-t0:.2f}s")
    else:
        try:
            t0 = time.perf_counter()
            # container auto-detect: ours leads with a u32 magic; the
            # reference's first byte is a small model id whose following
            # bytes parse as (h, w) far below the magic value
            with open(args.input, "rb") as f:
                head = f.read(4)
            word = struct.unpack(">I", head)[0] if len(head) == 4 else None
            if word in RETIRED_MAGICS:
                raise SystemExit(
                    f"{args.input}: written by an older lmic-codec container "
                    f"version (magic 0x{word:04X}); re-encode with this version"
                )
            ours = word == MAGIC
            if ours:
                with open(args.input, "rb") as f:
                    read_uints(f, 1)
                    model_id, mq = read_uchars(f, 2)
                    quality = (mq & 0x0F) + 1
                    arch = ID_TO_MODEL[model_id]
                    if arch == "ssf2020":
                        decode_video(
                            f, args.output,
                            lambda a, q: _build(a, q, args.checkpoint), quality,
                        )
                if arch == "master":
                    if args.guide is None:
                        raise SystemExit(
                            "decoding a master file requires --guide"
                        )
                    decode_rgbt(
                        args.input, args.guide, args.output,
                        lambda ch: _build("guided", quality,
                                          args.guided_checkpoint, channel=ch),
                        lambda ch: _build("master", quality, args.checkpoint,
                                          channel=ch),
                    )
                elif arch != "ssf2020":
                    decode_image(
                        args.input, args.output,
                        lambda a, q: _build(a, q, args.checkpoint),
                    )
            else:  # reference container
                with open(args.input, "rb") as f:
                    model_id, mq = read_uchars(f, 2)
                    quality = (mq & 0x0F) + 1
                    arch = REF_ID_TO_MODEL.get(model_id)
                    if arch not in REF_INTEROP_ARCHS | {"master"}:
                        raise SystemExit(
                            f"reference-container arch {arch!r} is outside the "
                            "interop family: "
                            f"{', '.join(sorted(REF_INTEROP_ARCHS))}, master"
                        )
                    if arch == "ssf2020":
                        decode_video_ref(
                            f, args.output,
                            lambda a, q: _build(a, q, args.checkpoint), quality,
                        )
                    elif arch == "master":
                        if args.guide is None:
                            raise SystemExit(
                                "decoding a master file requires --guide"
                            )
                        decode_rgbt_ref(
                            f, args.guide, args.output,
                            lambda ch: _build("guided", quality,
                                              args.guided_checkpoint,
                                              channel=ch),
                            lambda ch: _build("master", quality,
                                              args.checkpoint, channel=ch),
                            channel=args.channel,
                        )
                    else:
                        decode_image_ref(
                            f, args.output,
                            lambda a, q: _build(a, q, args.checkpoint),
                            arch, quality,
                        )
            print(f"decoded [{arch} q={quality}] in "
                  f"{time.perf_counter()-t0:.2f}s")
        except ValueError as e:
            # read-side container guards raise ValueError with a
            # "corrupt container" message; surface those as a clean
            # CLI error instead of a traceback
            if "corrupt container" not in str(e):
                raise
            raise SystemExit(f"{args.input}: {e}")


if __name__ == "__main__":
    main()
