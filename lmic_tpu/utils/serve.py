"""lmic-serve: HTTP serving daemon for codecs and AOT bundles.

Deployment infrastructure with no reference counterpart (the reference
stops at file CLIs): serve a codec's uint8 fast path over HTTP so a
fleet front-end can talk to a TPU host without importing model code.
Pairs naturally with AOT serving bundles (utils/aot.py) — one bundle
directory per (arch, quality, shape) — but also serves a live updated
checkpoint. stdlib-only (http.server), so it runs in any worker image.

Wire format (big-endian, the same struct notation as the container
helpers in utils/codec_cli.py that do the body framing):

  POST /compress   request : u8 ndim, ndim x u32 dims, raw uint8 pixels
                   response: image family -> one body
                             (write_body: u32 h, w; u8 n_groups; per
                             group u8 n, per string u32 len + bytes);
                             video -> u32 n_frames, then per frame a
                             u8 body count followed by 1 body (keyframe)
                             or 2 bodies (inter: motion, residual)
  POST /decompress request : the /compress response, echoed back
                   response: u8 ndim, ndim x u32 dims, raw uint8 pixels
  GET  /meta       response: JSON {family, input_shape, ...}

RGBT pair serving (family "rgbt", the paper's guided/master models):
/compress takes TWO pixel blocks (master, then guide) and returns the
master body + 64 f32 beta + 64 f32 gamma (the guide stream is not
transmitted — reference convention); /decompress takes that payload
with the guide pixel block appended and returns the master pixels.

Requests are serialized through one lock (socket reads/writes stay
outside it): the codec owns device buffers and a host coder worker, so
concurrency comes from batching (the B axis of the served shape — the
RGBT pair is served single-image), not from racing requests.
"""

from __future__ import annotations

import collections
import hashlib
import io
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from lmic_tpu.utils.codec_cli import (
    read_body,
    read_floats,
    read_uchars,
    read_uints,
    write_body,
    write_floats,
    write_uchars,
    write_uints,
)

__all__ = ["make_server", "main"]


def _write_pixels(f, arr):
    write_uchars(f, (arr.ndim,))
    write_uints(f, arr.shape)
    f.write(arr.tobytes())


def _read_pixels(f):
    (ndim,) = read_uchars(f, 1)
    shape = read_uints(f, ndim)
    n = int(np.prod(shape))
    buf = f.read(n)
    if len(buf) != n:
        raise ValueError(f"expected {n} pixel bytes, got {len(buf)}")
    return np.frombuffer(buf, np.uint8).reshape(shape)


def _encode_response(out, video):
    f = io.BytesIO()
    if video:
        # per GOP frame: keyframe -> one body; inter -> motion + residual
        # bodies (the shapes mirror ScaleSpaceFlowCodec.compress output)
        strings, shapes = out
        write_uints(f, (len(strings),))
        for frame_strings, frame_shape in zip(strings, shapes):
            if isinstance(frame_strings, dict):
                write_uchars(f, (2,))
                for part in ("motion", "residual"):
                    write_body(f, frame_shape[part], frame_strings[part])
            else:
                write_uchars(f, (1,))
                write_body(f, frame_shape, frame_strings)
    else:
        write_body(f, out["shape"], out["strings"])
    return f.getvalue()


def _decode_request(f, video):
    if video:
        (n_frames,) = read_uints(f, 1)
        strings, shapes = [], []
        for _ in range(n_frames):
            (n_bodies,) = read_uchars(f, 1)
            if n_bodies == 2:
                mshape, mstrings = read_body(f)
                rshape, rstrings = read_body(f)
                strings.append({"motion": mstrings, "residual": rstrings})
                shapes.append({"motion": mshape, "residual": rshape})
            else:
                shape, groups = read_body(f)
                strings.append(groups)
                shapes.append(shape)
        return strings, shapes
    shape, groups = read_body(f)
    return groups, shape


def _codec_handlers(codec, video):
    """compress/decompress closures for a single codec (image/video)."""

    def compress(f):
        x = _read_pixels(f)
        out = codec.compress(x)
        return _encode_response(out, video)

    def decompress(f):
        strings, shapes = _decode_request(f, video)
        rec = codec.decompress(strings, shapes, u8=True)
        arr = rec if video else rec["x_hat"]
        out = io.BytesIO()
        _write_pixels(out, np.asarray(arr))
        return out.getvalue()

    return compress, decompress


def _rgbt_handlers(guided_codec, master_codec):
    """RGBT pair serving (the paper's flagship guided/master models).
    The guide is re-coded on BOTH legs (one-pass encode-scan reconstruct)
    and its stream is NOT part of the master payload (the reference's
    decoder re-codes the guide from its own source, codec_rgbt.py:538-544)
    — so the decompress request carries the guide pixels again, and a
    small content-keyed LRU skips the re-code when the same guide hits
    both legs of one daemon. Pixels cross as uint8 and are normalized
    here; the guided hidden-tap path is float-only."""

    def as_float(pix):
        # the pair is served single-image: beta/gamma are (B, 1, 1, 64)
        # and the wire format carries exactly 64+64 floats
        if pix.shape[0] != 1:
            raise ValueError(
                f"RGBT serving is single-image (B=1); got B={pix.shape[0]}"
            )
        return pix.astype(np.float32) / 255.0

    # Guide-reconstruction LRU: the decompress leg re-codes the SAME
    # guide the compress leg just ran (the stream does not carry the
    # guide — reference convention), so a roundtrip through one daemon
    # pays the dominant guide AR scan twice. Entries hold device arrays
    # (x_hat + gs taps — tens of MB at eval geometry), hence the small
    # default; LMIC_SERVE_GUIDE_CACHE=0 disables. Handlers run under the
    # server lock, so no extra locking here.
    cache_n = int(os.environ.get("LMIC_SERVE_GUIDE_CACHE", "2"))
    guide_cache = collections.OrderedDict()

    def run_guide(guide_u8):
        # key on the raw uint8 wire pixels (4x fewer bytes than the float
        # conversion, which is deterministic) with a collision-resistant
        # hash: request pixels are attacker-controllable, and an engineered
        # collision would silently reconstruct against the wrong guide
        key = None
        if cache_n > 0:
            key = (guide_u8.shape,
                   hashlib.sha256(guide_u8.tobytes()).hexdigest())
            hit = guide_cache.get(key)
            if hit is not None:
                guide_cache.move_to_end(key)
                return hit
        # one-pass reconstruct: the encode scan's y_hat is bit-equal to
        # what the decode scan rebuilds from the streams (roundtrip
        # invariant), so the decoder-exact x_hat/gs* come straight from
        # the encode scan — no decode scan + rANS decode per guide
        g_out = guided_codec.compress(
            as_float(guide_u8), hidden=False, reconstruct=True
        )
        g_dec = {"x_hat": g_out["x_hat"], "hidden": g_out["hidden_dec"]}
        if key is not None:
            guide_cache[key] = g_dec
            while len(guide_cache) > cache_n:
                guide_cache.popitem(last=False)
        return g_dec

    def compress(f):
        x = as_float(_read_pixels(f))
        guide_u8 = _read_pixels(f)
        # validate BEFORE the expensive guide AR encode+decode runs under
        # the server lock; check_geometry is the same policy the codec and
        # the file-codec CLI enforce, and ValueError maps to a 400
        master_codec.check_geometry(
            int(x.shape[1]), int(x.shape[2]),
            tuple(map(int, guide_u8.shape[1:3])), guide_what="guide image",
        )
        g_dec = run_guide(guide_u8)
        m_out = master_codec.compress(x, g_dec["x_hat"])
        beta = np.asarray(m_out["beta"], np.float32).reshape(-1)
        gamma = np.asarray(m_out["gamma"], np.float32).reshape(-1)
        if beta.size != 64 or gamma.size != 64:  # aligner width
            raise ValueError(
                f"expected 64+64 beta/gamma floats, got "
                f"{beta.size}+{gamma.size}"
            )
        out = io.BytesIO()
        write_body(out, m_out["shape"], m_out["strings"])
        write_floats(out, beta.tolist())
        write_floats(out, gamma.tolist())
        return out.getvalue()

    def decompress(f):
        shape, strings = read_body(f)
        beta = np.asarray(read_floats(f, 64), np.float32).reshape(
            1, 1, 1, 64
        )
        gamma = np.asarray(read_floats(f, 64), np.float32).reshape(
            1, 1, 1, 64
        )
        guide_u8 = _read_pixels(f)
        # the body's z-latent shape pins the master geometry (H = z*factor)
        factor = master_codec.module.downsampling_factor
        master_codec.check_geometry(
            int(shape[0]) * factor, int(shape[1]) * factor,
            tuple(map(int, guide_u8.shape[1:3])), guide_what="guide image",
        )
        g_dec = run_guide(guide_u8)
        rec = master_codec.decompress(
            {"strings": strings, "shape": shape,
             "beta": beta, "gamma": gamma},
            g_dec,
        )
        arr = np.clip(np.asarray(rec["x_hat"]), 0.0, 1.0)
        out = io.BytesIO()
        _write_pixels(out, np.round(arr * 255.0).astype(np.uint8))
        return out.getvalue()

    return compress, decompress


def make_server(codec, meta, host="127.0.0.1", port=0):
    """Build a ThreadingHTTPServer serving `codec`. `meta` is the bundle
    meta dict (or a {"family", "input_shape"}-shaped equivalent for a
    live codec; input_shape None means any shape the codec accepts).
    family "rgbt" takes `codec` as a (guided_codec, master_codec) pair."""
    family = meta.get("family")
    if family == "rgbt":
        compress_fn, decompress_fn = _rgbt_handlers(*codec)
    else:
        compress_fn, decompress_fn = _codec_handlers(
            codec, family == "video"
        )
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *_a):  # quiet by default; errors still raise
            pass

        def _reply(self, code, body, ctype="application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self):
            n = int(self.headers.get("Content-Length", 0))
            return io.BytesIO(self.rfile.read(n))

        def do_GET(self):
            if self.path != "/meta":
                return self._reply(404, b"not found", "text/plain")
            self._reply(200, json.dumps(meta).encode(), "application/json")

        def do_POST(self):
            try:
                # drain the body BEFORE routing: on HTTP/1.1 keep-alive a
                # 404 that leaves Content-Length bytes unread would desync
                # the next request on the same socket
                body = self._body()  # socket read OUTSIDE the lock
                fn = {"/compress": compress_fn,
                      "/decompress": decompress_fn}.get(self.path)
                if fn is None:
                    return self._reply(404, b"not found", "text/plain")
                with lock:  # the lock covers codec work only — a slow
                    payload = fn(body)  # peer must not stall the server
                return self._reply(200, payload)
            except Exception as e:  # noqa: BLE001
                # map ANY failure to a protocol-valid 400 (malformed
                # framing reaches the codec as assert/Type/IndexError,
                # not just ValueError) instead of killing the connection
                return self._reply(
                    400, f"{type(e).__name__}: {e}".encode(), "text/plain"
                )

    return ThreadingHTTPServer((host, port), Handler)


def _parse_args(argv):
    import argparse

    p = argparse.ArgumentParser(
        "lmic-serve",
        description="Serve a codec's uint8 fast path over HTTP "
                    "(AOT bundle or updated checkpoint).",
    )
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--bundle", help="AOT serving bundle directory "
                                      "(utils/aot.py)")
    src.add_argument("--checkpoint", help="updated deployment checkpoint "
                                          "(lmic-update-model output)")
    p.add_argument("-a", "--arch", help="architecture (checkpoint mode); "
                                        "'master' serves the RGBT pair")
    p.add_argument("-q", "--quality", type=int, default=1)
    p.add_argument("--guided-checkpoint",
                   help="guided codec checkpoint (required with -a master; "
                        "--checkpoint is then the master's)")
    p.add_argument("--channel", type=int, default=1,
                   help="master channel count for the RGBT pair (guide "
                        "gets the complementary 4-channel modality)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8752)
    return p.parse_args(argv)


# archs with a standalone compress(x)/decompress(..., u8=True) surface;
# master/_D/guided need side inputs or lack the uint8 decode path
SERVABLE_ARCHS = {
    "bmshj2018-factorized", "bmshj2018-hyperprior", "mbt2018-mean",
    "mbt2018", "cheng2020-anchor", "cheng2020-attn", "ssf2020",
}


def load_checkpoint_codec(checkpoint, arch, quality):
    """Build the serving codec for --checkpoint mode: a zoo codec with
    the deployment checkpoint's weights AND baked coding state installed
    (load_updated_model returns a NEW codec; the template is discarded)."""
    if arch not in SERVABLE_ARCHS:
        raise SystemExit(
            f"{arch} is not servable (needs side inputs or has no uint8 "
            f"decode path); servable: {sorted(SERVABLE_ARCHS)}"
        )
    import jax

    from lmic_tpu import zoo
    from lmic_tpu.utils.checkpoint import load_updated_model

    if arch == "ssf2020":
        codec = zoo.create_video_model(arch, quality, key=jax.random.key(0))
    else:
        codec = zoo.create_model(arch, quality, key=jax.random.key(0))
    codec = load_updated_model(checkpoint, codec)
    meta = {
        "family": "video" if arch == "ssf2020" else "image",
        "input_shape": None,
        "arch": arch,
        "quality": quality,
    }
    return codec, meta


def load_rgbt_codecs(guided_checkpoint, master_checkpoint, quality,
                     channel=1):
    """Build the (guided, master) pair for RGBT serving; master takes
    `channel` channels, the guide the complementary 4-channel modality
    (eval CLI convention)."""
    from lmic_tpu.utils.codec_cli import _build

    guided = _build("guided", quality, guided_checkpoint,
                    channel=4 - channel)
    master = _build("master", quality, master_checkpoint, channel=channel)
    meta = {
        "family": "rgbt",
        "input_shape": None,
        "channel": channel,
        "quality": quality,
    }
    return (guided, master), meta


def main(argv=None):
    args = _parse_args(argv)
    if args.bundle:
        from lmic_tpu.utils.aot import load_serving_bundle

        codec = load_serving_bundle(args.bundle)
        meta = dict(codec.bundle_meta)
    elif args.arch == "master":
        if not args.guided_checkpoint:
            raise SystemExit("-a master needs --guided-checkpoint")
        if args.channel not in (1, 3):
            raise SystemExit(
                f"--channel must be 1 or 3 (master modality; the guide "
                f"gets the complementary 4-channel one), got {args.channel}"
            )
        codec, meta = load_rgbt_codecs(
            args.guided_checkpoint, args.checkpoint, args.quality,
            args.channel,
        )
    else:
        if not args.arch:
            raise SystemExit("--checkpoint mode needs --arch")
        codec, meta = load_checkpoint_codec(
            args.checkpoint, args.arch, args.quality
        )
    server = make_server(codec, meta, args.host, args.port)
    host, port = server.server_address[:2]
    print(f"lmic-serve: {meta.get('family')} codec on http://{host}:{port} "
          "(POST /compress, POST /decompress, GET /meta)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:  # pragma: no cover - interactive stop
        pass
    finally:
        server.server_close()
