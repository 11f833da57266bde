"""lmic-serve HTTP daemon: roundtrips over a real socket are bit-equal
to direct codec calls, for both a live codec and an AOT bundle, image
and video families; malformed requests get 400s, not crashes."""

import http.client
import io
import json
import struct
import threading

import jax
import numpy as np
import pytest

from lmic_tpu import zoo
from lmic_tpu.utils.serve import (
    _read_pixels,
    _write_pixels,
    make_server,
)

SHAPE = (2, 64, 64, 3)


def _pixels(shape=SHAPE, seed=0):
    return (np.random.default_rng(seed).random(shape) * 255).astype(
        np.uint8
    )


@pytest.fixture(scope="module")
def served_image():
    codec = zoo.create_model(
        "bmshj2018-factorized", 1, key=jax.random.key(0),
        input_size=SHAPE[1:3],
    )
    codec.update(force=True)
    server = make_server(
        codec, {"family": "factorized", "input_shape": list(SHAPE)}
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield codec, server.server_address[1]
    server.shutdown()
    server.server_close()


def _post(port, path, payload):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("POST", path, body=payload)
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    return resp.status, body


def _pixel_payload(x):
    f = io.BytesIO()
    _write_pixels(f, x)
    return f.getvalue()


class TestImageServing:
    def test_meta(self, served_image):
        _, port = served_image
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/meta")
        resp = conn.getresponse()
        meta = json.loads(resp.read())
        conn.close()
        assert resp.status == 200
        assert meta["family"] == "factorized"
        assert tuple(meta["input_shape"]) == SHAPE

    def test_roundtrip_bit_equal(self, served_image):
        codec, port = served_image
        x = _pixels()
        want = codec.compress(x)
        want_rec = codec.decompress(want["strings"], want["shape"], u8=True)

        status, framed = _post(port, "/compress", _pixel_payload(x))
        assert status == 200
        status, rec_payload = _post(port, "/decompress", framed)
        assert status == 200
        rec = _read_pixels(io.BytesIO(rec_payload))
        np.testing.assert_array_equal(rec, want_rec["x_hat"])

        # the served stream is the direct codec's stream, byte for byte
        from lmic_tpu.utils.codec_cli import read_body

        shape, groups = read_body(io.BytesIO(framed))
        assert tuple(shape) == tuple(want["shape"])
        assert groups == want["strings"]

    def test_keepalive_survives_404_with_body(self, served_image):
        # HTTP/1.1 keep-alive: a 404 on a POST with a large body must
        # drain the body, or the next request on the same socket parses
        # from the unread bytes and desyncs
        _, port = served_image
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        try:
            conn.request("POST", "/compres", body=_pixel_payload(_pixels()))
            resp = conn.getresponse()
            resp.read()
            assert resp.status == 404
            conn.request("POST", "/compress", body=_pixel_payload(_pixels()))
            resp = conn.getresponse()
            resp.read()
            assert resp.status == 200
        finally:
            conn.close()

    def test_bad_requests(self, served_image):
        _, port = served_image
        status, body = _post(port, "/compress", b"\x04garbage")
        assert status == 400
        status, _ = _post(port, "/nope", b"")
        assert status == 404
        # truncated pixel payload
        x = _pixels()
        status, body = _post(port, "/compress", _pixel_payload(x)[:-7])
        assert status == 400 and b"pixel bytes" in body
        # a well-formed frame the codec itself rejects (two string
        # groups on a factorized codec) must come back as a 400, not a
        # killed connection
        f = io.BytesIO()
        from lmic_tpu.utils.codec_cli import write_body

        write_body(f, (4, 4), [[b"ab"], [b"cd"]])
        status, body = _post(port, "/decompress", f.getvalue())
        assert status == 400


class TestVideoServing:
    GOP = (1, 2, 128, 128, 3)

    def test_roundtrip_bit_equal(self):
        codec = zoo.create_video_model(
            "ssf2020", 1, key=jax.random.key(0), input_size=self.GOP[2:4]
        )
        codec.update(force=True)
        server = make_server(
            codec, {"family": "video", "input_shape": list(self.GOP)}
        )
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            port = server.server_address[1]
            frames = _pixels(self.GOP, seed=3)
            want_s, want_sh = codec.compress(frames)
            want_rec = codec.decompress(want_s, want_sh, u8=True)

            status, framed = _post(port, "/compress",
                                   _pixel_payload(frames))
            assert status == 200
            status, rec_payload = _post(port, "/decompress", framed)
            assert status == 200
            rec = _read_pixels(io.BytesIO(rec_payload))
            np.testing.assert_array_equal(rec, want_rec)
        finally:
            server.shutdown()
            server.server_close()


class TestRGBTServing:
    """The paper's guided/master pair over HTTP: guide pixels travel on
    BOTH legs (the guide stream is not part of the master payload —
    reference convention), streams and recon bit-equal to direct calls."""

    @pytest.fixture(scope="class")
    def pair(self):
        import jax.numpy as jnp

        from lmic_tpu.models.rgbt import (
            GuidedCodec,
            GuidedCompresser,
            MasterCodec,
            MasterCompresser,
        )

        guided = GuidedCompresser(N=32, M=48, channel=1, first_stride=2)
        xg = jax.random.uniform(jax.random.key(0), (1, 64, 64, 1))
        vg = guided.init(
            {"params": jax.random.key(1), "noise": jax.random.key(2)}, xg
        )
        gc = GuidedCodec(guided, vg)
        gc.update(force=True)
        g_out = gc.compress(xg)
        g_dec = gc.decompress(g_out["strings"], g_out["shape"])
        master = MasterCompresser(N=32, M=48, channel=3)
        xm = jax.random.uniform(jax.random.key(4), (1, 128, 128, 3))
        vm = master.init(
            {"params": jax.random.key(5), "noise": jax.random.key(6)},
            xm,
            jnp.asarray(g_dec["x_hat"]),
            jax.tree.map(jnp.asarray, g_dec["hidden"]),
        )
        mc = MasterCodec(master, vm)
        mc.update(force=True)
        return gc, mc

    def test_roundtrip_bit_equal(self, pair):
        gc, mc = pair
        server = make_server(
            pair, {"family": "rgbt", "input_shape": None, "channel": 3}
        )
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            port = server.server_address[1]
            xm_u8 = _pixels((1, 128, 128, 3), seed=20)
            xg_u8 = _pixels((1, 64, 64, 1), seed=21)
            xm = xm_u8.astype(np.float32) / 255.0
            xg = xg_u8.astype(np.float32) / 255.0
            # direct pair coding, exactly the server's orchestration
            g_out = gc.compress(xg)
            g_dec = gc.decompress(g_out["strings"], g_out["shape"])
            m_out = mc.compress(xm, g_dec["x_hat"])
            want_rec = mc.decompress(
                {"strings": m_out["strings"], "shape": m_out["shape"],
                 "beta": m_out["beta"], "gamma": m_out["gamma"]},
                g_dec,
            )

            payload = _pixel_payload(xm_u8) + _pixel_payload(xg_u8)
            status, framed = _post(port, "/compress", payload)
            assert status == 200
            from lmic_tpu.utils.codec_cli import read_body, read_floats

            f = io.BytesIO(framed)
            shape, strings = read_body(f)
            assert strings == m_out["strings"]
            beta = read_floats(f, 64)
            np.testing.assert_allclose(
                beta, np.asarray(m_out["beta"]).reshape(-1), rtol=1e-6
            )

            status, rec_payload = _post(
                port, "/decompress", framed + _pixel_payload(xg_u8)
            )
            assert status == 200
            rec = _read_pixels(io.BytesIO(rec_payload))
            want_u8 = np.round(
                np.clip(np.asarray(want_rec["x_hat"]), 0, 1) * 255.0
            ).astype(np.uint8)
            np.testing.assert_array_equal(rec, want_u8)
            # batched pairs are rejected with a clear 400 (beta/gamma
            # wire format is fixed at 64+64 floats)
            xb = _pixels((2, 128, 128, 3), seed=22)
            status, body = _post(
                port, "/compress",
                _pixel_payload(np.repeat(xm_u8, 2, axis=0))
                + _pixel_payload(xb),
            )
            assert status == 400 and b"single-image" in body
            # wrong-size guide: rejected up front by check_geometry (400)
            # BEFORE the expensive guide AR coding, on both legs
            bad_guide = _pixels((1, 128, 128, 1), seed=23)
            status, body = _post(
                port, "/compress",
                _pixel_payload(xm_u8) + _pixel_payload(bad_guide),
            )
            assert status == 400 and b"guide image must be" in body
            status, body = _post(
                port, "/decompress", framed + _pixel_payload(bad_guide)
            )
            assert status == 400 and b"guide image must be" in body
        finally:
            server.shutdown()
            server.server_close()

    def test_guide_cache_one_recode_per_roundtrip(self, pair, monkeypatch):
        """A compress->decompress roundtrip with the same guide re-codes
        the guide ONCE (content-keyed LRU in _rgbt_handlers); with the
        cache disabled it re-codes twice and the responses are
        byte-identical either way."""
        gc, _mc = pair
        xm_u8 = _pixels((1, 128, 128, 3), seed=30)
        xg_u8 = _pixels((1, 64, 64, 1), seed=31)

        real = gc.compress
        calls = {"n": 0}

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(gc, "compress", counting)

        def run(cache_env):
            monkeypatch.setenv("LMIC_SERVE_GUIDE_CACHE", cache_env)
            calls["n"] = 0
            server = make_server(
                pair, {"family": "rgbt", "input_shape": None, "channel": 3}
            )
            t = threading.Thread(target=server.serve_forever, daemon=True)
            t.start()
            try:
                port = server.server_address[1]
                status, framed = _post(
                    port, "/compress",
                    _pixel_payload(xm_u8) + _pixel_payload(xg_u8),
                )
                assert status == 200
                status, rec = _post(
                    port, "/decompress", framed + _pixel_payload(xg_u8)
                )
                assert status == 200
            finally:
                server.shutdown()
                server.server_close()
            return framed, rec, calls["n"]

        framed1, rec1, n1 = run("2")
        framed0, rec0, n0 = run("0")
        assert n1 == 1  # decompress leg hit the cache
        assert n0 == 2  # cache disabled: one re-code per leg
        assert framed1 == framed0
        assert rec1 == rec0


def test_aot_bundle_served(tmp_path):
    """The deployment pairing: export an AOT bundle, load it without
    model code, serve it — streams bit-equal to the live codec, and the
    bundle's own guards surface as 400s."""
    from lmic_tpu.utils.aot import export_serving_bundle, \
        load_serving_bundle

    live = zoo.create_model(
        "bmshj2018-hyperprior", 1, key=jax.random.key(0),
        input_size=SHAPE[1:3],
    )
    live.update(force=True)
    x = _pixels(seed=5)
    want = live.compress(x)
    bundle = str(tmp_path / "bundle")
    export_serving_bundle(live, bundle, SHAPE)
    served_codec = load_serving_bundle(bundle)
    server = make_server(served_codec, dict(served_codec.bundle_meta))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        status, framed = _post(port, "/compress", _pixel_payload(x))
        assert status == 200
        from lmic_tpu.utils.codec_cli import read_body

        _, groups = read_body(io.BytesIO(framed))
        assert groups == want["strings"]
        # wrong shape trips the bundle's fixed-shape guard -> 400
        status, body = _post(
            port, "/compress", _pixel_payload(_pixels((1,) + SHAPE[1:]))
        )
        assert status == 400 and b"fixed to input shape" in body
    finally:
        server.shutdown()
        server.server_close()


def test_pixel_framing_roundtrip():
    x = _pixels((3, 5, 7, 3), seed=9)
    f = io.BytesIO()
    _write_pixels(f, x)
    f.seek(0)
    np.testing.assert_array_equal(_read_pixels(f), x)


def test_unservable_arch_rejected():
    from lmic_tpu.utils.serve import main

    with pytest.raises(SystemExit, match="not servable"):
        main(["--checkpoint", "/nonexistent", "-a", "mbt2018_D"])
    # master IS servable, but only as the RGBT pair
    with pytest.raises(SystemExit, match="guided-checkpoint"):
        main(["--checkpoint", "/nonexistent", "-a", "master"])
    with pytest.raises(SystemExit, match="channel must be 1 or 3"):
        main(["--checkpoint", "/nonexistent", "-a", "master",
              "--guided-checkpoint", "/nonexistent", "--channel", "4"])


def test_checkpoint_mode_serves_updated_codec(tmp_path):
    """--checkpoint mode must serve the checkpoint's weights AND baked
    coding state (load_updated_model returns a new codec; discarding the
    return served a random-init codec and 400'd every request)."""
    from lmic_tpu.utils.checkpoint import update_model_file
    from lmic_tpu.utils.serve import load_checkpoint_codec

    live = zoo.create_model(
        "bmshj2018-factorized", 1, key=jax.random.key(0),
        input_size=SHAPE[1:3],
    )
    live.update(force=True)
    out = update_model_file(
        "unused.ckpt", str(tmp_path), live, "bmshj2018-factorized-q1",
        update=False,
    )
    codec, meta = load_checkpoint_codec(out, "bmshj2018-factorized", 1)
    assert meta["family"] == "image"
    x = _pixels(seed=11)
    want = live.compress(x)
    server = make_server(codec, meta)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        port = server.server_address[1]
        status, framed = _post(port, "/compress", _pixel_payload(x))
        assert status == 200
        from lmic_tpu.utils.codec_cli import read_body

        _, groups = read_body(io.BytesIO(framed))
        assert groups == want["strings"]
    finally:
        server.shutdown()
        server.server_close()


def test_truncated_framing_is_error():
    f = io.BytesIO(struct.pack("<B", 4) + b"\x00" * 4)
    with pytest.raises(Exception):
        _read_pixels(f)
