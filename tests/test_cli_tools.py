"""CLI tool tests: traditional codec bench, plot series loading, find_close
bisection, video eval on a tiny synthetic YUV clip."""

import json

import numpy as np
import pytest
from PIL import Image

from lmic_tpu.utils.bench_codecs import CODECS, JPEG, WebP
from lmic_tpu.utils.find_close import find_closest
from lmic_tpu.utils.plot_cli import load_series


@pytest.fixture(scope="module")
def img_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("bench")
    rng = np.random.default_rng(0)
    # low-frequency content so JPEG quality actually spans bpp range
    base = rng.random((8, 8, 3))
    arr = np.kron(base, np.ones((24, 24, 1)))[:176, :176]
    path = d / "img.png"
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)
    return str(path)


class TestTraditionalCodecs:
    @pytest.mark.parametrize("cls", [JPEG, WebP])
    def test_run_metrics(self, cls, img_path):
        m = cls().run(img_path, 50)
        assert set(m) >= {"psnr", "ms-ssim", "bpp", "encoding_time",
                          "decoding_time"}
        assert m["psnr"] > 15 and 0 < m["bpp"] < 24

    def test_quality_monotonic(self, img_path):
        jpeg = JPEG()
        lo = jpeg.run(img_path, 10)
        hi = jpeg.run(img_path, 90)
        assert hi["psnr"] > lo["psnr"]
        assert hi["bpp"] > lo["bpp"]

    def test_collect_fanout_matches_serial(self, img_path):
        from lmic_tpu.utils.bench_codecs import collect

        jpeg = JPEG()
        serial = collect(jpeg, [img_path], [30, 70], num_jobs=1)
        threaded = collect(jpeg, [img_path], [30, 70], num_jobs=4)
        assert serial["bpp"] == threaded["bpp"]
        assert serial["psnr"] == threaded["psnr"]
        assert len(serial["bpp"]) == 2


class TestReferenceEncoderWrappers:
    """VTM/HM/AV1/TFCI arg plumbing — no binaries in this image, so
    construction must fail with actionable messages and command
    construction is checked against the reference's flags
    (utils/bench/codecs.py:596-962)."""

    def test_missing_binaries_error(self, tmp_path):
        from lmic_tpu.utils.bench_codecs import AV1, HM, TFCI, VTM

        cfg = tmp_path / "intra.cfg"
        cfg.write_text("# cfg\n")
        with pytest.raises(RuntimeError, match="binaries not found"):
            VTM(str(tmp_path), str(cfg))
        with pytest.raises(RuntimeError, match="binaries not found"):
            HM(str(tmp_path), str(cfg))
        with pytest.raises(RuntimeError, match="binaries not found"):
            AV1(str(tmp_path))
        with pytest.raises(RuntimeError, match="tfci.py"):
            TFCI(str(tmp_path / "missing_tfci.py"))

    @pytest.fixture
    def vtm_dir(self, tmp_path):
        import os

        for name in ("EncoderAppStatic", "DecoderAppStatic",
                     "TAppEncoderStatic", "TAppDecoderStatic", "aomenc",
                     "aomdec"):
            p = tmp_path / name
            p.write_text("#!/bin/sh\n")
            os.chmod(p, 0o755)
        (tmp_path / "intra.cfg").write_text("# cfg\n")
        return tmp_path

    def test_vtm_hm_commands(self, vtm_dir):
        from lmic_tpu.utils.bench_codecs import HM, VTM

        cfg = str(vtm_dir / "intra.cfg")
        vtm = VTM(str(vtm_dir), cfg)
        cmd = vtm._enc_cmd("in.yuv", 32, "out.bin", 768, 512)
        assert cmd[0].endswith("EncoderAppStatic")
        assert "--InputChromaFormat=444" in cmd
        assert "--ConformanceWindowMode=1" in cmd
        assert cmd[cmd.index("-q") + 1] == "32"
        assert cmd[cmd.index("-wdt") + 1] == "768"
        with pytest.raises(ValueError, match="Invalid quality"):
            vtm._enc_cmd("in.yuv", 99, "o", 8, 8)

        hm = HM(str(vtm_dir), cfg, rgb=True)
        cmd = hm._enc_cmd("in.yuv", 27, "out.bin", 64, 64)
        assert cmd[0].endswith("TAppEncoderStatic")
        assert "--SEIDecodedPictureHash" in cmd
        assert "--InputColourSpaceConvert=RGBtoGBR" in cmd
        dec = hm._dec_cmd("out.bin", "rec.yuv")
        assert dec[0].endswith("TAppDecoderStatic")
        assert "--OutputInternalColourSpace=GBRtoRGB" in dec

    def test_cli_skips_cleanly_when_absent(self, tmp_path, capsys):
        from lmic_tpu.utils.bench_codecs import main

        rc = main(["vtm", "-d", str(tmp_path), "-q", "32",
                   "--build-dir", str(tmp_path),
                   "--config", str(tmp_path / "nope.cfg")])
        assert rc == 1
        assert "skipped" in capsys.readouterr().err

    def test_video_ref_codec_commands(self, vtm_dir, tmp_path):
        from lmic_tpu.datasets.rawvideo import RawVideoSequence
        from lmic_tpu.utils.video_bench import HMVideo, VTMVideo

        W, H, T = 64, 64, 2
        raw = np.zeros(T * (H * W + 2 * (H // 2) * (W // 2)), np.uint8)
        path = tmp_path / f"clip_{W}x{H}_30_yuv420.yuv"
        raw.tofile(path)
        seq = RawVideoSequence.from_file(str(path))

        vtm = VTMVideo(str(vtm_dir), str(vtm_dir / "intra.cfg"))
        assert vtm.available()
        cmd = vtm.encode_cmd(str(path), seq, 32, "out.bin")
        assert cmd[cmd.index("-wdt") + 1] == "64"
        assert cmd[cmd.index("-f") + 1] == "2"
        assert "--InputBitDepth=8" in cmd

        hm = HMVideo("", "")
        assert not hm.available()


class TestFindClose:
    def test_bisects_bpp(self, img_path):
        target = JPEG().run(img_path, 50)["bpp"]
        q, res = find_closest("jpeg", img_path, target, "bpp")
        assert abs(res["bpp"] - target) / target < 0.5


class TestPlotSeries:
    def test_plotly_backend(self, tmp_path, monkeypatch):
        """--backend plotly builds a go.Figure and writes HTML (reference
        utils/plot/__main__.py:120-142). plotly is not installable here,
        so a recording stub stands in for the module surface we use."""
        import sys
        import types

        calls = {}

        class FakeScatter:
            def __init__(self, x=None, y=None, name=None):
                calls.setdefault("scatters", []).append((name, x, y))

        class FakeFigure:
            def add_traces(self, t):
                pass

            def update_xaxes(self, **kw):
                calls["xlabel"] = kw.get("title_text")

            def update_yaxes(self, **kw):
                calls["ylabel"] = kw.get("title_text")

            def update_layout(self, **kw):
                calls["title"] = kw.get("title")

        go = types.ModuleType("plotly.graph_objs")
        go.Figure, go.Scatter = FakeFigure, FakeScatter
        pio = types.ModuleType("plotly.io")

        def write_html(fig, file=None, auto_open=False):
            calls["file"] = file
            with open(file, "w") as f:
                f.write("<html></html>")

        pio.write_html = write_html
        plotly = types.ModuleType("plotly")
        monkeypatch.setitem(sys.modules, "plotly", plotly)
        monkeypatch.setitem(sys.modules, "plotly.graph_objs", go)
        monkeypatch.setitem(sys.modules, "plotly.io", pio)

        import json

        from lmic_tpu.utils.plot_cli import main

        data = [{
            "name": "model-a",
            "results": {"bpp": [0.1, 0.3], "psnr": [28.0, 32.0]},
        }]
        p = tmp_path / "r.json"
        p.write_text(json.dumps(data))
        out = tmp_path / "rd.html"
        main(["-f", str(p), "--backend", "plotly", "-o", str(out)])
        assert out.exists()
        assert calls["scatters"] == [("model-a", [0.1, 0.3], [28.0, 32.0])]
        assert calls["xlabel"] == "Bit-rate [bpp]"
        assert calls["ylabel"] == "PSNR [dB]"

    def test_load_series(self, tmp_path):
        data = [{
            "name": "model-a",
            "results": {"bpp": [0.1, 0.3], "psnr": [28.0, 32.0]},
        }]
        p = tmp_path / "r.json"
        p.write_text(json.dumps(data))
        series = load_series(str(p), "psnr")
        assert series == [("model-a", [0.1, 0.3], [28.0, 32.0])]


class TestVideoEval:
    def test_tiny_sequence(self, tmp_path):
        import jax

        from lmic_tpu.models.video import ScaleSpaceFlow, ScaleSpaceFlowCodec
        from lmic_tpu.utils.video_eval import eval_sequence
        from lmic_tpu.datasets.rawvideo import RawVideoSequence

        W, H, T = 128, 128, 2
        rng = np.random.default_rng(0)
        frames = rng.integers(
            0, 255, T * (H * W + 2 * (H // 2) * (W // 2)), dtype=np.uint8
        )
        path = tmp_path / f"clip_{W}x{H}_30_yuv420.yuv"
        frames.tofile(path)
        seq = RawVideoSequence.from_file(str(path))

        module = ScaleSpaceFlow()
        clip = np.zeros((1, 2, 128, 128, 3), np.float32)
        v = module.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            clip,
        )
        codec = ScaleSpaceFlowCodec(module, v)
        codec.update(force=True)
        m = eval_sequence(codec, seq, gop=2)
        assert np.isfinite(m["psnr-rgb"]) and np.isfinite(m["psnr-yuv"])
        assert m["bitrate"] > 0


class TestUpdateModel:
    def test_finalize_and_reload(self, tmp_path):
        import jax

        from lmic_tpu import zoo
        from lmic_tpu.utils import checkpoint as ckpt
        from lmic_tpu.utils.checkpoint import load_updated_model
        from lmic_tpu.utils.train import create_train_state, make_optimizer
        from lmic_tpu.utils.update_model_cli import run

        codec = zoo.create_model(
            "bmshj2018-factorized", 1, key=jax.random.key(0),
            input_size=(64, 64),
        )
        state = create_train_state(codec.variables["params"], make_optimizer())
        train_ckpt = tmp_path / "train.ckpt"
        ckpt.save_checkpoint(str(train_ckpt), state)

        out = run([
            str(train_ckpt), "-a", "bmshj2018-factorized", "-q", "1",
            "-d", str(tmp_path),
        ])
        assert "bmshj2018-factorized-q1-" in out

        codec2 = zoo.create_model(
            "bmshj2018-factorized", 1, key=jax.random.key(1),
            input_size=(64, 64),
        )
        codec2 = load_updated_model(out, codec2)
        x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
        o = codec2.compress(x)
        r = codec2.decompress(o["strings"], o["shape"])
        assert r["x_hat"].shape == x.shape

    def test_finalize_scheduled_optimizer_checkpoint(self, tmp_path):
        """Regression: lmic-train saves states under make_optimizer(step_lr,
        aux_lr, clip) whose optax state structure differs from the default
        template — finalization must restore params structurally, not via a
        full-state template (checkpoint.load_train_params)."""
        import jax

        from lmic_tpu import zoo
        from lmic_tpu.utils import checkpoint as ckpt
        from lmic_tpu.utils.train import (
            create_train_state,
            make_optimizer,
            step_lr,
        )
        from lmic_tpu.utils.update_model_cli import run

        codec = zoo.create_model(
            "bmshj2018-factorized", 1, key=jax.random.key(0),
            input_size=(64, 64),
        )
        opt = make_optimizer(step_lr(1e-4, 10), 1e-3, 1.0)
        state = create_train_state(codec.variables["params"], opt)
        train_ckpt = tmp_path / "train_sched.ckpt"
        ckpt.save_checkpoint(str(train_ckpt), state)

        out = run([
            str(train_ckpt), "-a", "bmshj2018-factorized", "-q", "1",
            "-d", str(tmp_path),
        ])
        assert "bmshj2018-factorized-q1-" in out
        # the restored params must be the saved ones, not the template's
        params, _ = ckpt.load_train_params(
            str(train_ckpt), codec.variables["params"]
        )
        ref = jax.tree_util.tree_leaves(state.params)
        got = jax.tree_util.tree_leaves(params)
        assert all(np.array_equal(a, b) for a, b in zip(ref, got))

    def test_aot_shape_flag_exports_bundle(self, tmp_path):
        import jax

        from lmic_tpu import zoo
        from lmic_tpu.utils import checkpoint as ckpt
        from lmic_tpu.utils.aot import load_serving_bundle
        from lmic_tpu.utils.train import create_train_state, make_optimizer
        from lmic_tpu.utils.update_model_cli import run

        codec = zoo.create_model(
            "bmshj2018-factorized", 1, key=jax.random.key(0),
            input_size=(64, 64),
        )
        state = create_train_state(codec.variables["params"], make_optimizer())
        train_ckpt = tmp_path / "train.ckpt"
        ckpt.save_checkpoint(str(train_ckpt), state)
        run([
            str(train_ckpt), "-a", "bmshj2018-factorized", "-q", "1",
            "-d", str(tmp_path), "--aot-shape", "1x64x64",
        ])
        served = load_serving_bundle(
            str(tmp_path / "bmshj2018-factorized-q1-aot")
        )
        x = (np.random.default_rng(0).random((1, 64, 64, 3)) * 255).astype(
            np.uint8
        )
        o = served.compress(x)
        r = served.decompress(o["strings"], o["shape"], u8=True)
        assert r["x_hat"].shape == x.shape and r["x_hat"].dtype == np.uint8


class TestVideoBench:
    def test_sequence_metrics_identical_is_inf(self, tmp_path):
        from lmic_tpu.datasets.rawvideo import RawVideoSequence
        from lmic_tpu.utils.video_bench import _sequence_metrics

        W, H, T = 64, 64, 2
        rng = np.random.default_rng(0)
        raw = rng.integers(
            0, 255, T * (H * W + 2 * (H // 2) * (W // 2)), dtype=np.uint8
        )
        path = tmp_path / f"clip_{W}x{H}_30_yuv420.yuv"
        raw.tofile(path)
        seq = RawVideoSequence.from_file(str(path))
        m = _sequence_metrics(seq, seq)
        assert m["psnr-y"] > 80  # identical -> effectively infinite
        assert m["psnr-rgb"] > 80

    def test_missing_binary_errors_cleanly(self, tmp_path, monkeypatch):
        from lmic_tpu.utils import video_bench

        codec = video_bench.X264()
        monkeypatch.setattr(
            video_bench.shutil, "which", lambda _: None
        )
        with pytest.raises(RuntimeError, match="ffmpeg"):
            codec.run(str(tmp_path / "x_64x64_30_yuv420.yuv"), 23)
