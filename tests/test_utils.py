"""Tests for metrics, checkpointing, eval helpers, and the file-codec
container format."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmic_tpu import zoo
from lmic_tpu.utils import checkpoint as ckpt
from lmic_tpu.utils.eval_model import (
    eval_image_codec,
    eval_image_forward,
    pad_to_multiple,
    unpad,
)
from lmic_tpu.utils.metrics import ms_ssim, psnr, ssim
from lmic_tpu.utils.train import create_train_state, make_optimizer


class TestMetrics:
    def test_psnr(self):
        a = jnp.zeros((1, 8, 8, 3))
        b = jnp.full((1, 8, 8, 3), 0.1)
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, rtol=1e-5)

    def test_ssim_identity(self):
        x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
        assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_decreases_with_noise(self):
        x = jax.random.uniform(jax.random.key(0), (1, 64, 64, 3))
        n1 = x + jax.random.normal(jax.random.key(1), x.shape) * 0.02
        n2 = x + jax.random.normal(jax.random.key(1), x.shape) * 0.2
        assert float(ssim(x, n1)) > float(ssim(x, n2))

    def test_ms_ssim_range(self):
        x = jax.random.uniform(jax.random.key(0), (1, 192, 192, 3))
        y = x + jax.random.normal(jax.random.key(1), x.shape) * 0.05
        v = float(ms_ssim(x, y))
        assert 0 < v < 1
        assert float(ms_ssim(x, x)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_matches_skimage(self):
        skimage = pytest.importorskip("skimage.metrics")
        rng = np.random.default_rng(0)
        a = rng.random((64, 64), dtype=np.float32)
        b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
        ours = float(ssim(jnp.asarray(a[None, :, :, None]),
                          jnp.asarray(b[None, :, :, None])))
        theirs = skimage.structural_similarity(
            a, b, win_size=11, gaussian_weights=True, sigma=1.5,
            use_sample_covariance=False, data_range=1.0,
        )
        np.testing.assert_allclose(ours, theirs, atol=5e-3)


class TestPadding:
    def test_pad_unpad_roundtrip(self):
        x = np.random.default_rng(0).random((1, 100, 150, 3)).astype(
            np.float32
        )
        xp, meta = pad_to_multiple(x, 64)
        assert xp.shape[1] % 64 == 0 and xp.shape[2] % 64 == 0
        np.testing.assert_array_equal(unpad(xp, meta), x)


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        codec = zoo.create_model(
            "bmshj2018-factorized", 1, input_size=(64, 64)
        )
        # shrink for speed
        from lmic_tpu.models.image import FactorizedPrior
        from lmic_tpu.models.codec import FactorizedPriorCodec

        module = FactorizedPrior(N=16, M=24)
        x = jnp.zeros((1, 32, 32, 3))
        v = module.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
        )
        opt = make_optimizer()
        state = create_train_state(v["params"], opt)
        path = str(tmp_path / "test.ckpt")
        ckpt.save_checkpoint(path, state, {"epoch": 3}, is_best=True)
        state2, extra = ckpt.load_checkpoint(path, state)
        assert extra["epoch"] == 3
        assert os.path.exists(str(tmp_path / "test_best_loss.ckpt"))
        k0 = state.params["g_a_net"]["layers_0"]["Conv_0"]["kernel"]
        k1 = state2.params["g_a_net"]["layers_0"]["Conv_0"]["kernel"]
        np.testing.assert_array_equal(np.asarray(k0), np.asarray(k1))

    def test_save_creates_parent_dirs(self, tmp_path):
        # lmic-train --save-dir some/new/dir must not require pre-creating
        # the directory (reference train.py writes into cwd; we exceed it).
        from lmic_tpu.models.image import FactorizedPrior

        module = FactorizedPrior(N=16, M=24)
        x = jnp.zeros((1, 32, 32, 3))
        v = module.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
        )
        state = create_train_state(v["params"], make_optimizer())
        path = str(tmp_path / "nested" / "deeper" / "test.ckpt")
        ckpt.save_checkpoint(path, state, {"epoch": 1})
        _, extra = ckpt.load_checkpoint(path, state)
        assert extra["epoch"] == 1

    def test_update_model_roundtrip(self, tmp_path):
        from lmic_tpu.models.image import FactorizedPrior
        from lmic_tpu.models.codec import FactorizedPriorCodec

        module = FactorizedPrior(N=16, M=24)
        x = jnp.zeros((1, 64, 64, 3))
        v = module.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
        )
        codec = FactorizedPriorCodec(module, v)
        path = ckpt.update_model_file(
            "unused", str(tmp_path), codec, "factorized-q1"
        )
        assert os.path.exists(path) and "-" in os.path.basename(path)

        codec2 = FactorizedPriorCodec(module, v)
        codec2 = ckpt.load_updated_model(path, codec2)
        # identical CDF tables -> identical bitstreams
        img = np.asarray(
            jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
        )
        codec.update()
        s1 = codec.compress(img)["strings"][0][0]
        s2 = codec2.compress(img)["strings"][0][0]
        assert s1 == s2


class TestEvalHelpers:
    def test_eval_modes_agree_on_bpp(self):
        from lmic_tpu.models.image import MeanScaleHyperprior
        from lmic_tpu.models.codec import HyperpriorCodec

        module = MeanScaleHyperprior(N=16, M=24)
        x = jnp.zeros((1, 64, 64, 3))
        v = module.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
        )
        codec = HyperpriorCodec(module, v)
        codec.update(force=True)
        img = np.asarray(
            jax.random.uniform(jax.random.key(5), (1, 96, 80, 3))
        )
        m_fwd = eval_image_forward(codec, img)
        m_codec = eval_image_codec(codec, img)
        assert m_codec["bpp"] < m_fwd["bpp"] * 1.2 + 0.3
        assert m_codec["psnr"] > 0 and m_fwd["psnr"] > 0


class TestCodecContainer:
    def test_encode_decode_file(self, tmp_path):
        from PIL import Image

        from lmic_tpu.models.image import FactorizedPrior
        from lmic_tpu.models.codec import FactorizedPriorCodec
        from lmic_tpu.utils import codec_cli

        rng = np.random.default_rng(0)
        img_path = str(tmp_path / "in.png")
        Image.fromarray(
            (rng.random((96, 80, 3)) * 255).astype(np.uint8)
        ).save(img_path)

        module = FactorizedPrior(N=16, M=24)
        x = jnp.zeros((1, 128, 128, 3))
        v = module.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
        )
        codec = FactorizedPriorCodec(module, v)
        codec.update(force=True)

        bin_path = str(tmp_path / "out.bin")
        out_path = str(tmp_path / "rec.png")
        size = codec_cli.encode_image(
            img_path, bin_path, codec, "bmshj2018-factorized", 1
        )
        assert size > 8
        arch, q = codec_cli.decode_image(
            bin_path, out_path, lambda a, qq: codec
        )
        assert arch == "bmshj2018-factorized" and q == 1
        rec = np.asarray(Image.open(out_path))
        assert rec.shape == (96, 80, 3)

    def test_retired_magic_rejected(self, tmp_path):
        """A file with a previous container-layout magic must fail loudly,
        not fall through the auto-detect into the reference-container
        parse (which would misread the header)."""
        import struct

        import pytest

        from lmic_tpu.utils import codec_cli

        path = str(tmp_path / "old.bin")
        with open(path, "wb") as f:
            f.write(struct.pack(">I", 0x1C1C))  # retired layout version
            f.write(b"\x00" * 32)
        with pytest.raises(SystemExit, match="older lmic-codec container"):
            codec_cli.main(["decode", path, "-o", str(tmp_path / "r.png")])


class TestProfiling:
    def test_timings_sections(self):
        import jax.numpy as jnp

        from lmic_tpu.utils.profiling import Timings, timed

        t = Timings()
        with t.section("a"):
            pass
        with t.section("a"):
            pass
        with t.section("b", sync=jnp.ones(4)):
            pass
        rep = t.report()
        assert rep["a"]["count"] == 2 and rep["b"]["count"] == 1
        assert "a" in str(t)

        out, dt = timed(jnp.sum, jnp.ones(16))
        assert float(out) == 16.0 and dt >= 0


class TestMsSsimSmallImages:
    def test_small_image_finite(self):
        import jax.numpy as jnp

        from lmic_tpu.utils.metrics import ms_ssim

        rng = np.random.default_rng(0)
        for size in (32, 64, 128, 176, 256):
            a = jnp.asarray(rng.random((1, size, size, 3)).astype(np.float32))
            b = jnp.clip(a + 0.05, 0, 1)
            v = float(ms_ssim(a, b))
            assert np.isfinite(v) and 0 <= v <= 1, (size, v)

    def test_identical_is_one(self):
        import jax.numpy as jnp

        from lmic_tpu.utils.metrics import ms_ssim

        a = jnp.asarray(
            np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
        )
        assert float(ms_ssim(a, a)) > 0.9999


class TestVideoFileCodec:
    def test_encode_decode_video_file(self, tmp_path):
        """ssf2020 file coding roundtrip (codec_rgbt.py:389-450,557-598):
        keyframe body then motion+residual bodies per inter frame; the
        decoder writes raw YUV420 back."""
        import os

        from lmic_tpu.models.video import ScaleSpaceFlow, ScaleSpaceFlowCodec
        from lmic_tpu.utils import codec_cli

        H = W = 128
        n = 2
        rng = np.random.default_rng(1)
        yuv = tmp_path / "clip_128x128_25_yuv420.yuv"
        with open(yuv, "wb") as f:
            for _ in range(n):
                for plane in (H * W, H * W // 4, H * W // 4):
                    f.write(
                        (rng.random(plane) * 255).astype(np.uint8).tobytes()
                    )

        module = ScaleSpaceFlow()
        v = module.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            jnp.zeros((1, 2, H, W, 3)),
        )
        codec = ScaleSpaceFlowCodec(module, v)
        codec.update(force=True)

        bin_path = str(tmp_path / "v.bin")
        out_yuv = str(tmp_path / "rec.yuv")
        size = codec_cli.encode_video(str(yuv), bin_path, codec, 1,
                                      num_frames=n)
        assert size > 8
        with open(bin_path, "rb") as f:
            (magic,) = codec_cli.read_uints(f, 1)
            assert magic == codec_cli.MAGIC
            model_id, mq = codec_cli.read_uchars(f, 2)
            assert codec_cli.ID_TO_MODEL[model_id] == "ssf2020"
            n_dec = codec_cli.decode_video(
                f, out_yuv, lambda a, q: codec, (mq & 0x0F) + 1
            )
        assert n_dec == n
        assert os.path.getsize(out_yuv) == n * H * W * 3 // 2


class TestRGBTFileCodec:
    def test_encode_decode_rgbt_file(self, tmp_path):
        """Master/guided file coding roundtrip: beta/gamma side info in the
        container, decoder re-codes the guide from its own source."""
        from PIL import Image

        from lmic_tpu import zoo
        from lmic_tpu.utils import codec_cli

        rng = np.random.default_rng(2)
        master_path = str(tmp_path / "thermal.png")
        guide_path = str(tmp_path / "rgb.png")
        Image.fromarray(
            (rng.random((64, 64)) * 255).astype(np.uint8), mode="L"
        ).save(master_path)
        Image.fromarray(
            (rng.random((128, 128, 3)) * 255).astype(np.uint8)
        ).save(guide_path)

        guided = zoo.create_model(
            "guided", 1, key=jax.random.key(0), channel=3,
            input_size=(128, 128),
        )
        master = zoo.create_model(
            "master", 1, key=jax.random.key(1), channel=1,
            input_size=(64, 64),
        )
        guided.update(force=True)
        master.update(force=True)

        bin_path = str(tmp_path / "m.bin")
        out_path = str(tmp_path / "rec.png")
        size = codec_cli.encode_rgbt(
            master_path, guide_path, bin_path, guided, master, 1, channel=1
        )
        assert size > 8 + 2 * 64 * 4  # header + beta/gamma floats
        # the channel count comes from the container header; the factories
        # must be called with it (not a CLI flag)
        codec_cli.decode_rgbt(
            bin_path, guide_path, out_path,
            lambda ch: guided if ch == 3 else None,
            lambda ch: master if ch == 1 else None,
        )
        rec = np.asarray(Image.open(out_path))
        assert rec.shape == (64, 64)

        # decode with a wrong-sized guide source: the header geometry lets
        # this fail up front with the encoder's message, not a raw XLA
        # shape error deep inside the aligners
        small_guide = str(tmp_path / "small_guide.png")
        Image.fromarray(
            (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        ).save(small_guide)
        with pytest.raises(SystemExit, match="guide image must be 128x128"):
            codec_cli.decode_rgbt(
                bin_path, small_guide, out_path,
                lambda ch: guided if ch == 3 else None,
                lambda ch: master if ch == 1 else None,
            )

        # corrupt header geometry (H not a multiple of the master factor):
        # blamed on the bitstream, not on the (correct) guide image
        import struct

        bad_bin = tmp_path / "bad.bin"
        data = bytearray((tmp_path / "m.bin").read_bytes())
        data[6:10] = struct.pack(">I", 100)  # H field: magic(4) + 2 uchars
        bad_bin.write_bytes(bytes(data))
        with pytest.raises(SystemExit, match="corrupt or incompatible"):
            codec_cli.decode_rgbt(
                str(bad_bin), guide_path, out_path,
                lambda ch: guided if ch == 3 else None,
                lambda ch: master if ch == 1 else None,
            )

    def test_encode_rgbt_rejects_bad_geometry(self, tmp_path):
        """The RGBT container stores no padding geometry, so encode must
        reject non-multiple masters and mis-sized guides loudly instead
        of writing a stream that desyncs on decode."""
        from PIL import Image

        from lmic_tpu import zoo
        from lmic_tpu.utils import codec_cli

        rng = np.random.default_rng(3)
        bad_master = str(tmp_path / "bad.png")
        guide_path = str(tmp_path / "rgb.png")
        Image.fromarray(
            (rng.random((96, 96)) * 255).astype(np.uint8), mode="L"
        ).save(bad_master)
        Image.fromarray(
            (rng.random((128, 128, 3)) * 255).astype(np.uint8)
        ).save(guide_path)
        master = zoo.create_model(
            "master", 1, key=jax.random.key(1), channel=1,
            input_size=(64, 64),
        )
        bin_path = str(tmp_path / "m.bin")
        # 96 is not a multiple of 64: rejected before any coding happens
        with pytest.raises(SystemExit, match="multiples of 64"):
            codec_cli.encode_rgbt(
                bad_master, guide_path, bin_path, None, master, 1, channel=1
            )
        # good master but a guide that is not 2x its size
        good_master = str(tmp_path / "good.png")
        Image.fromarray(
            (rng.random((64, 64)) * 255).astype(np.uint8), mode="L"
        ).save(good_master)
        small_guide = str(tmp_path / "small.png")
        Image.fromarray(
            (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        ).save(small_guide)
        with pytest.raises(SystemExit, match="guide image must be"):
            codec_cli.encode_rgbt(
                good_master, small_guide, bin_path, None, master, 1,
                channel=1,
            )


class TestPretrainedSafety:
    def test_fetch_rejects_corrupted_download(self, tmp_path, monkeypatch):
        """A downloaded checkpoint whose sha256 does not match the 8-hex
        filename fragment must not be cached (ADVICE r2)."""
        from lmic_tpu.zoo import urls

        monkeypatch.setenv("LMIC_PRETRAINED_DIR", str(tmp_path))
        url = urls.pretrained_url("bmshj2018-factorized", 1)
        fname = url.rsplit("/", 1)[1]

        def fake_retrieve(u, dst):
            with open(dst, "wb") as f:
                f.write(b"corrupted bytes")

        import urllib.request

        monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
        with pytest.raises(RuntimeError, match="sha256"):
            urls.fetch_pretrained("bmshj2018-factorized", 1)
        assert not (tmp_path / fname).exists()

    def test_partial_coding_state_import_reports_failure(self):
        """A checkpoint with EB tables but no gaussian-conditional buffers
        must not report success on a hyperprior codec (ADVICE r2): the
        caller needs to fall back to update(force=True)."""
        import jax

        from lmic_tpu import zoo
        from lmic_tpu.zoo.pretrained import import_reference_coding_state

        donor = zoo.create_model(
            "bmshj2018-factorized", 1, key=jax.random.key(0),
            input_size=(64, 64),
        )
        donor.update(force=True)
        state_dict = {
            "entropy_bottleneck._quantized_cdf": donor.eb_state.table.cdf,
            "entropy_bottleneck._cdf_length":
                donor.eb_state.table.cdf_length,
            "entropy_bottleneck._offset": donor.eb_state.table.offset,
            "entropy_bottleneck.quantiles":
                donor.eb_state.medians.reshape(-1, 1, 1).repeat(3, 2),
        }
        hyper = zoo.create_model(
            "bmshj2018-hyperprior", 1, key=jax.random.key(0),
            input_size=(64, 64),
        )
        assert import_reference_coding_state(state_dict, hyper) is False
        # the factorized codec needs no GC state: same checkpoint imports
        fac = zoo.create_model(
            "bmshj2018-factorized", 1, key=jax.random.key(1),
            input_size=(64, 64),
        )
        assert import_reference_coding_state(state_dict, fac) is True

        # a cdf with EMPTY companion buffers (a non-deployment save caught
        # mid-update) must report no-baked-tables, not crash on None
        broken = dict(state_dict)
        broken["entropy_bottleneck._cdf_length"] = np.zeros(0, np.int32)
        fac2 = zoo.create_model(
            "bmshj2018-factorized", 1, key=jax.random.key(2),
            input_size=(64, 64),
        )
        assert import_reference_coding_state(broken, fac2) is False
        assert fac2.eb_state is None  # side-effect-free failure
