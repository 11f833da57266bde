"""Model integration tests (modeled on the reference tests/test_models.py +
test_codec.py): forward shapes, compress/decompress roundtrip consistency,
and the forward-vs-codec bpp agreement that pins the entropy-coded size to
the likelihood estimate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmic_tpu import zoo


def _make(arch, N=32, M=48, channel=3, size=(64, 64)):
    """Small-width model for test speed (zoo sizes are too slow on CPU)."""
    module_cls, codec_cls = zoo.model_architectures[arch]
    module = module_cls(N=N, M=M, channel=channel)
    key = jax.random.key(0)
    x = jnp.zeros((1, *size, channel))
    variables = module.init(
        {"params": key, "noise": jax.random.fold_in(key, 1)}, x
    )
    return codec_cls(module, variables)


ARCHS = ["bmshj2018-factorized", "bmshj2018-hyperprior", "mbt2018-mean"]


@pytest.mark.parametrize("arch", ARCHS)
class TestForward:
    def test_forward_shapes_and_likelihoods(self, arch):
        codec = _make(arch)
        x = jax.random.uniform(jax.random.key(2), (2, 64, 64, 3))
        out = codec(x, training=True, key=jax.random.key(3))
        assert out["x_hat"].shape == x.shape
        for lik in out["likelihoods"].values():
            a = np.asarray(lik)
            assert np.all(a > 0) and np.all(a <= 1)

    def test_eval_forward_deterministic(self, arch):
        codec = _make(arch)
        x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
        o1 = codec(x, training=False)
        o2 = codec(x, training=False)
        np.testing.assert_array_equal(
            np.asarray(o1["x_hat"]), np.asarray(o2["x_hat"])
        )

    def test_aux_loss_finite(self, arch):
        codec = _make(arch)
        assert np.isfinite(float(codec.aux_loss()))


@pytest.mark.parametrize("arch", ARCHS)
class TestCodecRoundtrip:
    def test_compress_decompress(self, arch):
        codec = _make(arch)
        codec.update(force=True)
        x = jax.random.uniform(jax.random.key(4), (2, 64, 64, 3))
        out = codec.compress(np.asarray(x))
        assert "strings" in out and "shape" in out
        rec = codec.decompress(out["strings"], out["shape"])
        x_hat = rec["x_hat"]
        assert x_hat.shape == x.shape
        assert np.all(x_hat >= 0) and np.all(x_hat <= 1)
        # codec reconstruction must match the eval-mode forward reconstruction
        fwd = codec(x, training=False)
        np.testing.assert_allclose(
            x_hat,
            np.clip(np.asarray(fwd["x_hat"]), 0, 1),
            atol=1e-3,
        )

    def test_coded_size_close_to_likelihood_estimate(self, arch):
        # real bitstream length should be within ~10% + overhead of the
        # entropy estimate from the eval forward
        codec = _make(arch)
        codec.update(force=True)
        x = jax.random.uniform(jax.random.key(5), (1, 64, 64, 3))
        fwd = codec(x, training=False)
        est_bits = sum(
            float(-jnp.sum(jnp.log2(lik)))
            for lik in fwd["likelihoods"].values()
        )
        out = codec.compress(np.asarray(x))
        real_bits = sum(
            len(s) * 8 for group in out["strings"] for s in group
        )
        assert real_bits < est_bits * 1.15 + 1500
        assert real_bits > est_bits * 0.5


class TestZoo:
    def test_cfg_tables(self):
        assert zoo.cfgs["bmshj2018-factorized"][1] == (128, 192)
        assert zoo.cfgs["bmshj2018-factorized"][8] == (192, 320)
        assert zoo.cfgs["mbt2018-mean"][5] == (192, 320)
        assert zoo.cfgs["mbt2018"][1] == (192, 192)
        assert zoo.cfgs["cheng2020-anchor"][4] == (192,)

    def test_invalid_arch_raises(self):
        with pytest.raises(ValueError):
            zoo.make_module("nope", 1)
        with pytest.raises(ValueError):
            zoo.make_module("bmshj2018-factorized", 99)

    def test_create_model_smoke(self):
        codec = zoo.create_model(
            "bmshj2018-factorized", quality=1, input_size=(64, 64)
        )
        x = jnp.zeros((1, 64, 64, 3))
        out = codec(x, training=False)
        assert out["x_hat"].shape == x.shape


class TestAsyncCodecAPI:
    def test_async_matches_sync(self):
        import jax

        from lmic_tpu import zoo

        codec = zoo.create_model(
            "bmshj2018-factorized", 1, key=jax.random.key(0),
            input_size=(64, 64),
        )
        codec.update(force=True)
        x = (np.random.default_rng(0).random((2, 64, 64, 3)) * 255
             ).astype(np.uint8)
        out_sync = codec.compress(x)
        out_async = codec.compress_async(x)()
        assert out_sync["strings"][0] == out_async["strings"][0]
        rec_sync = codec.decompress(out_sync["strings"], out_sync["shape"],
                                    u8=True)
        rec_async = codec.decompress_async(
            out_async["strings"], out_async["shape"]
        )()
        np.testing.assert_array_equal(rec_sync["x_hat"], rec_async["x_hat"])


class TestInt8SymbolFallback:
    def test_overflow_falls_back_to_int16(self):
        import jax
        import jax.numpy as jnp

        from lmic_tpu import zoo

        codec = zoo.create_model(
            "bmshj2018-factorized", 1, key=jax.random.key(0),
            input_size=(64, 64),
        )
        codec.update(force=True)
        codec._build_u8_fns()
        x_dev = jnp.zeros((1, 64, 64, 3), jnp.uint8)
        # fabricate a packed buffer with the overflow flag set and wrapped
        # int8 symbols in the payload
        wrapped = np.full(codec.module.M * 4 * 4, 255, np.uint8)
        packed = jnp.asarray(np.concatenate([[1], wrapped]).astype(np.uint8))
        sym = codec._fetch_symbols(x_dev, packed)
        # fallback must have rerun the int16 pass on x_dev, ignoring `wrapped`
        true16 = np.asarray(codec._enc_u8(x_dev))
        np.testing.assert_array_equal(sym, true16)

    def test_no_overflow_uses_int8(self):
        import jax
        import jax.numpy as jnp

        from lmic_tpu import zoo

        codec = zoo.create_model(
            "bmshj2018-factorized", 1, key=jax.random.key(0),
            input_size=(64, 64),
        )
        codec.update(force=True)
        codec._build_u8_fns()
        x = (np.random.default_rng(0).random((1, 64, 64, 3)) * 255
             ).astype(np.uint8)
        x_dev = jnp.asarray(x)
        packed = codec._enc_u8_packed(x_dev)
        assert int(np.asarray(packed)[0]) == 0  # overflow flag clear
        got = codec._fetch_symbols(x_dev, packed)
        assert got.dtype == np.int8  # no-overflow path stays on the wire dtype
        true16 = np.asarray(codec._enc_u8(x_dev))
        np.testing.assert_array_equal(got, true16)


class TestHyperpriorU8FastPath:
    @pytest.mark.parametrize("arch", ["bmshj2018-hyperprior", "mbt2018-mean"])
    def test_matches_float_path(self, arch):
        import jax

        from lmic_tpu import zoo

        codec = zoo.create_model(
            arch, 1, key=jax.random.key(0), input_size=(64, 64)
        )
        codec.update(force=True)
        x8 = (np.random.default_rng(0).random((2, 64, 64, 3)) * 255
              ).astype(np.uint8)
        out8 = codec.compress(x8)
        rec8 = codec.decompress(out8["strings"], out8["shape"], u8=True)
        xf = x8.astype(np.float32) / 255.0
        outf = codec.compress(xf)
        recf = codec.decompress(outf["strings"], outf["shape"])
        # same pixels -> same symbols -> identical streams
        assert out8["strings"][0] == outf["strings"][0]
        assert out8["strings"][1] == outf["strings"][1]
        want = np.round(np.clip(recf["x_hat"], 0, 1) * 255).astype(np.uint8)
        np.testing.assert_array_equal(rec8["x_hat"], want)


class TestNonMultipleDims:
    def test_factorized_u8_path_handles_non_multiple_of_16(self):
        """The conv stacks emit ceil(H/2) per stride-2 stage, so a 72x40
        input yields 5x3 latents — the packed single-fetch encode must
        unpack with the same ceil-division geometry (it used to floor)."""
        codec = _make("bmshj2018-factorized", size=(72, 40))
        codec.update(force=True)
        x8 = (np.random.default_rng(1).random((1, 72, 40, 3)) * 255
              ).astype(np.uint8)
        out8 = codec.compress(x8)
        assert tuple(out8["shape"]) == (5, 3)  # ceil(72/16), ceil(40/16)
        xf = x8.astype(np.float32) / 255.0
        outf = codec.compress(xf)
        assert out8["strings"][0] == outf["strings"][0]
        rec = codec.decompress(out8["strings"], out8["shape"])
        assert rec["x_hat"].shape == (1, 80, 48, 3)  # latent * 16

    def test_hyperprior_rejects_non_multiple_of_64(self):
        """The hyperprior decoder re-derives the y geometry by upsampling z
        4x, so non-64-multiple inputs would silently desync encode/decode
        (the reference corrupts streams in this case; we raise)."""
        codec = _make("bmshj2018-hyperprior", size=(64, 64))
        codec.update(force=True)
        bad = np.zeros((1, 72, 64, 3), np.float32)
        with pytest.raises(ValueError, match="multiples of 64"):
            codec.compress(bad)
        with pytest.raises(ValueError, match="multiples of 64"):
            codec.compress((bad * 255).astype(np.uint8))


class TestUpdateInvalidation:
    def test_reupdate_refreshes_cached_jits(self):
        """update(force=True) after use must invalidate captured coding
        state (u8 jits capture medians; AR scans capture the scale table)."""
        import jax

        from lmic_tpu import zoo

        codec = zoo.create_model(
            "bmshj2018-hyperprior", 1, key=jax.random.key(0),
            input_size=(64, 64),
        )
        codec.update(force=True)
        x8 = (np.random.default_rng(0).random((1, 64, 64, 3)) * 255
              ).astype(np.uint8)
        out1 = codec.compress(x8)
        codec.update(force=True)  # same params -> same tables
        out2 = codec.compress(x8)
        assert out1["strings"][0] == out2["strings"][0]
        rec = codec.decompress(out2["strings"], out2["shape"], u8=True)
        assert rec["x_hat"].shape == x8.shape

    def test_ar_scan_cache_cleared_on_update(self):
        import jax

        from lmic_tpu import zoo

        codec = zoo.create_model(
            "mbt2018", 1, key=jax.random.key(0), input_size=(64, 64)
        )
        codec.update(force=True)
        x = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
        out = codec.compress(x)
        assert codec._encode_scan_cache
        codec.update(force=True)
        assert not codec._encode_scan_cache
        out2 = codec.compress(x)
        assert out["strings"][0] == out2["strings"][0]


class TestHyperpriorAsync:
    def test_async_matches_sync(self):
        import jax

        from lmic_tpu import zoo

        codec = zoo.create_model(
            "mbt2018-mean", 1, key=jax.random.key(0), input_size=(64, 64)
        )
        codec.update(force=True)
        x8 = (np.random.default_rng(0).random((2, 64, 64, 3)) * 255
              ).astype(np.uint8)
        out_s = codec.compress(x8)
        out_a = codec.compress_async(x8)()
        assert out_s["strings"][0] == out_a["strings"][0]
        assert out_s["strings"][1] == out_a["strings"][1]
        rec_s = codec.decompress(out_s["strings"], out_s["shape"], u8=True)
        rec_a = codec.decompress_async(out_a["strings"], out_a["shape"])()
        np.testing.assert_array_equal(rec_s["x_hat"], rec_a["x_hat"])


class TestThreadedDecode:
    def test_threaded_decode_matches_inline(self, monkeypatch):
        """LMIC_DECODE_THREAD=1 moves decompress_async's host half to the
        codec's worker thread; outputs must match the inline path."""
        import os

        from lmic_tpu import zoo

        codec = zoo.create_model(
            "bmshj2018-hyperprior", 1, key=jax.random.key(0),
            input_size=(64, 64), N=16, M=24,
        )
        codec.update(force=True)
        x = (np.random.default_rng(3).random((2, 64, 64, 3)) * 255).astype(
            np.uint8
        )
        out = codec.compress_async(x)()

        monkeypatch.delenv("LMIC_DECODE_THREAD", raising=False)
        inline = codec.decompress_async(out["strings"], out["shape"])()
        monkeypatch.setenv("LMIC_DECODE_THREAD", "1")
        threaded = codec.decompress_async(out["strings"], out["shape"])()
        np.testing.assert_array_equal(inline["x_hat"], threaded["x_hat"])
