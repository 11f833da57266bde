"""AOT serving-bundle tests: an exported bundle must reconstitute a codec
(without model code or weights) that codes bit-identical streams and
reconstructions to the live codec it was exported from."""

import jax
import numpy as np
import pytest

from lmic_tpu import zoo
from lmic_tpu.utils.aot import export_serving_bundle, load_serving_bundle

SHAPE = (2, 64, 64, 3)


def _live(arch):
    codec = zoo.create_model(
        arch, 1, key=jax.random.key(0), input_size=SHAPE[1:3]
    )
    codec.update(force=True)
    return codec


def _pixels(seed=0):
    return (np.random.default_rng(seed).random(SHAPE) * 255).astype(
        np.uint8
    )


@pytest.mark.parametrize(
    "arch",
    ["bmshj2018-factorized", "bmshj2018-hyperprior", "mbt2018-mean"],
)
class TestBundleRoundtrip:
    def test_bit_equal_to_live_codec(self, arch, tmp_path):
        live = _live(arch)
        x = _pixels()
        want = live.compress(x)
        want_rec = live.decompress(want["strings"], want["shape"], u8=True)

        bundle = str(tmp_path / "bundle")
        export_serving_bundle(live, bundle, SHAPE)
        served = load_serving_bundle(bundle)
        got = served.compress(x)
        assert got["strings"] == want["strings"]
        assert tuple(got["shape"]) == tuple(want["shape"])
        got_rec = served.decompress(got["strings"], got["shape"], u8=True)
        np.testing.assert_array_equal(got_rec["x_hat"], want_rec["x_hat"])

    def test_async_api_served(self, arch, tmp_path):
        live = _live(arch)
        bundle = str(tmp_path / "bundle")
        export_serving_bundle(live, bundle, SHAPE)
        served = load_serving_bundle(bundle)
        x = _pixels(1)
        out = served.compress_async(x)()
        rec = served.decompress_async(out["strings"], out["shape"])()
        want = live.compress(x)
        assert out["strings"] == want["strings"]
        assert rec["x_hat"].shape == SHAPE and rec["x_hat"].dtype == np.uint8


class TestVideoBundle:
    """ssf2020 bundle: the whole-GOP chain (3 sub-codecs) exports and
    serves bit-equal, fixed to the (B, T, H, W, C) GOP shape."""

    GOP = (1, 3, 128, 128, 3)

    def test_bit_equal_to_live_codec(self, tmp_path):
        live = zoo.create_video_model(
            "ssf2020", 1, key=jax.random.key(0), input_size=self.GOP[2:4]
        )
        live.update(force=True)
        frames = (np.random.default_rng(3).random(self.GOP) * 255).astype(
            np.uint8
        )
        want_s, want_sh = live.compress(frames)
        want_rec = live.decompress(want_s, want_sh, u8=True)

        bundle = str(tmp_path / "bundle")
        export_serving_bundle(live, bundle, self.GOP)
        served = load_serving_bundle(bundle)
        got_s, got_sh = served.compress(frames)
        assert got_s == want_s
        rec = served.decompress(got_s, got_sh, u8=True)
        np.testing.assert_array_equal(rec, want_rec)
        # async serving APIs ride the same graphs
        out = served.compress_async(frames)()
        assert out[0] == want_s
        rec2 = served.decompress_async(got_s, got_sh, u8=True)()
        np.testing.assert_array_equal(rec2, want_rec)
        # frozen-bundle guards
        with pytest.raises(RuntimeError, match="uint8 fast path"):
            served.compress(frames.astype(np.float32))
        with pytest.raises(ValueError, match="fixed to input shape"):
            served.compress(frames[:, :2])
        with pytest.raises(RuntimeError, match="uint8 fast path"):
            served.decompress(got_s, got_sh)
        # decompress request structure is validated too (a mismatch would
        # otherwise die inside jax.export with an opaque pytree error)
        with pytest.raises(ValueError, match="3-frame GOPs"):
            served.decompress(got_s[:2], got_sh[:2], u8=True)
        # the async entry points share the guards
        with pytest.raises(RuntimeError, match="uint8 fast path"):
            served.compress_async(frames.astype(np.float32))
        with pytest.raises(RuntimeError, match="uint8 fast path"):
            served.decompress_async(got_s, got_sh, u8=False)
        with pytest.raises(RuntimeError, match="frozen"):
            served.update(force=True)

    def test_shape_validation(self, tmp_path):
        live = zoo.create_video_model(
            "ssf2020", 1, key=jax.random.key(0), input_size=(128, 128)
        )
        live.update(force=True)
        with pytest.raises(ValueError, match="GOP of >= 2"):
            export_serving_bundle(live, str(tmp_path / "b"),
                                  (1, 1, 128, 128, 3))
        with pytest.raises(ValueError, match="B, T, H, W, C"):
            export_serving_bundle(live, str(tmp_path / "b"),
                                  (1, 128, 128, 3))
        # ssf2020 downsamples 2^7: a 64- but not 128-multiple must be
        # rejected up front, not crash inside jax.eval_shape
        with pytest.raises(ValueError, match="128-multiple"):
            export_serving_bundle(live, str(tmp_path / "b"),
                                  (1, 2, 1088, 1920, 3))


class TestShardedBundle:
    """shard_codec BEFORE export → SPMD bundle served over a same-size
    mesh, bit-equal to the live sharded codec."""

    SHARD_SHAPE = (8, 64, 64, 3)

    @pytest.mark.parametrize(
        "arch", ["bmshj2018-factorized", "bmshj2018-hyperprior"]
    )
    def test_bit_equal_over_mesh(self, arch, tmp_path):
        from lmic_tpu.parallel import make_mesh, shard_codec

        live = _live(arch)
        mesh = make_mesh()
        shard_codec(live, mesh)
        x = (np.random.default_rng(2).random(self.SHARD_SHAPE) * 255
             ).astype(np.uint8)
        want = live.compress(x)

        bundle = str(tmp_path / "bundle")
        export_serving_bundle(live, bundle, self.SHARD_SHAPE)
        served = load_serving_bundle(bundle, mesh=make_mesh())
        got = served.compress(x)
        assert got["strings"] == want["strings"]
        rec = served.decompress(got["strings"], got["shape"], u8=True)
        want_rec = live.decompress(want["strings"], want["shape"], u8=True)
        np.testing.assert_array_equal(rec["x_hat"], want_rec["x_hat"])

    def test_mesh_size_checked(self, tmp_path):
        from lmic_tpu.parallel import make_mesh, shard_codec

        live = _live("bmshj2018-factorized")
        shard_codec(live, make_mesh())
        bundle = str(tmp_path / "bundle")
        export_serving_bundle(live, bundle, self.SHARD_SHAPE)
        with pytest.raises(ValueError, match="exported for 8 devices"):
            load_serving_bundle(bundle, mesh=make_mesh(2))

    def test_unsharded_bundle_rejects_mesh(self, tmp_path):
        from lmic_tpu.parallel import make_mesh

        live = _live("bmshj2018-factorized")
        bundle = str(tmp_path / "bundle")
        export_serving_bundle(live, bundle, SHAPE)
        with pytest.raises(ValueError, match="unsharded"):
            load_serving_bundle(bundle, mesh=make_mesh(2))


class TestBundleGuards:
    def test_wrong_shape_and_dtype_rejected(self, tmp_path):
        live = _live("bmshj2018-factorized")
        bundle = str(tmp_path / "bundle")
        export_serving_bundle(live, bundle, SHAPE)
        served = load_serving_bundle(bundle)
        with pytest.raises(ValueError, match="fixed to input shape"):
            served.compress(np.zeros((1, 64, 64, 3), np.uint8))
        with pytest.raises(RuntimeError, match="uint8 fast path"):
            served.compress(np.zeros(SHAPE, np.float32))
        with pytest.raises(RuntimeError, match="uint8 fast path"):
            served.decompress([[b""]], (4, 4))
        with pytest.raises(RuntimeError, match="frozen"):
            served.update(force=True)

    def test_wrong_decompress_geometry_rejected(self, tmp_path):
        live = _live("bmshj2018-factorized")
        bundle = str(tmp_path / "bundle")
        export_serving_bundle(live, bundle, SHAPE)
        served = load_serving_bundle(bundle)
        out = served.compress(_pixels())
        # wrong latent shape: clear ValueError, not a jax.export failure
        with pytest.raises(ValueError, match="latent shape"):
            served.decompress(out["strings"], (5, 5), u8=True)
        with pytest.raises(ValueError, match="latent shape"):
            served.decompress_async(out["strings"], (5, 5))
        # wrong stream batch count
        with pytest.raises(ValueError, match="batch size"):
            served.decompress(
                [out["strings"][0][:1]], out["shape"], u8=True
            )
        # the valid geometry still decodes
        rec = served.decompress(out["strings"], out["shape"], u8=True)
        assert rec["x_hat"].shape == SHAPE

    def test_ar_codec_rejected(self, tmp_path):
        live = _live("mbt2018")
        with pytest.raises(ValueError, match="io_callback"):
            export_serving_bundle(live, str(tmp_path / "b"), SHAPE)

    def test_shard_codec_rejects_bundle(self, tmp_path):
        from lmic_tpu.parallel import make_mesh, shard_codec

        live = _live("bmshj2018-factorized")
        bundle = str(tmp_path / "bundle")
        export_serving_bundle(live, bundle, SHAPE)
        served = load_serving_bundle(bundle)
        with pytest.raises(ValueError, match="frozen at a fixed input"):
            shard_codec(served, make_mesh(2))

    def test_format_version_checked(self, tmp_path):
        import json
        import os

        live = _live("bmshj2018-factorized")
        bundle = str(tmp_path / "bundle")
        export_serving_bundle(live, bundle, SHAPE)
        meta_path = os.path.join(bundle, "meta.json")
        meta = json.load(open(meta_path))
        meta["format"] = 999
        json.dump(meta, open(meta_path, "w"))
        with pytest.raises(ValueError, match="unsupported bundle"):
            load_serving_bundle(bundle)
        # video bundles carry their own format (prefixed state keys a
        # format-1 loader cannot read) so the gate must also reject a
        # family/format mismatch, not just unknown numbers
        meta["format"] = 1
        meta["family"] = "video"
        json.dump(meta, open(meta_path, "w"))
        with pytest.raises(ValueError, match="unsupported bundle"):
            load_serving_bundle(bundle)
