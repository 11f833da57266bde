"""ScaleSpaceFlow (ssf2020) tests: training forward over a GOP, aux loss,
and the frame-chained compress/decompress roundtrip whose decoder must
reproduce the encoder-side reconstructions bit-exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmic_tpu.models.video import ScaleSpaceFlow, ScaleSpaceFlowCodec


@pytest.fixture(scope="module")
def codec():
    module = ScaleSpaceFlow()
    frames = jnp.zeros((1, 2, 128, 128, 3))
    v = module.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, frames
    )
    return ScaleSpaceFlowCodec(module, v)


class TestForward:
    def test_training_forward(self, codec):
        frames = jax.random.uniform(jax.random.key(2), (1, 3, 128, 128, 3))
        out = codec(frames, training=True, key=jax.random.key(3))
        assert out["x_hat"].shape == frames.shape
        assert len(out["likelihoods"]) == 3
        assert "keyframe" in out["likelihoods"][0]
        assert "motion" in out["likelihoods"][1]
        assert "residual" in out["likelihoods"][1]
        for frame_lk in out["likelihoods"]:
            for group in frame_lk.values():
                for lik in group.values():
                    assert np.all(np.asarray(lik) > 0)

    def test_aux_loss(self, codec):
        aux = codec.aux_loss()
        assert np.isfinite(float(aux))

    def test_grads_flow(self, codec):
        module = codec.module

        def loss_fn(params, frames):
            out = module.apply(
                {"params": params},
                frames,
                training=True,
                rngs={"noise": jax.random.key(0)},
            )
            return jnp.mean((out["x_hat"] - frames) ** 2)

        frames = jax.random.uniform(jax.random.key(2), (1, 2, 128, 128, 3))
        g = jax.grad(loss_fn)(codec.variables["params"], frames)
        total = sum(
            float(jnp.abs(x).sum()) for x in jax.tree.leaves(g)
        )
        assert np.isfinite(total) and total > 0


class TestCodecRoundtrip:
    def test_compress_decompress_gop(self, codec):
        codec.update(force=True)
        frames = np.asarray(
            jax.random.uniform(jax.random.key(4), (1, 3, 128, 128, 3))
        )
        strings, shapes = codec.compress(frames)
        assert len(strings) == 3
        rec = codec.decompress(strings, shapes)
        assert rec.shape == frames.shape
        assert np.all(np.isfinite(rec))

    def test_decoder_matches_encoder_reconstruction(self, codec):
        codec.update(force=True)
        frames = np.asarray(
            jax.random.uniform(jax.random.key(5), (1, 2, 128, 128, 3))
        )
        # encoder-side reconstructions
        x_ref_enc, out_key = codec.encode_keyframe(frames[:, 0])
        x_rec_enc, out_inter = codec.encode_inter(frames[:, 1], x_ref_enc)
        # decoder side
        x_ref_dec = codec.decode_keyframe(out_key["strings"], out_key["shape"])
        np.testing.assert_array_equal(x_ref_enc, x_ref_dec)
        x_rec_dec = codec.decode_inter(
            x_ref_dec, out_inter["strings"], out_inter["shape"]
        )
        np.testing.assert_array_equal(x_rec_enc, x_rec_dec)


class TestFanout:
    def test_fanout_matches_single_device(self, codec):
        """shard_codec routes the video codec to per-device sequence
        chunks; strings and reconstructions must be bit-equal to the
        single-device path (homogeneous virtual CPU mesh)."""
        from lmic_tpu.parallel import make_mesh, shard_codec

        codec.update()
        frames = np.asarray(
            jax.random.uniform(jax.random.key(9), (2, 2, 128, 128, 3))
        )
        single_strings, single_shapes = codec.compress(frames)
        rec_single = codec.decompress(single_strings, single_shapes)

        fan = shard_codec(codec, make_mesh(2))
        try:
            fan_strings, fan_shapes = fan.compress(frames)
            assert fan_strings == single_strings
            assert fan_shapes == single_shapes
            rec_fan = fan.decompress(fan_strings, fan_shapes)
            np.testing.assert_array_equal(rec_fan, rec_single)
        finally:
            codec._fanout_devices = None

    def test_async_with_fanout_matches_single_device(self, codec):
        """compress_async/decompress_async on a fanned-out codec must
        route multi-sequence batches through the chunked fan-out path
        (the async GOP pipeline is single-sequence by design) and stay
        bit-equal to the single-device sync path."""
        from lmic_tpu.parallel import make_mesh, shard_codec

        codec.update()
        frames = np.asarray(
            jax.random.uniform(jax.random.key(13), (2, 2, 128, 128, 3))
        )
        single_strings, single_shapes = codec.compress(frames)
        rec_single = codec.decompress(single_strings, single_shapes)

        shard_codec(codec, make_mesh(2))
        try:
            fan_strings, fan_shapes = codec.compress_async(frames)()
            assert fan_strings == single_strings
            assert fan_shapes == single_shapes
            rec_fan = codec.decompress_async(fan_strings, fan_shapes, u8=False)()
            np.testing.assert_array_equal(rec_fan, rec_single)
        finally:
            codec._fanout_devices = None


class TestU8PixelPath:
    def test_u8_matches_f32_path(self, codec):
        """uint8 frames convert on device (thin link transfers); streams
        and reconstructions must match the f32 path bit-for-bit."""
        codec.update()
        rng = np.random.default_rng(11)
        u8 = (rng.random((1, 2, 128, 128, 3)) * 255).astype(np.uint8)
        f32 = u8.astype(np.float32) / 255.0

        s_u8, sh_u8 = codec.compress(u8)
        s_f32, sh_f32 = codec.compress(f32)
        assert s_u8 == s_f32
        assert sh_u8 == sh_f32

        rec_u8 = codec.decompress(s_u8, sh_u8, u8=True)
        assert rec_u8.dtype == np.uint8
        rec_f32 = codec.decompress(s_f32, sh_f32)
        np.testing.assert_array_equal(
            rec_u8,
            np.round(np.clip(rec_f32, 0.0, 1.0) * 255.0).astype(np.uint8),
        )


class TestDeploymentCheckpoint:
    def test_video_deployment_roundtrip(self, codec, tmp_path):
        """update_model_file stores the three sub-codecs' coding tables
        (hp_states blob); a reloaded codec must produce byte-identical
        bitstreams."""
        from lmic_tpu.utils.checkpoint import (
            load_updated_model,
            update_model_file,
        )

        codec.update()
        out = update_model_file(
            str(tmp_path / "in.ckpt"), str(tmp_path), codec, "ssf-test",
            update=False,
        )
        fresh = ScaleSpaceFlowCodec(codec.module, codec.variables)
        fresh = load_updated_model(out, fresh)

        frames = np.asarray(
            jax.random.uniform(jax.random.key(21), (1, 2, 128, 128, 3))
        )
        s_a, sh_a = codec.compress(frames)
        s_b, sh_b = fresh.compress(frames)
        assert s_a == s_b and sh_a == sh_b
        np.testing.assert_array_equal(
            codec.decompress(s_a, sh_a), fresh.decompress(s_b, sh_b)
        )


class TestFastPathEquivalence:
    def test_gop_fast_path_matches_sync_path(self, codec):
        """The whole-GOP single-fetch encode and two-sync decode must be
        byte- and bit-identical to the reference-shaped per-frame loop
        (the overflow fallback path), which shares every compiled graph."""
        codec.update(force=True)
        frames = jnp.asarray(
            np.random.default_rng(9).random((1, 3, 128, 128, 3)),
            jnp.float32,
        )
        s_fast, sh_fast = codec._compress_chunk(frames)
        s_sync, sh_sync = codec._compress_chunk_sync(frames)
        assert sh_fast == sh_sync

        def flat(strs):
            out = []
            for fs in strs:
                if isinstance(fs, dict):
                    for k in ("motion", "residual"):
                        out.extend(bytes(s) for grp in fs[k] for s in grp)
                else:
                    out.extend(bytes(s) for grp in fs for s in grp)
            return out

        assert flat(s_fast) == flat(s_sync)
        rec_fast = codec._decompress_chunk(s_fast, sh_fast)
        rec_sync = codec._decompress_chunk_sync(s_fast, sh_fast)
        np.testing.assert_array_equal(rec_fast, rec_sync)


class TestGeometryGuard:
    def test_non_multiple_dims_rejected(self):
        """ssf2020 streams only roundtrip when H, W divide 128 (enc /16,
        hyper /8); compress must reject loudly instead of a broadcast
        error deep inside the compiled GOP graph."""
        import jax

        from lmic_tpu import zoo

        codec = zoo.create_video_model(
            "ssf2020", 1, key=jax.random.key(0), input_size=(128, 128)
        )
        codec.update(force=True)
        bad = np.zeros((1, 2, 96, 128, 3), np.uint8)
        with pytest.raises(ValueError, match="multiples of 128"):
            codec.compress(bad)
        with pytest.raises(ValueError, match="multiples of 128"):
            codec.compress_async(bad)
