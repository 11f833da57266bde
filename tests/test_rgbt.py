"""RGB-T Guided/Master model tests: hidden-tap plumbing, Swin cross-attention
shapes/masking, channel-aligner side info, and the conditioned codec
roundtrip (decoder sees only bitstream + beta/gamma + guide recon)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmic_tpu.models.rgbt import (
    ChannelAligner,
    GuidedCodec,
    GuidedCompresser,
    MasterCodec,
    MasterCompresser,
    SpatialAligner,
    WindowCrossAttention,
    _relative_position_index,
    _shift_attn_mask,
    window_partition,
    window_reverse,
)


@pytest.fixture(scope="module")
def guided_pair():
    guided = GuidedCompresser(N=32, M=48, channel=1, first_stride=2)
    xg = jax.random.uniform(jax.random.key(0), (1, 64, 64, 1))
    vg = guided.init(
        {"params": jax.random.key(1), "noise": jax.random.key(2)}, xg
    )
    codec = GuidedCodec(guided, vg)
    codec.update(force=True)
    return codec, np.asarray(xg)


@pytest.fixture(scope="module")
def guided_out(guided_pair):
    codec, xg = guided_pair
    out = codec.compress(xg)
    dec = codec.decompress(out["strings"], out["shape"])
    return out, dec


class TestSwinPieces:
    def test_window_partition_roundtrip(self):
        x = jax.random.normal(jax.random.key(0), (2, 8, 12, 16))
        w = window_partition(x, 4)
        assert w.shape == (2 * 2 * 3, 16, 16)
        back = window_reverse(w, 4, 8, 12)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_relative_position_index(self):
        idx = _relative_position_index(4)
        assert idx.shape == (16, 16)
        assert idx.min() >= 0 and idx.max() < 49  # (2*4-1)^2

    def test_shift_mask_blocks_cross_region(self):
        mask = _shift_attn_mask(8, 8, 4, 2)
        assert mask.shape == (4, 16, 16)
        assert set(np.unique(mask)) <= {0.0, -100.0}
        # the first window (interior) has no masking
        assert np.all(mask[0] == 0)
        # shifted boundary windows do
        assert (mask[-1] == -100.0).any()

    def test_cross_attention_uses_guide(self):
        attn = WindowCrossAttention(dim=32, window_size=4, num_heads=4)
        x = jax.random.normal(jax.random.key(0), (2, 16, 32))
        g1 = jax.random.normal(jax.random.key(1), (2, 16, 32))
        g2 = jax.random.normal(jax.random.key(2), (2, 16, 32))
        v = attn.init(jax.random.key(3), x, g1)
        o1 = attn.apply(v, x, g1)
        o2 = attn.apply(v, x, g2)
        assert o1.shape == x.shape
        assert np.abs(np.asarray(o1 - o2)).max() > 1e-4  # guide matters

    def test_spatial_aligner_shapes(self):
        sa = SpatialAligner(out_channel=32)
        x = jax.random.normal(jax.random.key(0), (1, 16, 16, 32))
        g = jax.random.normal(jax.random.key(1), (1, 16, 16, 32))
        v = sa.init(jax.random.key(2), x, g)
        out = sa.apply(v, x, g)
        assert out.shape == (1, 16, 16, 32)


class TestChannelAligner:
    def test_affine_and_side_info(self):
        ca = ChannelAligner()
        xf = jax.random.normal(jax.random.key(0), (2, 8, 8, 64))
        gf = jax.random.normal(jax.random.key(1), (2, 8, 8, 64))
        v = ca.init(jax.random.key(2), xf, gf)
        aligned, beta, gamma = ca.apply(v, xf, gf)
        assert beta.shape == (2, 1, 1, 64) and gamma.shape == (2, 1, 1, 64)
        np.testing.assert_allclose(
            np.asarray(aligned), np.asarray(gamma * gf + beta), atol=1e-6
        )


class TestGuided:
    def test_forward_emits_hidden(self, guided_pair):
        codec, xg = guided_pair
        out = codec(jnp.asarray(xg), training=True, key=jax.random.key(3))
        assert set(out["hidden"]) == {"ga1", "ga2", "ga3", "gs1", "gs2", "gs3"}
        assert out["x_hat"].shape == xg.shape

    def test_u8_compress_hidden_matches_float(self, guided_pair):
        """uint8 compress (the inherited fast path) must emit the SAME
        hidden maps as the float path on the same pixels — the side
        computation normalizes before g_a like the base codec's jits do
        (a raw 0-255 feed would silently corrupt the master's features)."""
        codec, _ = guided_pair
        x8 = (np.random.default_rng(5).random((1, 64, 64, 1)) * 255
              ).astype(np.uint8)
        out8 = codec.compress(x8)
        outf = codec.compress(x8.astype(np.float32) / 255.0)
        for k in ("ga1", "ga2", "ga3"):
            np.testing.assert_array_equal(
                np.asarray(out8["hidden"][k]), np.asarray(outf["hidden"][k])
            )
        # hidden=False skips the extra analysis pass but keeps the streams
        lean = codec.compress(x8, hidden=False)
        assert "hidden" not in lean
        assert [bytes(s) for g in lean["strings"] for s in g] == [
            bytes(s) for g in out8["strings"] for s in g
        ]

    def test_compress_reconstruct_matches_decompress(self, guided_pair):
        """reconstruct=True must yield the DECODER's exact output — same
        streams, bit-equal x_hat and gs* hidden maps as a real
        decompress() of those streams (the encoder-side shortcut the RGBT
        flow uses instead of decompressing its own guide streams)."""
        codec, _ = guided_pair
        x8 = (np.random.default_rng(7).random((1, 64, 64, 1)) * 255
              ).astype(np.uint8)
        enc = codec.compress(x8, hidden=False, reconstruct=True)
        ref = codec.compress(x8, hidden=False)
        assert [bytes(s) for g in enc["strings"] for s in g] == [
            bytes(s) for g in ref["strings"] for s in g
        ]
        dec = codec.decompress(ref["strings"], ref["shape"])
        np.testing.assert_array_equal(
            np.asarray(enc["x_hat"]), np.asarray(dec["x_hat"])
        )
        for k in ("gs1", "gs2", "gs3"):
            np.testing.assert_array_equal(
                np.asarray(enc["hidden_dec"][k]),
                np.asarray(dec["hidden"][k]),
            )

    def test_compress_decompress_hidden(self, guided_out):
        out, dec = guided_out
        assert set(out["hidden"]) == {"ga1", "ga2", "ga3"}
        assert set(dec["hidden"]) == {"gs1", "gs2", "gs3"}
        assert dec["x_hat"].shape == (1, 64, 64, 1)
        # hidden resolutions: y=4 -> 8, 16, 32
        assert dec["hidden"]["gs1"].shape[1:3] == (8, 8)
        assert dec["hidden"]["gs3"].shape[1:3] == (32, 32)


class TestMaster:
    @pytest.fixture(scope="class")
    def master_setup(self, guided_out):
        _, dec_g = guided_out
        master = MasterCompresser(N=32, M=48, channel=3)
        xm = jax.random.uniform(jax.random.key(4), (1, 128, 128, 3))
        vm = master.init(
            {"params": jax.random.key(5), "noise": jax.random.key(6)},
            xm,
            jnp.asarray(dec_g["x_hat"]),
            jax.tree.map(jnp.asarray, dec_g["hidden"]),
        )
        codec = MasterCodec(master, vm)
        codec.update(force=True)
        return codec, np.asarray(xm), dec_g

    def test_training_forward(self, master_setup):
        codec, xm, dec_g = master_setup
        out = codec(
            jnp.asarray(xm),
            jnp.asarray(dec_g["x_hat"]),
            jax.tree.map(jnp.asarray, dec_g["hidden"]),
            training=True,
            key=jax.random.key(7),
        )
        assert out["x_hat"].shape == xm.shape
        assert out["beta"].shape == (1, 1, 1, 64)
        assert out["gamma"].shape == (1, 1, 1, 64)
        for lik in out["likelihoods"].values():
            assert np.all(np.asarray(lik) > 0)

    def test_codec_roundtrip(self, master_setup):
        codec, xm, dec_g = master_setup
        cm = codec.compress(xm, dec_g["x_hat"])
        assert "beta" in cm and "gamma" in cm
        dm = codec.decompress(cm, dec_g)
        assert dm["x_hat"].shape == xm.shape
        assert np.all(dm["x_hat"] >= 0) and np.all(dm["x_hat"] <= 1)

    def test_bad_geometry_rejected(self, master_setup):
        """channel=3 master needs 128-multiple dims (feature stride 2 +
        g_a/16 + hyper/4) and a half-resolution guide; both desync the
        AR stream silently if unchecked."""
        codec, xm, dec_g = master_setup
        assert codec.module.downsampling_factor == 128
        with pytest.raises(ValueError, match="multiples of 128"):
            codec.compress(xm[:, :64, :64, :], dec_g["x_hat"])
        with pytest.raises(ValueError, match="guide reconstruction"):
            codec.compress(xm, np.asarray(dec_g["x_hat"])[:, :32, :32, :])

    def test_master_fanout_matches_single_device(self, master_setup,
                                                 guided_pair):
        """MasterCodec inherits the per-image AR fan-out through
        JointARCodec (shard_codec routes it the same way as guided);
        streams, beta/gamma and recon must be bit-equal to
        single-device, completing the pair's multi-device story."""
        from lmic_tpu.parallel import make_mesh, shard_codec

        codec, _, _ = master_setup
        gcodec, _ = guided_pair
        xg = np.asarray(
            jax.random.uniform(jax.random.key(8), (2, 64, 64, 1))
        )
        g_out = gcodec.compress(xg)
        dec_g = gcodec.decompress(g_out["strings"], g_out["shape"])
        xm = np.asarray(
            jax.random.uniform(jax.random.key(9), (2, 128, 128, 3))
        )
        single = codec.compress(xm, dec_g["x_hat"])
        rec_single = codec.decompress(single, dec_g)

        shard_codec(codec, make_mesh(2))
        try:
            fanned = codec.compress(xm, dec_g["x_hat"])
            assert fanned["strings"] == single["strings"]
            np.testing.assert_array_equal(
                np.asarray(fanned["beta"]), np.asarray(single["beta"])
            )
            np.testing.assert_array_equal(
                np.asarray(fanned["gamma"]), np.asarray(single["gamma"])
            )
            rec_fan = codec.decompress(fanned, dec_g)
            np.testing.assert_array_equal(
                np.asarray(rec_fan["x_hat"]),
                np.asarray(rec_single["x_hat"]),
            )
        finally:
            codec._fanout_devices = None

    def test_decode_reconstructs_encoder_y_hat(self, master_setup):
        codec, xm, dec_g = master_setup
        x_feature, guided_align, beta, gamma = jax.device_get(
            codec._features(jnp.asarray(xm), jnp.asarray(dec_g["x_hat"]))
        )
        y, z = jax.device_get(
            codec._analyze_features(
                jnp.asarray(x_feature), jnp.asarray(guided_align)
            )
        )
        cm = codec._code_y_z(np.asarray(y), np.asarray(z))
        y_hat_dec = codec._decode_y_hat(cm["strings"], cm["shape"])
        # decoder-side alignment from transmitted side info must equal the
        # encoder's aligned feature
        align_dec = np.asarray(
            codec._align_from(
                jnp.asarray(dec_g["x_hat"]), jnp.asarray(beta),
                jnp.asarray(gamma),
            )
        )
        np.testing.assert_allclose(align_dec, guided_align, atol=1e-6)
        assert y_hat_dec.shape == y.shape


class TestGuidedFanout:
    def test_fanout_matches_single_device(self, guided_pair):
        """GuidedCodec inherits the per-image AR fan-out (shard_codec
        routes RGBT codecs through JointARCodec.fanout); streams, hidden
        maps and reconstructions must be bit-equal to single-device."""
        from lmic_tpu.parallel import make_mesh, shard_codec

        codec, _ = guided_pair
        xg = np.asarray(
            jax.random.uniform(jax.random.key(7), (2, 64, 64, 1))
        )
        single = codec.compress(xg)
        rec_single = codec.decompress(single["strings"], single["shape"])

        fan = shard_codec(codec, make_mesh(2))
        try:
            fanned = fan.compress(xg)
            assert fanned["strings"][0] == single["strings"][0]
            assert fanned["strings"][1] == single["strings"][1]
            rec_fan = fan.decompress(fanned["strings"], fanned["shape"])
            np.testing.assert_array_equal(
                np.asarray(rec_fan["x_hat"]), np.asarray(rec_single["x_hat"])
            )
            for k in rec_single["hidden"]:
                np.testing.assert_array_equal(
                    np.asarray(rec_fan["hidden"][k]),
                    np.asarray(rec_single["hidden"][k]),
                )
        finally:
            codec._fanout_devices = None
