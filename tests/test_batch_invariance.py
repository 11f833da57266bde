"""Batch-composition invariance for the NON-AR family.

The wire must not depend on how images (or video sequences) were grouped
into batches: the wire-determining convolution graphs (analysis
transforms, the hyper synthesis that yields entropy indexes) run per
item — B=1 slices through one shared compile (models.codec._PerItem) —
because batched conv executables are not guaranteed to match their B=1
counterparts ulp-for-ulp, and on the params path a 1-ulp scale flip
changes a Gaussian-conditional bucket and desyncs the stream. The AR
family got this guarantee in round 3 (tests/test_joint.py
test_batch_composition_invariance); these tests pin the same contract
for factorized / hyperprior / mean-scale / ssf2020 on both the uint8
fast path and the float path.

Reference context: the reference marshals per-image tensors through the
coder (compressai/entropy_models/entropy_models.py:237-270) but derives
indexes from batch-shaped model forwards, so it carries the same hazard
silently; this framework closes it by construction.
"""

import jax
import numpy as np
import pytest

from lmic_tpu import zoo


def _pixels(shape, seed=0):
    return (np.random.default_rng(seed).random(shape) * 255).astype(
        np.uint8
    )


@pytest.mark.parametrize(
    "arch",
    ["bmshj2018-factorized", "bmshj2018-hyperprior", "mbt2018-mean"],
)
class TestImageBatchInvariance:
    @pytest.fixture()
    def codec(self, arch):
        codec = zoo.create_model(
            arch, 1, key=jax.random.key(0), input_size=(64, 64)
        )
        codec.update(force=True)
        return codec

    def test_wire_bytes_independent_of_batch_grouping(self, arch, codec):
        """Every stream of a batched encode is byte-identical to the
        stream of a standalone B=1 encode of the same image."""
        x = _pixels((3, 64, 64, 3))
        out = codec.compress(x)
        for i in range(3):
            single = codec.compress(x[i:i + 1])
            for part_b, part_s in zip(out["strings"], single["strings"]):
                assert bytes(part_b[i]) == bytes(part_s[0]), (
                    f"{arch}: image {i} bytes depend on batch grouping"
                )

    def test_decode_grouping_free(self, arch, codec):
        """A stream encoded inside a batch decodes on its own (and the
        whole batch decodes together): entropy indexes come from the
        same per-image compiled graph on both sides, so no grouping can
        desync the coder. Pixels then go through g_s at the caller's
        batch shape, whose executable may differ in last-ulp terms —
        uint8 outputs are compared within 1 count."""
        x = _pixels((3, 64, 64, 3), seed=1)
        out = codec.compress(x)
        rec_b = codec.decompress(out["strings"], out["shape"], u8=True)
        for i in range(3):
            one = codec.decompress(
                [[part[i]] for part in out["strings"]], out["shape"],
                u8=True,
            )
            np.testing.assert_allclose(
                rec_b["x_hat"][i].astype(np.int16),
                one["x_hat"][0].astype(np.int16),
                atol=1,
            )

    def test_float_path_matches_contract(self, arch, codec):
        """The float API derives symbols/indexes per image too: its wire
        bytes match standalone float encodes AND stay decodable after
        regrouping."""
        x = np.asarray(
            jax.random.uniform(jax.random.key(7), (2, 64, 64, 3))
        )
        out = codec.compress(x)
        for i in range(2):
            single = codec.compress(x[i:i + 1])
            for part_b, part_s in zip(out["strings"], single["strings"]):
                assert bytes(part_b[i]) == bytes(part_s[0])
            one = codec.decompress(
                [[part[i]] for part in out["strings"]], out["shape"]
            )
            assert one["x_hat"].shape == (1, 64, 64, 3)


class TestVideoBatchInvariance:
    def test_ssf2020_sequence_grouping_free(self):
        """Multi-sequence batches run per-sequence B=1 GOP chains: the
        per-frame streams of a batched encode are byte-identical to
        standalone single-sequence encodes, and a sequence decoded out
        of the batch reconstructs identically (the whole decode chain is
        per-sequence too)."""
        codec = zoo.create_video_model(
            "ssf2020", 1, key=jax.random.key(0), input_size=(128, 128)
        )
        codec.update(force=True)
        frames = _pixels((2, 2, 128, 128, 3), seed=3)
        strings, shapes = codec.compress(frames)

        def flat(s):
            if isinstance(s, dict):
                return [b for v in s.values() for b in flat(v)]
            return [bytes(x) for part in s for x in part]

        for i in range(2):
            s1, sh1 = codec.compress(frames[i:i + 1])
            from lmic_tpu.models.video import _slice_strings

            got = [_slice_strings(s, i, i + 1) for s in strings]
            assert [flat(g) for g in got] == [flat(s) for s in s1], (
                f"sequence {i} bytes depend on batch grouping"
            )
            rec_b = codec.decompress(got, shapes, u8=True)
            rec_s = codec.decompress(s1, sh1, u8=True)
            np.testing.assert_array_equal(rec_b, rec_s)
