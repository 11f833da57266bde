"""cheng2020 anchor/attention tests (transforms swap, shared joint-AR
entropy machinery)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmic_tpu.models.cheng import Cheng2020Anchor, Cheng2020Attention
from lmic_tpu.models.joint import JointARCodec


@pytest.mark.parametrize("cls", [Cheng2020Anchor, Cheng2020Attention])
def test_forward_and_roundtrip(cls):
    module = cls(N=32, M=32)
    x = jax.random.uniform(jax.random.key(2), (1, 64, 64, 3))
    v = module.init(
        {"params": jax.random.key(0), "noise": jax.random.key(1)}, x
    )
    out = module.apply(
        v, x, training=True, rngs={"noise": jax.random.key(3)}
    )
    assert out["x_hat"].shape == x.shape
    for lik in out["likelihoods"].values():
        assert np.all(np.asarray(lik) > 0)

    codec = JointARCodec(module, v)
    codec.update(force=True)
    res = codec.compress(np.asarray(x))
    rec = codec.decompress(res["strings"], res["shape"])
    assert rec["x_hat"].shape == x.shape
    assert np.all(rec["x_hat"] >= 0) and np.all(rec["x_hat"] <= 1)

    # B>1 roundtrip exercises the batched-lane decode scan on cheng's
    # single-Gaussian shapes; it must be bit-equal to per-image scans at
    # the same B AND to standalone decodes of each stream (per-image
    # hyper params make batch grouping unobservable — this exact case
    # caught a batched-vs-B=1 h_s executable mismatch before the fix)
    import os

    xb = np.asarray(jax.random.uniform(jax.random.key(4), (2, 64, 64, 3)))
    resb = codec.compress(xb)
    recb = codec.decompress(resb["strings"], resb["shape"])
    os.environ["LMIC_AR_BATCHED_DECODE"] = "off"
    try:
        recs = codec.decompress(resb["strings"], resb["shape"])
    finally:
        os.environ.pop("LMIC_AR_BATCHED_DECODE", None)
    np.testing.assert_array_equal(recb["x_hat"], recs["x_hat"])
    for i in range(2):
        one = codec.decompress(
            [[resb["strings"][0][i]], [resb["strings"][1][i]]],
            resb["shape"],
        )
        # wire + decoded y_hat are batch-invariant (verified bit-equal);
        # the PIXELS go through g_s at a different batch shape, whose
        # executable may differ in last-ulp terms that the attention
        # softmax chain amplifies to ~2e-4 — float tolerance here
        np.testing.assert_allclose(
            recb["x_hat"][i], one["x_hat"][0], atol=1e-3
        )


def test_downsampling_factor():
    m = Cheng2020Anchor(N=32, M=32)
    assert m.downsampling_factor == 64
