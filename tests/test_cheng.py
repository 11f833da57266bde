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


def test_downsampling_factor():
    m = Cheng2020Anchor(N=32, M=32)
    assert m.downsampling_factor == 64
