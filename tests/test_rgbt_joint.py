"""_R/_D RGB-T variant tests (mbt2018 + cheng2020 flavors with ESA fusion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmic_tpu.layers import ESA, SELayer
from lmic_tpu.models.rgbt import GuidedCodec
from lmic_tpu.models.rgbt_joint import (
    Cheng2020Anchor_R,
    Cheng2020Attention_D,
    Cheng2020Attention_R,
    FusedARCodec,
    JointAutoregressiveHierarchicalPriors_D,
    JointAutoregressiveHierarchicalPriors_R,
)


class TestAttentionLayers:
    def test_esa_shape_and_gating(self):
        esa = ESA()
        x = jax.random.normal(jax.random.key(0), (1, 32, 32, 16))
        v = esa.init(jax.random.key(1), x)
        out = esa.apply(v, x)
        assert out.shape == x.shape
        # sigmoid gate: |out| <= |x|
        assert np.all(np.abs(np.asarray(out)) <= np.abs(np.asarray(x)) + 1e-6)

    def test_se_layer(self):
        se = SELayer()
        x = jax.random.normal(jax.random.key(0), (2, 8, 8, 32))
        v = se.init(jax.random.key(1), x)
        out = se.apply(v, x)
        assert out.shape == x.shape


@pytest.mark.parametrize(
    "Rcls,Dcls",
    [
        (JointAutoregressiveHierarchicalPriors_R,
         JointAutoregressiveHierarchicalPriors_D),
        (Cheng2020Attention_R, Cheng2020Attention_D),
    ],
)
def test_r_d_pipeline(Rcls, Dcls):
    r = Rcls(N=32, M=32, channel=3, first_stride=2)
    xr = jax.random.uniform(jax.random.key(0), (1, 128, 128, 3))
    vr = r.init({"params": jax.random.key(1), "noise": jax.random.key(2)}, xr)
    out_r = r.apply(vr, xr, training=False)
    assert set(out_r["hidden"]) == {"ga1", "ga2", "ga3", "gs1", "gs2", "gs3"}

    d = Dcls(N=32, M=32, channel=1)
    xd = jax.random.uniform(jax.random.key(3), (1, 128, 128, 1))
    vd = d.init(
        {"params": jax.random.key(4), "noise": jax.random.key(5)},
        xd, out_r["hidden"],
    )
    out_d = d.apply(
        vd, xd, out_r["hidden"], training=True,
        rngs={"noise": jax.random.key(6)},
    )
    assert out_d["x_hat"].shape == xd.shape
    for lik in out_d["likelihoods"].values():
        assert np.all(np.asarray(lik) > 0)

    # full codec pipeline: guide coded, dependent coded against its hiddens
    rc = GuidedCodec(r, vr)
    rc.update(force=True)
    cr = rc.compress(np.asarray(xr))
    dr = rc.decompress(cr["strings"], cr["shape"])
    dc = FusedARCodec(d, vd)
    dc.update(force=True)
    cd = dc.compress(np.asarray(xd), cr["hidden"])
    dd = dc.decompress(cd["strings"], cd["shape"], dr["hidden"])
    assert dd["x_hat"].shape == xd.shape
    assert np.all(dd["x_hat"] >= 0) and np.all(dd["x_hat"] <= 1)


def test_cheng_anchor_r_hyper_swap():
    m = Cheng2020Anchor_R(N=32, M=32, channel=3)
    x = jnp.zeros((1, 128, 128, 3))
    v = m.init({"params": jax.random.key(0), "noise": jax.random.key(1)}, x)
    out = m.apply(v, x, training=False)
    # cheng h_a keeps z at y/4 via two stride-2 3x3 convs
    assert out["likelihoods"]["z"].shape[1:3] == (2, 2)
