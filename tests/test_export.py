"""AOT export / serialization tests — the TPU-native analogue of the
reference's TorchScript suite (tests/test_scripting.py): where the
reference asserts GDN scripts and MaskedConv2d does NOT, we assert the
pure device graphs export and roundtrip through `jax.export` serialization
bit-exactly, and that the host-coupled AR decode wavefront (io_callback
into the streaming rANS decoder) is the one boundary that cannot be
serialized — by construction, not omission.

Exported artifacts are how a serving stack ships a compiled graph without
Python; bit-equality after deserialize is the gate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import export as jexport


def _roundtrip(fn, *specs):
    exp = jexport.export(jax.jit(fn))(*specs)
    return jexport.deserialize(exp.serialize())


class TestLayerExport:
    def test_gdn_serializes_bit_exact(self):
        from lmic_tpu.layers import GDN

        gdn = GDN()
        x = jnp.asarray(
            np.random.default_rng(0).random((1, 16, 16, 8)), jnp.float32
        )
        v = gdn.init(jax.random.key(0), x)
        fn = lambda x: gdn.apply(v, x)  # noqa: E731
        back = _roundtrip(fn, jax.ShapeDtypeStruct(x.shape, x.dtype))
        np.testing.assert_array_equal(
            np.asarray(back.call(x)), np.asarray(fn(x))
        )

    def test_masked_conv_serializes(self):
        """The reference's MaskedConv2d cannot be TorchScripted
        (test_scripting.py:56-61); ours is a plain traced conv with a
        constant mask, so it exports like any other op."""
        from lmic_tpu.layers import MaskedConv2d

        conv = MaskedConv2d(features=8, kernel_size=5)
        x = jnp.asarray(
            np.random.default_rng(1).random((1, 8, 8, 4)), jnp.float32
        )
        v = conv.init(jax.random.key(0), x)
        fn = lambda x: conv.apply(v, x)  # noqa: E731
        back = _roundtrip(fn, jax.ShapeDtypeStruct(x.shape, x.dtype))
        np.testing.assert_array_equal(
            np.asarray(back.call(x)), np.asarray(fn(x))
        )


class TestModelExport:
    def test_factorized_eval_forward_serializes(self):
        from lmic_tpu.models.image import FactorizedPrior

        m = FactorizedPrior(N=16, M=24)
        xi = jnp.zeros((1, 64, 64, 3))
        vm = m.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, xi
        )
        fn = lambda x: m.apply(vm, x, training=False)["x_hat"]  # noqa: E731
        back = _roundtrip(fn, jax.ShapeDtypeStruct(xi.shape, jnp.float32))
        xr = jnp.asarray(
            np.random.default_rng(2).random((1, 64, 64, 3)), jnp.float32
        )
        np.testing.assert_array_equal(
            np.asarray(back.call(xr)), np.asarray(fn(xr))
        )

    def test_joint_ar_eval_forward_serializes(self):
        """Training/eval forward of the AR model is one masked-conv pass —
        fully on-device, so it exports (only the codec-path decode scan is
        host-coupled)."""
        from lmic_tpu.models.joint import (
            JointAutoregressiveHierarchicalPriors,
        )

        m = JointAutoregressiveHierarchicalPriors(N=32, M=48)
        xi = jnp.zeros((1, 64, 64, 3))
        vm = m.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, xi
        )
        fn = lambda x: m.apply(vm, x, training=False)["x_hat"]  # noqa: E731
        back = _roundtrip(fn, jax.ShapeDtypeStruct(xi.shape, jnp.float32))
        xr = jnp.asarray(
            np.random.default_rng(3).random((1, 64, 64, 3)), jnp.float32
        )
        np.testing.assert_array_equal(
            np.asarray(back.call(xr)), np.asarray(fn(xr))
        )


class TestDecodeScanBoundary:
    def test_ar_decode_scan_not_serializable(self):
        """The decode wavefront streams symbols from the host rANS decoder
        via io_callback each anti-diagonal; jax.export cannot serialize
        host callbacks. This pins the architectural boundary: everything
        up to the coder exports, the coder round-trip stays host-side."""
        from lmic_tpu.models.joint import (
            JointAutoregressiveHierarchicalPriors, JointARCodec,
        )

        m = JointAutoregressiveHierarchicalPriors(N=32, M=48)
        xi = jnp.zeros((1, 64, 64, 3))
        vm = m.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)}, xi
        )
        codec = JointARCodec(m, vm)
        codec.update(force=True)
        scan, _box = codec._get_decode_scan(4, 4)
        with pytest.raises(Exception, match="host_callback"):
            jexport.export(jax.jit(scan))(
                jax.ShapeDtypeStruct((4, 4, 2 * m.M), jnp.float32),
                jax.ShapeDtypeStruct((), jnp.int32),
            )
