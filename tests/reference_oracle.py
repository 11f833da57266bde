"""Import the reference PyTorch CompressAI fork as a numerical oracle.

The reference at /root/reference/CompressAI is pure PyTorch except for two
pybind11 extensions it cannot build here; we substitute OUR native
implementations (lmic_tpu.ops.cdf quantizer, lmic_tpu.entropy.coder rANS)
for `compressai._CXX` / `compressai.ans` — which doubles as a
cross-validation that our kernels satisfy the reference's contracts.
Missing pure-python deps (torchvision, timm, ...) are stubbed with inert
modules; only attributes the reference touches at import/forward time are
given real implementations.

Used by parity tests only; everything degrades to pytest.skip when the
reference tree is absent.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference/CompressAI"

_loaded = False


class _AnyAttr(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        stub = types.ModuleType(f"{self.__name__}.{name}")
        stub.__class__ = _AnyAttr
        return stub


def load_reference():
    """Make `compressai` importable; returns the module or raises."""
    global _loaded
    if _loaded:
        import compressai

        return compressai
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        raise FileNotFoundError(REFERENCE_ROOT)
    sys.path.insert(0, REFERENCE_ROOT)

    import torch

    for name in [
        "imp",
        "torchvision",
        "torchvision.transforms",
        "pytorch_msssim",
        "torchsnooper",
        "torchinfo",
        "timm",
        "timm.models",
        "timm.models.layers",
    ]:
        try:
            __import__(name)
        except Exception:
            mod = types.ModuleType(name)
            mod.__class__ = _AnyAttr
            sys.modules[name] = mod

    tml = sys.modules["timm.models.layers"]
    if not hasattr(tml, "DropPath") or isinstance(tml, _AnyAttr):
        tml.DropPath = lambda *a, **k: torch.nn.Identity()
        tml.to_2tuple = (
            lambda x: tuple(x) if isinstance(x, (tuple, list)) else (x, x)
        )

        def _trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(a, b)
            return tensor

        tml.trunc_normal_ = _trunc_normal_
    ts = sys.modules["torchsnooper"]
    if not hasattr(ts, "snoop") or isinstance(ts, _AnyAttr):
        ts.snoop = lambda *a, **k: (lambda f: f)

    # Substitute our native kernels for the reference's pybind11 extensions.
    from lmic_tpu.ops.cdf import pmf_to_quantized_cdf as _our_cdf

    cxx = types.ModuleType("compressai._CXX")
    cxx.pmf_to_quantized_cdf = lambda pmf, precision: [
        int(v) for v in _our_cdf(list(pmf), precision)
    ]
    sys.modules["compressai._CXX"] = cxx

    from lmic_tpu.entropy import coder as _coder

    ans = types.ModuleType("compressai.ans")

    class _TableCache:
        """The reference's AR loops pass the SAME cdf/length/offset lists on
        every per-pixel call (google.py:565-692); rebuild the CdfTable once
        per distinct list triple, keyed by identity (the lists are pinned in
        the cache so their ids cannot be recycled)."""

        def __init__(self):
            self._cache = {}

        def get(self, cdfs, cdfs_sizes, offsets):
            import numpy as np

            key = (id(cdfs), id(cdfs_sizes), id(offsets))
            hit = self._cache.get(key)
            if hit is not None:
                return hit[1]
            table = _coder.CdfTable(
                np.asarray(cdfs, np.int32),
                np.asarray(cdfs_sizes, np.int32),
                np.asarray(offsets, np.int32),
            )
            self._cache[key] = ((cdfs, cdfs_sizes, offsets), table)
            return table

    class RansEncoder:
        def __init__(self):
            self._tables = _TableCache()

        def encode_with_indexes(self, symbols, indexes, cdfs, cdfs_sizes,
                                offsets):
            import numpy as np

            return _coder.encode_with_indexes(
                np.asarray(symbols, np.int32),
                np.asarray(indexes, np.int32),
                self._tables.get(cdfs, cdfs_sizes, offsets),
            )

    class BufferedRansEncoder:
        """Real buffered semantics (reference rans_interface.cpp:108-200):
        symbols appended across calls, one reverse-order stream on flush —
        required by the reference's `_compress_ar` per-pixel loop."""

        def __init__(self):
            self._enc = _coder.BufferedRansEncoder()
            self._tables = _TableCache()

        def encode_with_indexes(self, symbols, indexes, cdfs, cdfs_sizes,
                                offsets):
            import numpy as np

            self._enc.encode_with_indexes(
                np.asarray(symbols, np.int32),
                np.asarray(indexes, np.int32),
                self._tables.get(cdfs, cdfs_sizes, offsets),
            )

        def flush(self):
            return self._enc.flush()

    class RansDecoder:
        def __init__(self):
            self._dec = _coder.RansDecoder()
            self._tables = _TableCache()

        def set_stream(self, stream):
            self._dec.set_stream(bytes(stream))

        def decode_stream(self, indexes, cdfs, cdfs_sizes, offsets):
            import numpy as np

            out = self._dec.decode_stream(
                np.asarray(indexes, np.int32),
                self._tables.get(cdfs, cdfs_sizes, offsets),
            )
            return out.tolist()

        def decode_with_indexes(self, stream, indexes, cdfs, cdfs_sizes,
                                offsets):
            import numpy as np

            out = _coder.decode_with_indexes(
                stream, np.asarray(indexes, np.int32),
                self._tables.get(cdfs, cdfs_sizes, offsets),
            )
            return out.tolist()

    ans.RansEncoder = RansEncoder
    ans.BufferedRansEncoder = BufferedRansEncoder
    ans.RansDecoder = RansDecoder
    sys.modules["compressai.ans"] = ans

    import compressai  # noqa: F401

    _loaded = True
    return compressai


def reference_available() -> bool:
    try:
        load_reference()
        return True
    except Exception:
        return False
