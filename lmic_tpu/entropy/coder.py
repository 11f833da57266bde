"""Python bindings for the native rANS coder (lmic_tpu/csrc/lmic_rans.cc).

The shared library is compiled on first use with g++ (no pybind11 in the
image; the C ABI + ctypes keeps the boundary to raw int32/uint8 pointers and
numpy arrays — no per-symbol Python objects, unlike the reference's
`tensor.int().tolist()` marshaling in
compressai/entropy_models/entropy_models.py:262-268).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "csrc", "lmic_rans.cc")
_LIB = os.path.join(os.path.dirname(__file__), "..", "csrc", "liblmic_rans.so")
_BUILD_LOCK = threading.Lock()
_lib = None

_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _build():
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-o", _LIB, _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _BUILD_LOCK:
        if _lib is not None:
            return _lib
        src, lib = os.path.abspath(_SRC), os.path.abspath(_LIB)
        if not os.path.exists(lib) or os.path.getmtime(lib) < os.path.getmtime(src):
            _build()
        lib_h = ctypes.CDLL(lib)

        lib_h.lmic_rans_encode_with_indexes.restype = ctypes.c_int64
        lib_h.lmic_rans_encode_with_indexes.argtypes = [
            _i32p, _i32p, ctypes.c_int64, _i32p, ctypes.c_int64, _i32p, _i32p,
            _u8p, ctypes.c_int64,
        ]
        lib_h.lmic_rans_decode_with_indexes.restype = ctypes.c_int64
        lib_h.lmic_rans_decode_with_indexes.argtypes = [
            _u8p, ctypes.c_int64, _i32p, ctypes.c_int64, _i32p, ctypes.c_int64,
            _i32p, _i32p, _i32p,
        ]
        lib_h.lmic_rans_encoder_new.restype = ctypes.c_void_p
        lib_h.lmic_rans_encoder_append.argtypes = [
            ctypes.c_void_p, _i32p, _i32p, ctypes.c_int64, _i32p,
            ctypes.c_int64, _i32p, _i32p,
        ]
        lib_h.lmic_rans_encoder_flush.restype = ctypes.c_int64
        lib_h.lmic_rans_encoder_flush.argtypes = [
            ctypes.c_void_p, _u8p, ctypes.c_int64,
        ]
        lib_h.lmic_rans_encoder_free.argtypes = [ctypes.c_void_p]
        lib_h.lmic_rans_decoder_new.restype = ctypes.c_void_p
        lib_h.lmic_rans_decoder_new.argtypes = [_u8p, ctypes.c_int64]
        lib_h.lmic_rans_decoder_decode.restype = ctypes.c_int64
        lib_h.lmic_rans_decoder_decode.argtypes = [
            ctypes.c_void_p, _i32p, ctypes.c_int64, _i32p, ctypes.c_int64,
            _i32p, _i32p, _i32p,
        ]
        lib_h.lmic_rans_decoder_free.argtypes = [ctypes.c_void_p]
        _u16p = ctypes.POINTER(ctypes.c_uint16)
        lib_h.lmic_rans_build_lut.argtypes = [
            _i32p, ctypes.c_int64, _i32p, ctypes.c_int64, _u16p,
        ]
        lib_h.lmic_rans_decode_with_indexes_lut.restype = ctypes.c_int64
        lib_h.lmic_rans_decode_with_indexes_lut.argtypes = [
            _u8p, ctypes.c_int64, _i32p, ctypes.c_int64, _i32p,
            ctypes.c_int64, _i32p, _i32p, _u16p, _i32p,
        ]
        lib_h.lmic_rans_decoder_decode_lut.restype = ctypes.c_int64
        lib_h.lmic_rans_decoder_decode_lut.argtypes = [
            ctypes.c_void_p, _i32p, ctypes.c_int64, _i32p, ctypes.c_int64,
            _i32p, _i32p, _u16p, _i32p,
        ]
        _lib = lib_h
    return _lib


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a).reshape(-1), dtype=np.int32)


def _i32_ptr(a: np.ndarray):
    return a.ctypes.data_as(_i32p)


class CdfTable:
    """Frozen integer CDF tables for one entropy model.

    `cdf` is `(rows, max_len)` int32 with each row a monotone CDF padded with
    zeros; `cdf_length[i]` is the valid row length; `offset[i]` shifts symbol
    values into table range. Mirrors the `_quantized_cdf/_cdf_length/_offset`
    buffers of the reference (entropy_models.py:129-131).
    """

    __slots__ = ("cdf", "cdf_length", "offset", "_lut")

    def __init__(self, cdf, cdf_length, offset):
        self.cdf = _as_i32(cdf).reshape(np.asarray(cdf).shape)
        if self.cdf.ndim != 2:
            raise ValueError("cdf must be 2-D")
        self.cdf_length = _as_i32(cdf_length)
        self.offset = _as_i32(offset)
        if not (len(self.cdf) == len(self.cdf_length) == len(self.offset)):
            raise ValueError("cdf/cdf_length/offset row mismatch")

    @property
    def stride(self) -> int:
        return self.cdf.shape[1]

    _LUT_SPAN = 1 << 8  # coarse buckets of cum >> 8; see lmic_rans.cc

    def lut(self):
        """Lazy coarse cum->slot table (256 uint16 buckets per row): gives
        the decoder a near-exact starting slot so the per-symbol search is
        a 1-2 step forward scan instead of a binary search. Small enough
        (rows*512 B) to stay cache-resident."""
        if os.environ.get("LMIC_RANS_LUT") == "0":
            # decode falls back to the pure binary-search C path; same
            # bytes in/out, just slower — a debug/AB switch, checked per
            # call so flipping the env mid-process affects live tables
            # (coding states cache CdfTables for the codec's lifetime)
            return None
        cached = getattr(self, "_lut", None)
        if cached is not None:
            return cached
        rows = self.cdf.shape[0]
        lib = _load()
        lut = np.empty((rows, self._LUT_SPAN), dtype=np.uint16)
        lib.lmic_rans_build_lut(
            _i32_ptr(self.cdf.reshape(-1)), self.stride,
            _i32_ptr(self.cdf_length), rows,
            lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        )
        self._lut = lut
        return lut


def encode_with_indexes(symbols, indexes, table: CdfTable) -> bytes:
    """Encode int32 symbols (flattened) against per-symbol CDF rows."""
    lib = _load()
    symbols = _as_i32(symbols)
    indexes = _as_i32(indexes)
    if symbols.shape != indexes.shape:
        raise ValueError("symbols and indexes must have the same size")
    n = symbols.size
    out = np.empty(n * 48 + 16, dtype=np.uint8)
    nbytes = lib.lmic_rans_encode_with_indexes(
        _i32_ptr(symbols), _i32_ptr(indexes), n,
        _i32_ptr(table.cdf), table.stride,
        _i32_ptr(table.cdf_length), _i32_ptr(table.offset),
        out.ctypes.data_as(_u8p), out.size,
    )
    if nbytes < 0:
        raise RuntimeError("rANS encode buffer overflow")
    return out[:nbytes].tobytes()


def decode_with_indexes(stream: bytes, indexes, table: CdfTable) -> np.ndarray:
    """Decode `len(indexes)` int32 symbols from a byte stream."""
    lib = _load()
    indexes = _as_i32(indexes)
    n = indexes.size
    out = np.empty(n, dtype=np.int32)
    buf = np.frombuffer(stream, dtype=np.uint8)
    lut = table.lut()
    if lut is not None:
        lib.lmic_rans_decode_with_indexes_lut(
            buf.ctypes.data_as(_u8p), buf.size, _i32_ptr(indexes), n,
            _i32_ptr(table.cdf), table.stride,
            _i32_ptr(table.cdf_length), _i32_ptr(table.offset),
            lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            out.ctypes.data_as(_i32p),
        )
        return out
    lib.lmic_rans_decode_with_indexes(
        buf.ctypes.data_as(_u8p), buf.size, _i32_ptr(indexes), n,
        _i32_ptr(table.cdf), table.stride,
        _i32_ptr(table.cdf_length), _i32_ptr(table.offset),
        out.ctypes.data_as(_i32p),
    )
    return out


class BufferedRansEncoder:
    """Chunked encoder for autoregressive codecs: append symbol chunks in
    forward order, then `flush()` the full stream (emitted in reverse, as
    rANS requires)."""

    def __init__(self):
        self._lib = _load()
        self._handle = self._lib.lmic_rans_encoder_new()
        self._n = 0

    def encode_with_indexes(self, symbols, indexes, table: CdfTable):
        symbols = _as_i32(symbols)
        indexes = _as_i32(indexes)
        if symbols.shape != indexes.shape:
            raise ValueError("symbols and indexes must have the same size")
        self._n += symbols.size
        self._lib.lmic_rans_encoder_append(
            self._handle, _i32_ptr(symbols), _i32_ptr(indexes), symbols.size,
            _i32_ptr(table.cdf), table.stride,
            _i32_ptr(table.cdf_length), _i32_ptr(table.offset),
        )

    def flush(self) -> bytes:
        out = np.empty(self._n * 48 + 16, dtype=np.uint8)
        nbytes = self._lib.lmic_rans_encoder_flush(
            self._handle, out.ctypes.data_as(_u8p), out.size
        )
        if nbytes < 0:
            raise RuntimeError("rANS encode buffer overflow")
        self._n = 0
        return out[:nbytes].tobytes()

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.lmic_rans_encoder_free(self._handle)
            self._handle = None


class RansDecoder:
    """Streaming decoder for autoregressive codecs."""

    def __init__(self):
        self._lib = _load()
        self._handle = None

    def set_stream(self, stream: bytes):
        if self._handle:
            self._lib.lmic_rans_decoder_free(self._handle)
        buf = np.frombuffer(stream, dtype=np.uint8)
        self._handle = self._lib.lmic_rans_decoder_new(
            buf.ctypes.data_as(_u8p), buf.size
        )

    def decode_stream(self, indexes, table: CdfTable) -> np.ndarray:
        if not self._handle:
            raise RuntimeError("set_stream() first")
        indexes = _as_i32(indexes)
        out = np.empty(indexes.size, dtype=np.int32)
        lut = table.lut()
        if lut is not None:
            self._lib.lmic_rans_decoder_decode_lut(
                self._handle, _i32_ptr(indexes), indexes.size,
                _i32_ptr(table.cdf), table.stride,
                _i32_ptr(table.cdf_length), _i32_ptr(table.offset),
                lut.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                out.ctypes.data_as(_i32p),
            )
            return out
        self._lib.lmic_rans_decoder_decode(
            self._handle, _i32_ptr(indexes), indexes.size,
            _i32_ptr(table.cdf), table.stride,
            _i32_ptr(table.cdf_length), _i32_ptr(table.offset),
            out.ctypes.data_as(_i32p),
        )
        return out

    def decode_with_indexes(self, stream: bytes, indexes,
                            table: CdfTable) -> np.ndarray:
        return decode_with_indexes(stream, indexes, table)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.lmic_rans_decoder_free(self._handle)
            self._handle = None


# ---------------------------------------------------------------------------
# Threaded batch API
# ---------------------------------------------------------------------------
#
# ctypes calls release the GIL, so coding a batch of independent images on a
# thread pool gives true parallelism on the host cores — the reference codes
# batch items serially (entropy_models.py:262-268). The pool is shared and
# lazily built; size follows the host core count.

_POOL = None
_POOL_LOCK = threading.Lock()


def _pool():
    global _POOL
    if _POOL is None:
        with _POOL_LOCK:
            if _POOL is None:
                from concurrent.futures import ThreadPoolExecutor

                _POOL = ThreadPoolExecutor(
                    max_workers=min(16, os.cpu_count() or 1),
                    thread_name_prefix="lmic-rans",
                )
    return _POOL


def encode_batch(symbols, indexes, table: CdfTable):
    """Encode a batch: symbols (B, ...) int array -> list of B byte strings.
    `indexes` either has the same leading batch dim or is shared across the
    batch (one fewer dim)."""
    symbols = np.asarray(symbols)
    indexes = np.asarray(indexes)
    shared = indexes.ndim < symbols.ndim
    B = symbols.shape[0]
    sym = np.ascontiguousarray(symbols.reshape(B, -1), dtype=np.int32)
    if shared:
        idx = np.ascontiguousarray(indexes.reshape(-1), dtype=np.int32)
        idx_rows = [idx] * B
    else:
        idx2 = np.ascontiguousarray(
            indexes.reshape(B, -1), dtype=np.int32
        )
        idx_rows = [idx2[i] for i in range(B)]
    def one(i):
        return encode_with_indexes(sym[i], idx_rows[i], table)

    if B == 1 or (os.cpu_count() or 1) <= 1:
        return [one(i) for i in range(B)]
    return list(_pool().map(one, range(B)))


def decode_batch(streams, indexes, table: CdfTable) -> np.ndarray:
    """Decode a batch of independent streams against shared (1-D) or
    per-item (2-D) indexes. Returns (B, n) int32."""
    indexes = np.asarray(indexes)
    per_item = indexes.ndim == 2
    idx = np.ascontiguousarray(indexes, dtype=np.int32)
    if len(streams) == 1:
        return decode_with_indexes(
            streams[0], idx[0] if per_item else idx, table
        )[None]

    def one(i):
        return decode_with_indexes(
            streams[i], idx[i] if per_item else idx, table
        )

    if (os.cpu_count() or 1) <= 1:
        return np.stack([one(i) for i in range(len(streams))])
    return np.stack(list(_pool().map(one, range(len(streams)))))
