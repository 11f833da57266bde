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

    __slots__ = ("cdf", "cdf_length", "offset")

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
