"""rANS coder tests.

The stream format (16-bit precision, 4-bit bypass escapes, 64-bit rANS with
reverse 32-bit word emission — see compressai/cpp_exts/rans/rans_interface.cpp
for the reference definition) is verified two ways:

1. roundtrip: decode(encode(x)) == x, including out-of-range escape values;
2. byte-exactness against an independent pure-Python model of the same spec
   (below), so an implementation bug in the C++ can't self-cancel.
"""

import numpy as np
import pytest

from lmic_tpu.entropy import coder
from lmic_tpu.entropy.coder import CdfTable
from lmic_tpu.ops import pmf_to_quantized_cdf

PRECISION = 16
BYPASS = 4
MAX_BYPASS = (1 << BYPASS) - 1
RANS_L = 1 << 31


# ---------------- pure-Python reference model of the spec ----------------

def _py_encode(symbols, indexes, table: CdfTable) -> bytes:
    syms = []  # (start, range, bypass)
    for sym, idx in zip(symbols, indexes):
        cdf = table.cdf[idx]
        size = int(table.cdf_length[idx])
        max_value = size - 2
        value = int(sym) - int(table.offset[idx])
        raw = None
        if value < 0:
            raw = -2 * value - 1
            value = max_value
        elif value >= max_value:
            raw = 2 * (value - max_value)
            value = max_value
        syms.append((int(cdf[value]), int(cdf[value + 1] - cdf[value]), False))
        if value == max_value:
            n_bypass = 0
            while (raw >> (n_bypass * BYPASS)) != 0:
                n_bypass += 1
            val = n_bypass
            while val >= MAX_BYPASS:
                syms.append((MAX_BYPASS, MAX_BYPASS + 1, True))
                val -= MAX_BYPASS
            syms.append((val, val + 1, True))
            for j in range(n_bypass):
                v = (raw >> (j * BYPASS)) & MAX_BYPASS
                syms.append((v, v + 1, True))

    x = RANS_L
    words = []

    def put(start, freq):
        nonlocal x
        x_max = ((RANS_L >> PRECISION) << 32) * freq
        if x >= x_max:
            words.append(x & 0xFFFFFFFF)
            x >>= 32
        x = ((x // freq) << PRECISION) + (x % freq) + start

    def put_bits(val, nbits):
        nonlocal x
        freq = 1 << (16 - nbits)
        x_max = ((RANS_L >> 16) << 32) * freq
        if x >= x_max:
            words.append(x & 0xFFFFFFFF)
            x >>= 32
        x = (x << nbits) | val

    for start, freq, bypass in reversed(syms):
        if bypass:
            put_bits(start, BYPASS)
        else:
            put(start, freq)
    # flush: two little-endian words, low first, prepended to the stream
    words.append(x >> 32)
    words.append(x & 0xFFFFFFFF)
    # words were appended in emission order; stream is reversed (front = last)
    stream_words = list(reversed(words))
    return b"".join(int(w).to_bytes(4, "little") for w in stream_words)


def _py_decode(stream, indexes, table: CdfTable):
    words = [
        int.from_bytes(stream[i : i + 4], "little")
        for i in range(0, len(stream), 4)
    ]
    x = words[0] | (words[1] << 32)
    pos = 2

    def advance(start, freq):
        nonlocal x, pos
        mask = (1 << PRECISION) - 1
        x = freq * (x >> PRECISION) + (x & mask) - start
        if x < RANS_L:
            x = (x << 32) | words[pos]
            pos += 1

    def get_bits(nbits):
        nonlocal x, pos
        val = x & ((1 << nbits) - 1)
        x >>= nbits
        if x < RANS_L:
            x = (x << 32) | words[pos]
            pos += 1
        return val

    out = []
    for idx in indexes:
        cdf = table.cdf[idx]
        size = int(table.cdf_length[idx])
        max_value = size - 2
        cum = x & ((1 << PRECISION) - 1)
        s = int(np.searchsorted(cdf[:size], cum, side="right")) - 1
        advance(int(cdf[s]), int(cdf[s + 1] - cdf[s]))
        value = s
        if value == max_value:
            val = get_bits(BYPASS)
            n_bypass = val
            while val == MAX_BYPASS:
                val = get_bits(BYPASS)
                n_bypass += val
            raw = 0
            for j in range(n_bypass):
                raw |= get_bits(BYPASS) << (j * BYPASS)
            value = raw >> 1
            value = -value - 1 if (raw & 1) else value + max_value
        out.append(value + int(table.offset[idx]))
    return np.array(out, dtype=np.int32)


# ---------------- fixtures ----------------

def _make_table(rng, rows=8, max_sym=16):
    cdfs, lengths, offsets = [], [], []
    max_len = max_sym + 2
    for _ in range(rows):
        n = int(rng.integers(3, max_sym + 1))
        pmf = rng.random(n).astype(np.float32)
        pmf /= pmf.sum() * 1.01  # leave some tail mass
        tail = 1.0 - pmf.sum()
        cdf = pmf_to_quantized_cdf(
            np.concatenate([pmf, [tail]]).astype(np.float32), PRECISION
        )
        row = np.zeros(max_len + 1, dtype=np.int32)
        row[: len(cdf)] = cdf
        cdfs.append(row)
        lengths.append(len(cdf))
        offsets.append(int(rng.integers(-10, 10)))
    return CdfTable(np.stack(cdfs), np.array(lengths), np.array(offsets))


class TestRansRoundtrip:
    @pytest.mark.parametrize("n", [1, 7, 1000, 65536])
    def test_in_range_roundtrip(self, n):
        rng = np.random.default_rng(42)
        table = _make_table(rng)
        indexes = rng.integers(0, len(table.cdf_length), n).astype(np.int32)
        # symbols within each row's in-range band
        max_vals = table.cdf_length[indexes] - 2
        symbols = (
            rng.integers(0, 1 << 30, n) % np.maximum(max_vals, 1)
        ).astype(np.int32) + table.offset[indexes]
        stream = coder.encode_with_indexes(symbols, indexes, table)
        out = coder.decode_with_indexes(stream, indexes, table)
        np.testing.assert_array_equal(out, symbols)

    def test_escape_values_roundtrip(self):
        rng = np.random.default_rng(7)
        table = _make_table(rng)
        n = 500
        indexes = rng.integers(0, len(table.cdf_length), n).astype(np.int32)
        # extreme out-of-range values exercise the bypass path
        symbols = rng.integers(-(1 << 14), 1 << 14, n).astype(np.int32)
        stream = coder.encode_with_indexes(symbols, indexes, table)
        out = coder.decode_with_indexes(stream, indexes, table)
        np.testing.assert_array_equal(out, symbols)

    def test_matches_python_spec_model(self):
        rng = np.random.default_rng(3)
        table = _make_table(rng)
        n = 300
        indexes = rng.integers(0, len(table.cdf_length), n).astype(np.int32)
        symbols = rng.integers(-50, 50, n).astype(np.int32)
        c_stream = coder.encode_with_indexes(symbols, indexes, table)
        py_stream = _py_encode(symbols, indexes, table)
        assert c_stream == py_stream
        # python decoder reads the C stream too
        np.testing.assert_array_equal(
            _py_decode(c_stream, indexes, table), symbols
        )

    def test_buffered_encoder_chunks_equal_oneshot(self):
        rng = np.random.default_rng(5)
        table = _make_table(rng)
        n = 512
        indexes = rng.integers(0, len(table.cdf_length), n).astype(np.int32)
        symbols = rng.integers(-30, 30, n).astype(np.int32)
        enc = coder.BufferedRansEncoder()
        for i in range(0, n, 100):
            enc.encode_with_indexes(
                symbols[i : i + 100], indexes[i : i + 100], table
            )
        chunked = enc.flush()
        oneshot = coder.encode_with_indexes(symbols, indexes, table)
        assert chunked == oneshot

    def test_streaming_decoder_chunks(self):
        rng = np.random.default_rng(6)
        table = _make_table(rng)
        n = 512
        indexes = rng.integers(0, len(table.cdf_length), n).astype(np.int32)
        symbols = rng.integers(-30, 30, n).astype(np.int32)
        stream = coder.encode_with_indexes(symbols, indexes, table)
        dec = coder.RansDecoder()
        dec.set_stream(stream)
        outs = [
            dec.decode_stream(indexes[i : i + 64], table)
            for i in range(0, n, 64)
        ]
        np.testing.assert_array_equal(np.concatenate(outs), symbols)

    def test_compression_ratio_sane(self):
        # A peaked distribution should compress well below 1 byte/symbol.
        pmf = np.array([0.90, 0.05, 0.04], dtype=np.float32)
        cdf = pmf_to_quantized_cdf(
            np.concatenate([pmf, [0.01]]).astype(np.float32), PRECISION
        )
        table = CdfTable(cdf[None, :], [len(cdf)], [0])
        rng = np.random.default_rng(0)
        symbols = rng.choice(3, size=10000, p=pmf / pmf.sum()).astype(np.int32)
        stream = coder.encode_with_indexes(
            symbols, np.zeros_like(symbols), table
        )
        # entropy of the source is ~0.74 bits/symbol
        assert len(stream) * 8 / len(symbols) < 1.0


class TestNoLutFallback:
    def test_binary_search_decode_matches_lut(self, monkeypatch):
        """LMIC_RANS_LUT=0 routes decode through the pure binary-search C
        path; bytes and symbols must be identical to the LUT decode."""
        rng = np.random.default_rng(11)
        table = _make_table(rng)
        n = 4096
        indexes = rng.integers(0, len(table.cdf_length), n).astype(np.int32)
        max_vals = table.cdf_length[indexes] - 2
        symbols = (
            rng.integers(0, 1 << 30, n) % np.maximum(max_vals, 1)
        ).astype(np.int32) + table.offset[indexes]
        # a few escapes so the bypass path is exercised in both modes
        symbols[:: n // 8] += 4000
        stream = coder.encode_with_indexes(symbols, indexes, table)
        with_lut = coder.decode_with_indexes(stream, indexes, table)

        monkeypatch.setenv("LMIC_RANS_LUT", "0")
        # the switch is honored per call: flipping the env affects a table
        # whose LUT is already built and cached (live coding states)
        assert table.lut() is None
        bare = CdfTable(table.cdf, table.cdf_length, table.offset)
        assert bare.lut() is None
        no_lut = coder.decode_with_indexes(stream, indexes, bare)
        np.testing.assert_array_equal(no_lut, with_lut)
        np.testing.assert_array_equal(no_lut, symbols)

        dec = coder.RansDecoder()
        dec.set_stream(stream)
        streamed = [
            dec.decode_stream(indexes[i : i + 512], bare)
            for i in range(0, n, 512)
        ]
        np.testing.assert_array_equal(np.concatenate(streamed), symbols)


class TestCorruptStreams:
    """A truncated/corrupted/hostile stream must decode to garbage symbols,
    never read past the buffer (the Dec renorm is bounds-checked and the
    bypass reassembly caps its shift; lmic_rans.cc Dec::next_word). The
    reference binding has no such guard — production decoders need one."""

    @pytest.mark.parametrize("mode", ["lut", "nolut", "stream"])
    def test_corrupt_streams_return_safely(self, mode, monkeypatch):
        if mode == "nolut":
            monkeypatch.setenv("LMIC_RANS_LUT", "0")
        rng = np.random.default_rng(13)
        table = _make_table(rng)
        n = 2048
        indexes = rng.integers(0, len(table.cdf_length), n).astype(np.int32)
        max_vals = table.cdf_length[indexes] - 2
        symbols = (
            rng.integers(0, 1 << 30, n) % np.maximum(max_vals, 1)
        ).astype(np.int32) + table.offset[indexes]
        symbols[:: n // 8] += 4000  # escapes: exercise the bypass path too
        stream = coder.encode_with_indexes(symbols, indexes, table)

        cases = [
            b"",
            b"\x01\x02",
            stream[: len(stream) // 3],
            rng.bytes(1024),
            bytes(
                np.frombuffer(stream, np.uint8)
                ^ (rng.random(len(stream)) < 0.02).astype(np.uint8)
            ),
        ]
        for bad in cases:
            if mode == "stream":
                dec = coder.RansDecoder()
                dec.set_stream(bad)
                out = dec.decode_stream(indexes, table)
            else:
                out = coder.decode_with_indexes(bad, indexes, table)
            assert out.shape == (n,) and out.dtype == np.int32

        # and the pristine stream still decodes exactly
        np.testing.assert_array_equal(
            coder.decode_with_indexes(stream, indexes, table), symbols
        )
