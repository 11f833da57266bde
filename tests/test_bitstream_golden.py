"""Bitstream format freeze: golden md5 of a deterministic encode.

The reference gates bit-exactness with md5 golden files
(tests/test_codec.py:114-128 + tests/expected/md5sum-*). Same idea here:
if the coder's stream format changes (precision, bypass coding, word
order, flush), this hash changes and the test fails loudly — decoded
files in the wild would no longer be readable.

Regenerate intentionally with GENERATE_EXPECTED=1 (prints the new hash).
"""

import hashlib
import os

import numpy as np

from lmic_tpu.entropy import coder

GOLDEN_MD5 = "1041ca195d5f8f37b8c25f968fdaa16c"
GOLDEN_LEN = 4864


def _fixture():
    cdf = np.array(
        [
            [0, 16000, 40000, 60000, 65536, 0],
            [0, 30000, 50000, 64000, 65536, 0],
            [0, 8000, 20000, 52000, 65536, 0],
        ],
        np.int32,
    )
    lens = np.array([5, 5, 5], np.int32)
    offs = np.array([-2, 0, 1], np.int32)
    table = coder.CdfTable(cdf, lens, offs)
    rng = np.random.default_rng(1234)
    symbols = rng.integers(-6, 9, 4096).astype(np.int32)  # exercises escapes
    indexes = rng.integers(0, 3, 4096).astype(np.int32)
    return table, symbols, indexes


def test_stream_format_frozen():
    table, symbols, indexes = _fixture()
    s = coder.encode_with_indexes(symbols, indexes, table)
    digest = hashlib.md5(s).hexdigest()
    if os.environ.get("GENERATE_EXPECTED"):
        print(f"GOLDEN_MD5 = \"{digest}\"; GOLDEN_LEN = {len(s)}")
    assert len(s) == GOLDEN_LEN
    assert digest == GOLDEN_MD5


def test_golden_stream_decodes():
    table, symbols, indexes = _fixture()
    s = coder.encode_with_indexes(symbols, indexes, table)
    np.testing.assert_array_equal(
        coder.decode_with_indexes(s, indexes, table), symbols
    )
    # streaming decoder agrees chunk-by-chunk
    dec = coder.RansDecoder()
    dec.set_stream(s)
    parts = [
        dec.decode_stream(indexes[i : i + 512], table)
        for i in range(0, len(indexes), 512)
    ]
    np.testing.assert_array_equal(np.concatenate(parts), symbols)
