"""Container read-side hardening.

Every length/shape field in a coded file is untrusted input; the read
paths (codec_cli.read_body / read_body_ref and the header readers) must
reject malformed files with a clean "corrupt container" ValueError —
never a MemoryError from a giant allocation, a struct.error from a short
read, or a silently-truncated stream. The reference's own read_body
(examples/codec_rgbt.py:224-249) trusts these fields; this suite pins
that we exceed it. Pure parsing — no model is ever built.
"""

import io
import struct

import numpy as np
import pytest

from lmic_tpu.utils import codec_cli as cc


def _body_bytes(shape=(4, 4), groups=((b"abc", b"de"), (b"xyz",))):
    f = io.BytesIO()
    cc.write_body(f, shape, [list(g) for g in groups])
    return f.getvalue()


def _body_ref_bytes(shape=(4, 4), streams=(b"abcdef", b"gh")):
    f = io.BytesIO()
    cc.write_body_ref(f, shape, [[s] for s in streams])
    return f.getvalue()


class TestReadBody:
    def test_roundtrip(self):
        buf = _body_bytes()
        shape, groups = cc.read_body(io.BytesIO(buf))
        assert shape == (4, 4)
        assert groups == [[b"abc", b"de"], [b"xyz"]]

    def test_oversized_stream_length_rejected(self):
        buf = bytearray(_body_bytes())
        # first stream's u32 length field sits right after shape(8B) +
        # n_groups(1B) + n(1B)
        struct.pack_into(">I", buf, 10, 0xFFFFFFFF)
        with pytest.raises(ValueError, match="corrupt container.*length"):
            cc.read_body(io.BytesIO(bytes(buf)))

    @pytest.mark.parametrize("cut", [1, 5, 9, 13])
    def test_truncation_rejected(self, cut):
        buf = _body_bytes()
        with pytest.raises(ValueError, match="corrupt container"):
            cc.read_body(io.BytesIO(buf[:-cut]))

    def test_implausible_shape_rejected(self):
        buf = bytearray(_body_bytes())
        struct.pack_into(">I", buf, 0, 1 << 31)
        with pytest.raises(ValueError, match="implausible shape"):
            cc.read_body(io.BytesIO(bytes(buf)))

    def test_zero_shape_rejected(self):
        buf = bytearray(_body_bytes())
        struct.pack_into(">I", buf, 4, 0)
        with pytest.raises(ValueError, match="implausible shape"):
            cc.read_body(io.BytesIO(bytes(buf)))

    def test_fuzz_byte_flips_never_hang_or_blow_up(self):
        """Random single-byte corruption: the parser either succeeds (the
        flip hit stream payload) or raises the clean ValueError — nothing
        else, and no giant allocation."""
        base = _body_bytes(
            shape=(8, 6), groups=((b"0123456789" * 3, b"ab"), (b"curl",))
        )
        rng = np.random.default_rng(0)
        for _ in range(300):
            buf = bytearray(base)
            i = int(rng.integers(len(buf)))
            buf[i] ^= int(rng.integers(1, 256))
            try:
                cc.read_body(io.BytesIO(bytes(buf)))
            except ValueError as e:
                assert "corrupt container" in str(e)

    def test_fuzz_truncations(self):
        base = _body_bytes()
        for cut in range(1, len(base)):
            try:
                cc.read_body(io.BytesIO(base[:cut]))
            except ValueError as e:
                assert "corrupt container" in str(e)


class TestReadBodyRef:
    def test_roundtrip(self):
        shape, groups = cc.read_body_ref(io.BytesIO(_body_ref_bytes()))
        assert shape == (4, 4)
        assert groups == [[b"abcdef"], [b"gh"]]

    def test_huge_stream_count_rejected(self):
        f = io.BytesIO()
        cc.write_uints(f, (4, 4, 1 << 30))
        with pytest.raises(ValueError, match="stream count"):
            cc.read_body_ref(io.BytesIO(f.getvalue()))

    def test_oversized_length_rejected(self):
        buf = bytearray(_body_ref_bytes())
        struct.pack_into(">I", buf, 12, 0x7FFFFFFF)  # after h,w,n
        with pytest.raises(ValueError, match="corrupt container.*length"):
            cc.read_body_ref(io.BytesIO(bytes(buf)))

    def test_fuzz_byte_flips(self):
        base = _body_ref_bytes(streams=(b"0123456789abcdef", b"zz"))
        rng = np.random.default_rng(1)
        for _ in range(300):
            buf = bytearray(base)
            i = int(rng.integers(len(buf)))
            buf[i] ^= int(rng.integers(1, 256))
            try:
                cc.read_body_ref(io.BytesIO(bytes(buf)))
            except ValueError as e:
                assert "corrupt container" in str(e)


class TestCliSurface:
    def test_corrupt_file_is_a_clean_cli_error(self, tmp_path):
        """lmic-codec decode of a corrupt file exits with the corrupt-
        container message, not a traceback (main catches the guard's
        ValueError)."""
        p = tmp_path / "bad.bin"
        f = io.BytesIO()
        cc.write_uints(f, (cc.MAGIC,))
        cc.write_uchars(f, (0, 0))            # factorized q=1
        cc.write_uints(f, (64, 64))
        cc.write_uchars(f, (8,))
        body = bytearray(_body_bytes())
        struct.pack_into(">I", body, 10, 0xFFFFFFFF)
        p.write_bytes(f.getvalue() + bytes(body))
        with pytest.raises(SystemExit, match="corrupt container"):
            cc.main(["decode", str(p), "-o", str(tmp_path / "out.png")])

    def test_truncated_header_is_clean(self, tmp_path):
        p = tmp_path / "tiny.bin"
        p.write_bytes(struct.pack(">I", cc.MAGIC) + b"\x00")
        with pytest.raises(SystemExit, match="corrupt container"):
            cc.main(["decode", str(p), "-o", str(tmp_path / "out.png")])
