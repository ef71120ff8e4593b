"""Hypothesis fuzz for the stdlib codecs: arbitrary bytes and
truncated valid files must fail with ValueError (the documented
contract) or decode cleanly — never IndexError/struct.error/hangs.
The mapInPandas decode stages run these functions on untrusted binary
columns at scale; any other exception class would kill the whole
batch with an undiagnosable stack."""

from __future__ import annotations

import zlib

from hypothesis import given, settings, strategies as st

from xero_api_etl_utilities_spark.functions.audiocodec import decode_wav, encode_wav
from xero_api_etl_utilities_spark.functions.imagecodec import (
    decode_bmp,
    decode_png,
    decode_ppm,
)
from xero_api_etl_utilities_spark.functions.videometa import video_meta

DECODERS = [decode_png, decode_bmp, decode_ppm, decode_wav, video_meta]


def _clean(fn, data: bytes) -> None:
    try:
        fn(data)
    except ValueError:
        pass  # the documented failure mode


class TestFuzzRandomBytes:
    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=4096))
    def test_random_bytes_fail_cleanly(self, data):
        for fn in DECODERS:
            _clean(fn, data)

    @settings(max_examples=100, deadline=None)
    @given(st.binary(min_size=0, max_size=512))
    def test_magic_prefixed_garbage_fails_cleanly(self, tail):
        # correct magics followed by garbage exercise the deep parse paths
        _clean(decode_png, b"\x89PNG\r\n\x1a\n" + tail)
        _clean(decode_bmp, b"BM" + tail)
        _clean(decode_ppm, b"P6\n" + tail)
        _clean(decode_wav, b"RIFF\x00\x00\x00\x00WAVE" + tail)
        _clean(video_meta, b"\x00\x00\x00\x14ftypisom" + tail)


class TestFuzzTruncations:
    def _valid_wav(self) -> bytes:
        return encode_wav(8000, [[i % 100 - 50 for i in range(64)]])

    def _valid_png(self) -> bytes:
        # 2x2 RGB: minimal hand-built PNG (filter 0 rows)
        import struct

        def chunk(tag: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
        raw = b"\x00" + b"\x01\x02\x03\x04\x05\x06" + b"\x00" + b"\x07\x08\x09\x0a\x0b\x0c"
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    @settings(max_examples=120, deadline=None)
    @given(st.data())
    def test_every_truncation_fails_cleanly(self, data):
        for blob, fn in [
            (self._valid_wav(), decode_wav),
            (self._valid_png(), decode_png),
        ]:
            cut = data.draw(st.integers(min_value=0, max_value=len(blob) - 1))
            try:
                fn(blob[:cut])
            except ValueError:
                pass  # includes wrapped zlib errors (corrupt IDAT)

    def test_valid_forms_still_decode(self):
        rate, n_ch, n_fr, chans = decode_wav(self._valid_wav())
        assert (rate, n_ch, n_fr) == (8000, 1, 64)
        w, h, ch, px = decode_png(self._valid_png())
        assert (w, h, ch) == (2, 2, 3)
        assert px == bytes(range(1, 13))


class TestFuzzXlsx:
    @settings(max_examples=80, deadline=None)
    @given(st.binary(min_size=0, max_size=2048))
    def test_random_bytes_fail_cleanly(self, data):
        from xero_api_etl_utilities_spark.sources.excel_grid import (
            decode_xlsx_grid,
        )

        try:
            decode_xlsx_grid(data, "Sheet1")
        except ValueError:
            pass

    @settings(max_examples=40, deadline=None)
    @given(st.binary(min_size=0, max_size=256))
    def test_zip_prefixed_garbage_fails_cleanly(self, tail):
        from xero_api_etl_utilities_spark.sources.excel_grid import (
            decode_xlsx_grid,
        )

        try:
            decode_xlsx_grid(b"PK\x03\x04" + tail, "Sheet1")
        except ValueError:
            pass
