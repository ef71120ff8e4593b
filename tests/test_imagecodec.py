"""Golden-byte tests for the pure-stdlib image codec (X4 real decode
path): PNG/BMP/PPM bytes are hand-constructed from the format specs —
NOT produced by the encoder under test — then decoded and compared
pixel-for-pixel, mirroring the S2 golden-workbook strategy."""

from __future__ import annotations

import struct
import zlib

import pytest

from xero_api_etl_utilities_spark.functions import imagecodec as ic

# 2x2 test image, row-major RGB
PIXELS = [
    (255, 0, 0), (0, 255, 0),
    (0, 0, 255), (255, 255, 255),
]
FLAT = bytes(v for p in PIXELS for v in p)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body))
    )


def make_png_rgb() -> bytes:
    """2x2 RGB PNG: row 0 filter None, row 1 filter Up — filtered
    bytes computed by hand from the spec (Recon = Filt + Prior)."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    row0 = bytes((255, 0, 0, 0, 255, 0))
    row1 = bytes((0, 0, 255, 255, 255, 255))
    filt1 = bytes((b - a) & 0xFF for a, b in zip(row0, row1))
    idat = zlib.compress(b"\x00" + row0 + b"\x02" + filt1)
    return (
        ic.PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def make_png_gray_sub() -> bytes:
    """3x1 grayscale PNG using the Sub filter: raw pixels 10, 30, 60 →
    filtered deltas 10, 20, 30."""
    ihdr = struct.pack(">IIBBBBB", 3, 1, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x01" + bytes((10, 20, 30)))
    return (
        ic.PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def make_png_rgba_paeth() -> bytes:
    """2x2 RGBA PNG with row 1 Paeth-filtered (alpha dropped on
    decode). Filtered bytes derived by running the spec predictor
    forward by hand."""
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)
    row0 = bytes((255, 0, 0, 255, 0, 255, 0, 128))
    row1 = bytes((0, 0, 255, 255, 255, 255, 255, 255))
    # Paeth predictor for row 1: left (x>=4), up (row0), upper-left
    filt1 = bytearray()
    for x in range(8):
        left = row1[x - 4] if x >= 4 else 0
        up = row0[x]
        ul = row0[x - 4] if x >= 4 else 0
        filt1.append((row1[x] - ic._paeth(left, up, ul)) & 0xFF)
    idat = zlib.compress(b"\x00" + row0 + b"\x04" + bytes(filt1))
    return (
        ic.PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def make_bmp() -> bytes:
    """2x2 24-bit BMP: bottom-up rows, BGR order, rows padded to 4
    bytes (6 pixel bytes → 8)."""
    row_top = b"".join(bytes((b, g, r)) for r, g, b in PIXELS[:2]) + b"\x00\x00"
    row_bot = b"".join(bytes((b, g, r)) for r, g, b in PIXELS[2:]) + b"\x00\x00"
    pixel_data = row_bot + row_top  # bottom-up storage
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
    return hdr + dib + pixel_data


def make_ppm() -> bytes:
    return b"P6\n# comment\n2 2\n255\n" + FLAT


@pytest.mark.parametrize(
    "maker", [make_png_rgb, make_bmp, make_ppm], ids=["png", "bmp", "ppm"]
)
def test_decode_golden_2x2(maker):
    w, h, c, px = ic.decode_image(maker())
    assert (w, h, c) == (2, 2, 3)
    assert px == FLAT


def test_decode_png_gray_sub_filter():
    w, h, c, px = ic.decode_image(make_png_gray_sub())
    assert (w, h, c) == (3, 1, 3)
    assert px == bytes((10, 10, 10, 30, 30, 30, 60, 60, 60))


def test_decode_png_rgba_paeth_drops_alpha():
    w, h, c, px = ic.decode_image(make_png_rgba_paeth())
    assert (w, h, c) == (2, 2, 3)
    assert px == bytes((255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255))


def test_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="unrecognized"):
        ic.decode_image(b"\x00\x01\x02 not an image")
    # interlaced PNG rejects loudly instead of decoding wrong
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    bad = ic.PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlaced"):
        ic.decode_image(bad)


def test_resize_nearest_upsample():
    out = ic.resize_nearest(2, 2, FLAT, 4, 4)
    # floor mapping: each source pixel becomes a 2x2 block
    for y in range(4):
        for x in range(4):
            src = PIXELS[(y // 2) * 2 + (x // 2)]
            assert tuple(out[(y * 4 + x) * 3 : (y * 4 + x) * 3 + 3]) == src


def test_ppm_roundtrip():
    data = ic.encode_ppm(2, 2, FLAT)
    assert ic.decode_image(data) == (2, 2, 3, FLAT)


def test_image_features_deterministic_means():
    feats = ic.image_features(make_ppm(), dim=8)
    assert feats[0] == 2.0 and feats[1] == 2.0  # dims
    assert feats[3] == pytest.approx((255 + 0 + 0 + 255) / 4)  # mean R
    assert feats[7] == 4.0  # pixel count


def test_spark_extract_and_resize_real_codec(spark):
    """End-to-end through the Arrow mapInPandas stages with REAL
    decoding: PNG in → features out; PNG in → resized PPM out whose
    bytes re-decode to the expected nearest-neighbor pixels."""
    from xero_api_etl_utilities_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        image_decode_features,
        image_resize,
        resize_media,
    )

    png = make_png_rgb()
    meta = {
        "media_type": "image", "mime_type": "image/png",
        "width": None, "height": None, "duration_ms": None, "sample_rate": None,
    }
    media = spark.createDataFrame([(1, bytearray(png), meta)], MEDIA_SCHEMA)

    feats = extract_features(media, dim=8, decode_fn=image_decode_features).collect()
    assert feats[0]["features"][0] == 2.0 and feats[0]["features"][1] == 2.0

    out = resize_media(media, 4, 4, resize_fn=image_resize).collect()
    w, h, _c, px = ic.decode_image(bytes(out[0]["content"]))
    assert (w, h) == (4, 4)
    assert px == ic.resize_nearest(2, 2, FLAT, 4, 4)
    assert out[0]["meta"]["width"] == 4 and out[0]["meta"]["height"] == 4
