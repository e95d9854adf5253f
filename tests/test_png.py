"""From-spec PNG codec goldens (no Spark).

The filter-reconstruction goldens below are HAND-FILTERED: the filtered
scanline bytes were computed by hand from the spec's filter definitions
(Sub/Up/Average/Paeth), so the decoder is checked against the published
algorithm, not against its own encoder.
"""

from __future__ import annotations

import hashlib
import random
import struct
import zlib
from pathlib import Path

import pytest

from wikidata_to_surrealdb_spark.functions.png import (
    PngError,
    decode_png,
    encode_png,
    resize_nearest,
)

SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ct: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ct
        + data
        + struct.pack(">I", zlib.crc32(ct + data) & 0xFFFFFFFF)
    )


def _png(width, height, depth, color_type, raw, extra=b""):
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, 0)
    return (
        SIG
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


# 2x2 RGB: row0 = (10,20,30),(40,60,80)  row1 = (15,25,35),(50,70,90)
# row0 filtered with Sub (filt = raw - left), row1 with Up (filt = raw - above);
# the filtered bytes below are hand-computed from those definitions.
GOLDEN_RGB_RAW = bytes([1, 10, 20, 30, 30, 40, 50, 2, 5, 5, 5, 10, 10, 10])
GOLDEN_RGB_PIXELS = bytes([10, 20, 30, 40, 60, 80, 15, 25, 35, 50, 70, 90])


def test_sub_up_filters_hand_golden():
    img = decode_png(_png(2, 2, 8, 2, GOLDEN_RGB_RAW))
    assert (img["width"], img["height"], img["channels"]) == (2, 2, 3)
    assert img["pixels"] == GOLDEN_RGB_PIXELS


def test_committed_fixture_decodes():
    buf = (Path(__file__).parent / "data" / "golden_2x2.png").read_bytes()
    img = decode_png(buf)
    assert img["pixels"] == GOLDEN_RGB_PIXELS
    assert hashlib.md5(img["pixels"]).hexdigest() == (
        "c7fceea544be9bc8d14bc04ffb32ebdb"
    )


def test_average_paeth_filters_hand_golden():
    # 2x2 gray: row0=[100,200] Average, row1=[50,150] Paeth.
    # Average: 100-0=100, 200-floor(100/2)=150.
    # Paeth row1: predictors are b=100 then b=200, filt = -50 -> 206.
    img = decode_png(_png(2, 2, 8, 0, bytes([3, 100, 150, 4, 206, 206])))
    assert img["pixels"] == bytes([100, 200, 50, 150])


def test_palette_expansion():
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    raw = bytes([0, 0, 1, 0, 2, 3])
    img = decode_png(_png(2, 2, 8, 3, raw, extra=_chunk(b"PLTE", plte)))
    assert img["channels"] == 3
    assert img["pixels"] == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])


def test_1bit_gray_unpack_and_scale():
    img = decode_png(_png(8, 1, 1, 0, bytes([0, 0b10110010])))
    assert img["pixels"] == bytes([255, 0, 255, 255, 0, 0, 255, 0])


def test_16bit_high_byte():
    img = decode_png(_png(2, 1, 16, 0, bytes([0, 0x12, 0x34, 0xFF, 0x00])))
    assert img["pixels"] == bytes([0x12, 0xFF])


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_encode_decode_roundtrip(channels):
    rnd = random.Random(1000 + channels)
    w, h = 9, 4
    px = bytes(rnd.randrange(256) for _ in range(w * h * channels))
    img = decode_png(encode_png(px, w, h, channels))
    assert img["pixels"] == px
    assert img["channels"] == channels
    assert (img["width"], img["height"]) == (w, h)


def test_resize_nearest_quadrants_and_inverse():
    px = bytes([1, 2, 3, 4])
    big = resize_nearest(px, 2, 2, 1, 4, 4)
    assert big == bytes([1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4])
    assert resize_nearest(big, 4, 4, 1, 2, 2) == px


def test_error_paths():
    with pytest.raises(PngError, match="signature"):
        decode_png(b"not a png")
    good = _png(2, 2, 8, 2, GOLDEN_RGB_RAW)
    with pytest.raises(PngError, match="CRC"):
        decode_png(good[:-4] + b"\x00\x00\x00\x00")
    with pytest.raises(PngError, match="interlace"):
        # interlace method 2 does not exist (0 = sequential, 1 = Adam7)
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 2)
        decode_png(
            SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(GOLDEN_RGB_RAW))
            + _chunk(b"IEND", b"")
        )
    with pytest.raises(PngError):
        # sequential-layout data mislabeled as Adam7 must fail cleanly
        # (pass-size mismatch), not mis-decode
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
        decode_png(
            SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(GOLDEN_RGB_RAW))
            + _chunk(b"IEND", b"")
        )
    with pytest.raises(PngError, match="expected"):
        decode_png(_png(2, 2, 8, 2, GOLDEN_RGB_RAW[:-1]))
    with pytest.raises(PngError):
        encode_png(b"\x00" * 5, 2, 2, 1)  # wrong buffer size


def test_truncated_stream_raises_pngerror_not_struct_error(spark=None):
    buf = encode_png(bytes(range(48)), 4, 4, 3)
    for cut in range(1, 13):
        try:
            decode_png(buf[:-cut])
        except PngError:
            pass  # struct.error escaping here would kill a Spark task
    with pytest.raises(PngError):
        # wrong-length IHDR
        bad = SIG + _chunk(b"IHDR", b"\x00" * 10) + _chunk(b"IEND", b"")
        decode_png(bad)


def test_zlib_bomb_bounded_to_pngerror():
    # A ~100 KB payload whose IDAT inflates to 100 MB must fail with
    # PngError (bounded inflate), never a task-killing MemoryError.
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bomb = (
        SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * (100 * 1024 * 1024), 9))
        + _chunk(b"IEND", b"")
    )
    assert len(bomb) < 200 * 1024
    with pytest.raises(PngError, match="exceeds expected"):
        decode_png(bomb)


def test_pixel_cap_rejected_before_decompress():
    ihdr = struct.pack(">IIBBBBB", 100000, 100000, 8, 0, 0, 0, 0)
    big = (
        SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="cap"):
        decode_png(big)
    # the cap is per-call configurable
    with pytest.raises(PngError, match="cap"):
        decode_png(encode_png(bytes(12), 2, 2, 3), max_pixels=3)


def test_unknown_critical_chunk_rejected_ancillary_skipped():
    good = encode_png(bytes(range(12)), 2, 2, 3)
    head, rest = good[: 8 + 25], good[8 + 25 :]  # sig+IHDR | IDAT+IEND
    with pytest.raises(PngError, match="critical"):
        decode_png(head + _chunk(b"CrIT", b"xx") + rest)
    # ancillary (lowercase first letter) chunks are still skipped
    out = decode_png(head + _chunk(b"tEXt", b"k\x00v") + rest)
    assert out["pixels"] == bytes(range(12))


def test_adam7_roundtrip_matches_sequential():
    """Adam7 (interlace method 1): seven independently filtered pass
    sub-images scattered on the spec's 8x8 grid. Filter-0 encoding is
    lossless, so interlaced and sequential decodes must both equal the
    original samples — including shapes where some passes are empty."""
    rng = random.Random(3)
    for w, h, ch in [(16, 16, 1), (17, 13, 3), (8, 8, 4), (1, 1, 1), (3, 2, 3), (9, 1, 1), (1, 9, 2)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        buf = encode_png(px, w, h, ch, interlace=True)
        out = decode_png(buf)
        assert out["pixels"] == px, (w, h, ch)
        assert decode_png(encode_png(px, w, h, ch))["pixels"] == px


def test_adam7_subbyte_depth():
    """Hand-built 1-bit gray Adam7 stream: pass scanlines are byte-
    aligned PER PASS, so sub-byte unpacking must run per sub-image."""
    from wikidata_to_surrealdb_spark.functions.png import _ADAM7

    w = h = 4
    bits = [[(x + y) % 2 for x in range(w)] for y in range(h)]
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        for i in range(ph):
            raw.append(0)
            y = y0 + i * dy
            b = 0
            for j in range(pw):
                b |= bits[y][x0 + j * dx] << (7 - j)
            raw.append(b)
    ihdr = struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 1)
    buf = (
        SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    expect = bytes(255 * bits[y][x] for y in range(h) for x in range(w))
    assert decode_png(buf)["pixels"] == expect


def test_adam7_corrupt_payloads_still_pngerror():
    """Corrupt-payload contract is unchanged for interlaced streams:
    truncations and short IDAT raise PngError, never IndexError."""
    px = bytes(range(48))
    buf = encode_png(px, 4, 4, 3, interlace=True)
    for cut in range(9, len(buf)):
        try:
            decode_png(buf[:cut])
        except PngError:
            pass
    # undersized pass data (valid zlib, wrong length)
    head = buf[: buf.index(b"IDAT") - 4]
    bad = head + _chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + _chunk(b"IEND", b"")
    with pytest.raises(PngError):
        decode_png(bad)
