"""From-spec JPEG codec: round-trip fidelity, committed-fixture goldens,
the general (subsampled) MCU path, header-only metadata, and the
corrupt-input contract (JpegError, never a task-killing exception)."""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np
import pytest

from wikidata_to_surrealdb_spark.functions.jpeg import (
    JpegError,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
    jpeg_dimensions,
)

DATA = Path(__file__).parent / "data"


def _psnr(a: bytes, b: bytes) -> float:
    x = np.frombuffer(a, np.uint8).astype(np.float64)
    y = np.frombuffer(b, np.uint8).astype(np.float64)
    mse = ((x - y) ** 2).mean()
    return float("inf") if mse == 0 else 10 * np.log10(255**2 / mse)


def _gray_gradient(w: int, h: int) -> bytes:
    return bytes(((x * 9 + y * 7) % 256) for y in range(h) for x in range(w))


def test_committed_fixture_decodes_to_committed_pixels():
    # the fixture was produced by this codec; pinning BOTH the file and
    # its decoded pixels catches silent drift in either direction
    buf = (DATA / "golden_16x16.jpg").read_bytes()
    expect = (DATA / "golden_16x16_decoded.bin").read_bytes()
    out = decode_jpeg(buf)
    assert (out["width"], out["height"], out["channels"]) == (16, 16, 1)
    assert out["pixels"] == expect
    # and the decode is faithful to the original raster, not merely stable
    assert _psnr(_gray_gradient(16, 16), out["pixels"]) > 40


def test_gray_roundtrip_quality_ladder():
    px = _gray_gradient(32, 24)
    prev = 0.0
    for q in (50, 75, 95):
        out = decode_jpeg(encode_jpeg(px, 32, 24, 1, quality=q))
        p = _psnr(px, out["pixels"])
        # the mod-256 sawtooth has hard wrap discontinuities — a harsh
        # fixture; ~29 dB at q50 is the expected DCT behavior
        assert p > 28, (q, p)
        assert p >= prev - 1.0  # higher quality must not lose fidelity
        prev = p


def test_rgb_444_roundtrip():
    rgb = bytearray()
    for y in range(16):
        for x in range(16):
            rgb += bytes(((x * 16) % 256, (y * 16) % 256, ((x + y) * 8) % 256))
    out = decode_jpeg(encode_jpeg(bytes(rgb), 16, 16, 3, quality=90))
    assert (out["width"], out["height"], out["channels"]) == (16, 16, 3)
    assert _psnr(bytes(rgb), out["pixels"]) > 35


def test_rgb_420_roundtrip_odd_dimensions():
    # 4:2:0 exercises the general MCU path (4 luma + 2 chroma blocks per
    # 16x16 MCU) and the chroma upsample; odd dims exercise edge padding
    w, h = 37, 27
    rgb = bytearray()
    for y in range(h):
        for x in range(w):
            rgb += bytes(
                (
                    int(100 + 50 * np.sin(x / 6)),
                    int(100 + 50 * np.cos(y / 6)),
                    int(128 + 40 * np.sin((x + y) / 9)),
                )
            )
    buf = encode_jpeg(bytes(rgb), w, h, 3, quality=90, subsampling="420")
    d = jpeg_dimensions(buf)
    assert (d["width"], d["height"], d["components"]) == (w, h, 3)
    out = decode_jpeg(buf)
    assert len(out["pixels"]) == w * h * 3
    assert _psnr(bytes(rgb), out["pixels"]) > 30
    # subsampling must actually shrink the payload on this smooth image
    assert len(buf) < len(encode_jpeg(bytes(rgb), w, h, 3, quality=90))


def test_constant_image_is_exact():
    c = bytes([128]) * 64
    assert decode_jpeg(encode_jpeg(c, 8, 8, 1, 75))["pixels"] == c


def test_dimensions_header_only_parse():
    buf = encode_jpeg(_gray_gradient(21, 13), 21, 13, 1, 80)
    d = jpeg_dimensions(buf)
    assert d == {
        "width": 21,
        "height": 13,
        "components": 1,
        "precision": 8,
        "progressive": False,
    }
    # works even when the entropy data is truncated (headers intact)
    assert jpeg_dimensions(buf[:-20])["width"] == 21


def test_error_paths_raise_jpegerror():
    good = encode_jpeg(_gray_gradient(16, 16), 16, 16, 1, 85)
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    with pytest.raises(JpegError):
        decode_jpeg(good[:40])  # truncated in the header segments
    with pytest.raises(JpegError):
        decode_jpeg(good[:-5])  # truncated entropy data
    for cut in range(1, 24):
        try:
            decode_jpeg(good[:-cut])
        except JpegError:
            pass  # anything else would kill a Spark task
    with pytest.raises(JpegError, match="quality"):
        encode_jpeg(b"\x00" * 4, 2, 2, 1, quality=0)
    with pytest.raises(JpegError, match="channels"):
        encode_jpeg(b"\x00" * 8, 2, 2, 2)
    with pytest.raises(JpegError, match="expected"):
        encode_jpeg(b"\x00" * 5, 2, 2, 1)


def test_pixel_cap_rejected_before_plane_allocation():
    import struct

    # hand-build an SOF claiming 100000x100000 (no plane alloc may happen)
    good = encode_jpeg(_gray_gradient(8, 8), 8, 8, 1, 85)
    sof_at = good.find(b"\xff\xc0")
    assert sof_at > 0
    bad = bytearray(good)
    bad[sof_at + 5 : sof_at + 9] = struct.pack(">HH", 50000, 50000)
    with pytest.raises(JpegError, match="cap"):
        decode_jpeg(bytes(bad))
    with pytest.raises(JpegError, match="cap"):
        decode_jpeg(good, max_pixels=16)


def test_progressive_decodes_identical_to_baseline():
    """SOF2 support (T.81 Annex G): the progressive encoder transmits
    the SAME quantized coefficients as the baseline encoder (spectral
    selection + successive approximation, libjpeg-style scan script),
    so the decoded pixels must be bit-identical — exercising DC
    first/refine, AC first/refine, EOB runs, and non-interleaved scan
    geometry in one assertion per shape."""
    rs = np.random.RandomState(7)
    for w, h, ch, sub in [
        (16, 16, 1, "444"),
        (21, 13, 1, "444"),  # odd dims: partial edge blocks
        (48, 32, 3, "444"),
        (33, 17, 3, "420"),  # subsampled: nbw/nbh < bw/bh geometry
    ]:
        px = bytes(rs.randint(0, 256, w * h * ch).astype(np.uint8))
        base = decode_jpeg(encode_jpeg(px, w, h, ch, 85, sub))
        buf = encode_jpeg_progressive(px, w, h, ch, 85, sub)
        d = jpeg_dimensions(buf)
        assert d["progressive"] is True and d["width"] == w
        assert decode_jpeg(buf)["pixels"] == base["pixels"], (w, h, ch, sub)


def test_progressive_restart_markers_roundtrip():
    """RSTn inside progressive scans must reset DC predictors AND the
    EOB run; pixels stay identical to the unrestarted stream."""
    import re

    rs = np.random.RandomState(9)
    px = bytes(rs.randint(0, 256, 48 * 32 * 3).astype(np.uint8))
    base = decode_jpeg(encode_jpeg(px, 48, 32, 3, 85, "420"))
    buf = encode_jpeg_progressive(px, 48, 32, 3, 85, "420", restart_interval=2)
    assert len(re.findall(rb"\xff[\xd0-\xd7]", buf)) > 0
    assert decode_jpeg(buf)["pixels"] == base["pixels"]


def test_progressive_committed_fixture():
    """Golden: a committed progressive (SOF2) file must keep decoding to
    its committed pixels — catches silent drift in the multi-scan
    decode paths from either direction."""
    buf = (DATA / "golden_prog_24x16.jpg").read_bytes()
    expect = (DATA / "golden_prog_24x16_decoded.bin").read_bytes()
    d = jpeg_dimensions(buf)
    assert d["progressive"] is True
    out = decode_jpeg(buf)
    assert (out["width"], out["height"], out["channels"]) == (24, 16, 3)
    assert out["pixels"] == expect


def test_progressive_truncation_contract():
    """Every possible truncation of a progressive stream raises
    JpegError — never a task-killing IndexError/ValueError."""
    buf = encode_jpeg_progressive(_gray_gradient(16, 16), 16, 16, 1, 85)
    for cut in range(1, len(buf)):
        with pytest.raises(JpegError):
            decode_jpeg(buf[:cut])


def test_foreign_huffman_tables_decode():
    """The decoder must use the tables FROM THE STREAM, not assume
    Annex K: re-encode with a degenerate but valid DHT (all code lengths
    shifted one longer) and check the decode still round-trips."""
    # build by patching the encoder's DHT segments: easiest equivalent
    # check is that decode uses parsed tables — corrupt one DHT value
    # and the decode must CHANGE or fail, proving the stream table is
    # actually consulted.
    # a NOISY image so every AC size category actually occurs (a smooth
    # gradient never emits size-1/2 AC symbols and the swap would be
    # invisible)
    rs = np.random.RandomState(3)
    px = bytes(rs.randint(0, 256, 256).astype(np.uint8))
    good = encode_jpeg(px, 16, 16, 1, 85)
    base = decode_jpeg(good)["pixels"]
    # second DHT segment is the AC table; its first two values are the
    # (run=0, size=1) / (run=0, size=2) symbols — swapping them changes
    # the decode iff the stream table is actually consulted
    dht_at = good.find(b"\xff\xc4", good.find(b"\xff\xc4") + 2)
    bad = bytearray(good)
    v0 = dht_at + 4 + 1 + 16
    bad[v0], bad[v0 + 1] = bad[v0 + 1], bad[v0]
    try:
        changed = decode_jpeg(bytes(bad))["pixels"]
        assert changed != base
    except JpegError:
        pass  # also acceptable: the stream became inconsistent


def test_restart_markers_roundtrip_bit_identical():
    """DRI/RSTn: the restart path (byte-align, raw marker, DC predictor
    reset) must decode to exactly the same pixels as the plain stream —
    and the markers must actually be there."""
    import re

    rs = np.random.RandomState(5)
    px = bytes(rs.randint(0, 256, 64 * 16).astype(np.uint8))
    plain = encode_jpeg(px, 64, 16, 1, 85)
    dri = encode_jpeg(px, 64, 16, 1, 85, restart_interval=3)
    assert b"\xff\xdd" in dri
    # 0xFF data bytes are always stuffed with 0x00, so every
    # 0xFF D0-D7 pair in the stream IS a restart marker
    assert len(re.findall(rb"\xff[\xd0-\xd7]", dri)) == 5  # 16 MCUs @ 3
    assert decode_jpeg(dri)["pixels"] == decode_jpeg(plain)["pixels"]

    rgb = bytes(rs.randint(0, 256, 48 * 32 * 3).astype(np.uint8))
    with_dri = encode_jpeg(rgb, 48, 32, 3, 85, subsampling="420", restart_interval=2)
    without = encode_jpeg(rgb, 48, 32, 3, 85, subsampling="420")
    assert decode_jpeg(with_dri)["pixels"] == decode_jpeg(without)["pixels"]


def _shrink_segment(buf: bytes, marker: bytes, new_payload_len: int) -> bytes:
    """Rewrite a segment's length field so its payload parses short —
    the corrupt shape real truncation-in-the-middle produces (the
    segment slice is internally consistent, just missing fields)."""
    import struct

    at = buf.find(marker)
    assert at > 0
    out = bytearray(buf)
    out[at + 2 : at + 4] = struct.pack(">H", new_payload_len + 2)
    return bytes(out)


def test_short_segment_payloads_raise_jpegerror():
    """ADVICE regression: a short SOF component list / SOS header / DRI
    payload must raise JpegError, never bare ValueError ('not enough
    values to unpack') or IndexError — those kill the Spark task."""
    good = encode_jpeg(_gray_gradient(16, 16), 16, 16, 1, 85)

    # SOF with the component list cut off (6-byte header only)
    with pytest.raises(JpegError, match="SOF component"):
        decode_jpeg(_shrink_segment(good, b"\xff\xc0", 6))
    # SOF shorter than its own fixed header
    with pytest.raises(JpegError, match="SOF"):
        decode_jpeg(_shrink_segment(good, b"\xff\xc0", 3))
    # SOS with an empty payload
    with pytest.raises(JpegError, match="SOS"):
        decode_jpeg(_shrink_segment(good, b"\xff\xda", 0))
    # SOS whose component specs / Ss-Se-AhAl trailer are cut off
    with pytest.raises(JpegError, match="SOS"):
        decode_jpeg(_shrink_segment(good, b"\xff\xda", 2))
    # DRI with a short payload
    dri = encode_jpeg(_gray_gradient(16, 16), 16, 16, 1, 85, restart_interval=1)
    with pytest.raises(JpegError, match="DRI"):
        decode_jpeg(_shrink_segment(dri, b"\xff\xdd", 1))


def test_encode_rejects_dimensions_beyond_u16():
    """ADVICE regression: SOF stores dims as u16; oversized input must
    raise JpegError up front, not struct.error mid-encode."""
    with pytest.raises(JpegError, match="65535"):
        encode_jpeg(b"\x00" * 65537, 1, 65537, 1)
