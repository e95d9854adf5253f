"""From-spec PNG codec on the stdlib only (zlib + struct).

The container has no image libraries, but PNG is decodable with public
knowledge alone: the W3C PNG specification (also RFC 2083) defines the
byte format — an 8-byte signature, length-prefixed CRC-checked chunks
(IHDR / PLTE / IDAT / IEND), zlib-compressed scanlines, and five
per-scanline prediction filters (None / Sub / Up / Average / Paeth).
This module implements exactly that, so ``operators/multimodal.py`` can
offer a *real* image decode path (``decoder="png"``) instead of only the
deterministic fake.

Scope (documented, raises beyond it):
- bit depths 1/2/4/8/16, colour types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA);
- interlace methods 0 (sequential) and 1 (Adam7: seven sub-images,
  each independently filtered, scattered back on the 8x8 pattern grid
  per the spec);
- samples are returned widened/narrowed to 8 bits per sample (sub-byte
  gray scaled to 0..255 per the spec's sample-depth scaling note;
  16-bit narrowed to the high byte), which is what the feature /
  resize operators need;
- tRNS is ignored (features don't use transparency); PLTE is expanded
  so palette images come back as RGB.

This file is pure Python and runs inside Arrow-batched ``mapInPandas``
workers; per-task memory is one decoded image at a time. The reference
only ever stores a media *pointer* (`CommonsMedia(String)`,
/root/reference/src/utils/tables.rs:18-21) — this is the extension that
turns the pointer into pixels.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# Refuse to decode images larger than this many pixels (default 64 Mpx ≈
# 256 MB of RGBA samples). zlib expands up to ~1000:1, so both this cap
# and the bounded decompress below are required for a corrupt/hostile
# payload to fail with PngError instead of an executor-killing
# MemoryError.
MAX_PIXELS = 1 << 26

# colour type -> samples per pixel (before palette expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_ALLOWED_DEPTHS = {
    0: {1, 2, 4, 8, 16},
    2: {8, 16},
    3: {1, 2, 4, 8},
    4: {8, 16},
    6: {8, 16},
}


class PngError(ValueError):
    """Malformed or out-of-scope PNG stream."""


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per the PNG spec.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _adam7_pass_sizes(width: int, height: int, bits_per_px: int):
    """Per-pass (pw, ph, stride) — passes that cover no pixels of this
    image contribute NO scanlines at all (spec: empty passes are
    entirely absent from the data stream)."""
    sizes = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx if width > x0 else 0
        ph = (height - y0 + dy - 1) // dy if height > y0 else 0
        stride = (pw * bits_per_px + 7) // 8
        sizes.append((pw, ph, stride))
    return sizes


def _paeth(a: int, b: int, c: int) -> int:
    # PaethPredictor as specified: nearest of a (left), b (above),
    # c (upper-left) to p = a + b - c, ties preferring a, then b.
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int, stride: int) -> bytearray:
    """Reverse the per-scanline filters. ``raw`` is height * (1 + stride)
    bytes: each scanline is a filter-type byte followed by ``stride``
    filtered bytes. Returns the reconstructed scanline bytes."""
    expect = height * (1 + stride)
    if len(raw) != expect:
        raise PngError(f"decompressed IDAT is {len(raw)} bytes, expected {expect}")
    out = bytearray(height * stride)
    prev_off = -1  # byte offset of previous reconstructed scanline
    for y in range(height):
        ftype = raw[y * (1 + stride)]
        line = raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)]
        off = y * stride
        if ftype == 0:  # None
            out[off : off + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                a = out[off + i - bpp] if i >= bpp else 0
                out[off + i] = (line[i] + a) & 0xFF
        elif ftype == 2:  # Up
            if prev_off < 0:
                out[off : off + stride] = line
            else:
                for i in range(stride):
                    out[off + i] = (line[i] + out[prev_off + i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = out[off + i - bpp] if i >= bpp else 0
                b = out[prev_off + i] if prev_off >= 0 else 0
                out[off + i] = (line[i] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = out[off + i - bpp] if i >= bpp else 0
                b = out[prev_off + i] if prev_off >= 0 else 0
                c = out[prev_off + i - bpp] if (prev_off >= 0 and i >= bpp) else 0
                out[off + i] = (line[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise PngError(f"unknown filter type {ftype} on scanline {y}")
        prev_off = off
    return out


def _expand_samples(
    recon: bytearray, width: int, height: int, depth: int, channels: int, stride: int
) -> bytearray:
    """Widen scanline bytes to one 8-bit value per sample."""
    if depth == 8:
        return recon
    out = bytearray(width * height * channels)
    if depth == 16:
        # big-endian sample pairs -> high byte
        for j in range(len(out)):
            out[j] = recon[2 * j]
        return out
    # 1/2/4-bit packed samples, MSB first within each byte; scanlines are
    # byte-aligned so unpack per scanline.
    per_byte = 8 // depth
    maxval = (1 << depth) - 1
    j = 0
    for y in range(height):
        base = y * stride
        got = 0
        for i in range(stride):
            b = recon[base + i]
            for k in range(per_byte):
                if got >= width * channels:
                    break
                out[j] = (b >> (8 - depth * (k + 1))) & maxval
                j += 1
                got += 1
    return out


def decode_png(buf: bytes, max_pixels: int = MAX_PIXELS) -> dict:
    """Decode a PNG byte string.

    Returns ``{"width", "height", "bit_depth", "color_type", "channels",
    "pixels"}`` where ``pixels`` is ``bytes`` of 8-bit samples in
    row-major (y, x, channel) order. Palette images are expanded to RGB;
    sub-byte grayscale is scaled to 0..255.

    Memory safety: images above ``max_pixels`` are rejected before any
    decompression, and the IDAT inflate is bounded to the exact output
    size IHDR implies — a zlib bomb raises PngError, never MemoryError.
    """
    if len(buf) < 8 or buf[:8] != _SIGNATURE:
        raise PngError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise PngError(f"truncated {ctype!r} chunk")
        crc_bytes = buf[pos + 8 + length : pos + 12 + length]
        if len(crc_bytes) != 4:
            # truncated inside the CRC field: struct.error would escape
            # the workers' except clauses and kill the Spark task
            raise PngError(f"truncated {ctype!r} chunk CRC")
        crc = struct.unpack(">I", crc_bytes)[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            if length != 13:
                raise PngError(f"IHDR must be 13 bytes, got {length}")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = bytes(data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            seen_iend = True
            break
        elif not (ctype[0] & 0x20):
            # Critical chunks (ancillary bit clear) we don't understand
            # must abort the decode per the spec; skipping them would
            # silently mis-decode the image.
            raise PngError(f"unhandled critical chunk {ctype!r}")
        # ancillary chunks (tEXt, gAMA, tRNS, ...) are skipped
        pos += 12 + length
    if ihdr is None:
        raise PngError("missing IHDR")
    if not seen_iend:
        raise PngError("missing IEND")
    if not idat:
        raise PngError("missing IDAT")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if width == 0 or height == 0:
        raise PngError("zero-dimension image")
    if comp != 0 or filt != 0:
        raise PngError("unknown compression/filter method")
    if interlace not in (0, 1):
        raise PngError(f"unknown interlace method {interlace}")
    if color_type not in _CHANNELS:
        raise PngError(f"unknown colour type {color_type}")
    if depth not in _ALLOWED_DEPTHS[color_type]:
        raise PngError(f"bit depth {depth} invalid for colour type {color_type}")
    if width * height > max_pixels:
        raise PngError(
            f"image is {width}x{height} = {width * height} px, cap is {max_pixels}"
        )

    channels = _CHANNELS[color_type]
    bits_per_px = channels * depth
    stride = (width * bits_per_px + 7) // 8
    bpp = max(1, bits_per_px // 8)
    # Inflate bounded to the exact size IHDR implies; one extra byte so
    # oversized streams are detectable without unbounded allocation.
    if interlace == 1:
        pass_sizes = _adam7_pass_sizes(width, height, bits_per_px)
        expect = sum(ph * (1 + ps) for pw, ph, ps in pass_sizes if pw and ph)
    else:
        expect = height * (1 + stride)
    dec = zlib.decompressobj()
    raw = dec.decompress(bytes(idat), expect + 1)
    if len(raw) <= expect:
        raw += dec.flush(expect + 1 - len(raw))
    if len(raw) > expect or dec.unconsumed_tail:
        raise PngError(f"decompressed IDAT exceeds expected {expect} bytes")
    if interlace == 1:
        # Adam7: each pass is an independently filtered sub-image;
        # unfilter + widen it, then scatter its samples onto the pass
        # grid. Per-pass memory is one sub-image — the full-image buffer
        # is the same one the sequential path allocates.
        nsamp = width * height * channels
        scattered = bytearray(nsamp)
        off = 0
        for (x0, y0, dx, dy), (pw, ph, ps) in zip(_ADAM7, pass_sizes):
            if pw == 0 or ph == 0:
                continue
            seg = raw[off : off + ph * (1 + ps)]
            off += ph * (1 + ps)
            recon = _unfilter(seg, pw, ph, bpp, ps)
            psamp = _expand_samples(recon, pw, ph, depth, channels, ps)
            for i in range(ph):
                y = y0 + i * dy
                row = (y * width + x0) * channels
                src = i * pw * channels
                for j in range(pw):
                    d = row + j * dx * channels
                    s = src + j * channels
                    scattered[d : d + channels] = psamp[s : s + channels]
        samples = scattered
    else:
        recon = _unfilter(raw, width, height, bpp, stride)
        samples = _expand_samples(recon, width, height, depth, channels, stride)

    if color_type == 3:
        if plte is None:
            raise PngError("palette image without PLTE")
        n_entries = len(plte) // 3
        rgb = bytearray(width * height * 3)
        for j, idx in enumerate(samples):
            if idx >= n_entries:
                raise PngError(f"palette index {idx} out of range")
            rgb[3 * j : 3 * j + 3] = plte[3 * idx : 3 * idx + 3]
        samples, channels = rgb, 3
    elif depth in (1, 2, 4):
        # scale sub-byte gray to full 8-bit range (spec sample scaling)
        maxval = (1 << depth) - 1
        samples = bytearray((v * 255) // maxval for v in samples)

    return {
        "width": width,
        "height": height,
        "bit_depth": depth,
        "color_type": color_type,
        "channels": channels,
        "pixels": bytes(samples),
    }


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 3,
    level: int = 6,
    interlace: bool = False,
) -> bytes:
    """Encode 8-bit samples to a minimal valid PNG (filter 0 scanlines).

    ``channels`` 1 -> grayscale, 2 -> gray+alpha, 3 -> RGB, 4 -> RGBA.
    ``interlace=True`` writes Adam7: the seven pass sub-images in spec
    order, each scanline filter-0 (lossless, so interlaced and
    sequential encodes decode to identical pixels).
    Deterministic for a given input (fixed zlib level, single IDAT).
    """
    ct = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if ct is None:
        raise PngError(f"channels must be 1..4, got {channels}")
    if len(pixels) != width * height * channels:
        raise PngError(
            f"pixel buffer is {len(pixels)} bytes, expected {width * height * channels}"
        )
    stride = width * channels
    raw = bytearray()
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx if width > x0 else 0
            ph = (height - y0 + dy - 1) // dy if height > y0 else 0
            if pw == 0 or ph == 0:
                continue  # empty passes emit no scanlines (spec)
            for i in range(ph):
                raw.append(0)  # filter type None
                y = y0 + i * dy
                for j in range(pw):
                    x = x0 + j * dx
                    s = (y * width + x) * channels
                    raw += pixels[s : s + channels]
    else:
        for y in range(height):
            raw.append(0)  # filter type None
            raw += pixels[y * stride : (y + 1) * stride]
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, ct, 0, 0, 1 if interlace else 0
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(
    pixels: bytes,
    width: int,
    height: int,
    channels: int,
    new_width: int,
    new_height: int,
) -> bytes:
    """Nearest-neighbour resize of 8-bit samples (pixel-centre mapping:
    src = floor((dst + 0.5) * src_size / dst_size), the standard NN rule)."""
    if new_width <= 0 or new_height <= 0:
        raise PngError("target dimensions must be positive")
    out = bytearray(new_width * new_height * channels)
    j = 0
    for y in range(new_height):
        sy = min(height - 1, (2 * y + 1) * height // (2 * new_height))
        row = sy * width * channels
        for x in range(new_width):
            sx = min(width - 1, (2 * x + 1) * width // (2 * new_width))
            src = row + sx * channels
            out[j : j + channels] = pixels[src : src + channels]
            j += channels
    return bytes(out)
