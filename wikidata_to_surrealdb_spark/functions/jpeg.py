"""From-spec baseline JPEG codec (stdlib + numpy only).

The container has no image libraries, but baseline JPEG is decodable
with public knowledge alone: ITU-T T.81 (the JPEG standard) defines the
marker structure, Huffman entropy coding, quantization, zigzag order and
the 8x8 DCT; the JFIF spec (ECMA TR/98) defines the YCbCr color space
and the APP0 header. This module implements exactly that, the same way
``functions/png.py`` implements the PNG spec, so
``operators/multimodal.py`` can offer a real ``decoder="jpeg"`` path.
The reference only ever stores a media *pointer* (`CommonsMedia(String)`,
/root/reference/src/utils/tables.rs:18-21); real Commons corpora are
JPEG-dominant, which is why the decode extension needs this codec.

Scope (documented, raises beyond it):
- decode: baseline + extended sequential DCT (SOF0/SOF1) AND
  progressive DCT (SOF2, T.81 Annex G: spectral selection +
  successive approximation, EOB-run coding, multi-scan,
  non-interleaved scan geometry), Huffman entropy coding, 8-bit
  precision, grayscale or 3-component YCbCr, sampling factors up to
  2x2 (4:4:4 / 4:2:2 / 4:2:0), restart markers, multi-table DQT/DHT
  segments. Arithmetic coding and hierarchical modes raise JpegError.
- encode: baseline sequential (Annex K standard Huffman tables) via
  :func:`encode_jpeg`, or progressive via
  :func:`encode_jpeg_progressive` (libjpeg-style scan script, flat
  stream-supplied AC tables); Annex K quantization scaled by the
  usual libjpeg-style quality formula; grayscale or RGB input.
- Huffman/quantization tables are always read FROM THE STREAM when
  decoding, so files produced by other encoders (different tables)
  decode correctly; the Annex K tables here are only encoder defaults.

Memory safety mirrors ``png.py``: image dimensions are rejected above a
configurable pixel cap BEFORE any plane allocation, and every truncation
path raises JpegError (never struct.error / IndexError) so an
Arrow-batched worker can NULL-flag a corrupt asset instead of dying.

The DCT/IDCT run vectorized over all blocks of a component via numpy —
inside mapInPandas workers this is the difference between microseconds
and milliseconds per image. JPEG is lossy: goldens pin decoded output
of THIS codec build; cross-engine oracles only ever check header-level
metadata (dimensions), which IS exact.
"""

from __future__ import annotations

import struct

MAX_PIXELS = 1 << 26  # same default cap as functions/png.py


class JpegError(ValueError):
    """Malformed or out-of-scope JPEG stream."""


# --- T.81 Annex K reference tables (public spec data) -----------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# (bits[1..16], values) per Annex K
DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix():
    import numpy as np

    # orthonormal DCT-II basis: C[u, x] = a(u) cos((2x+1)u pi / 16)
    x = np.arange(8)
    C = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    C[0, :] /= np.sqrt(2.0)
    return C


def _canonical_codes(bits: list[int], values: list[int]) -> dict:
    """T.81 C.2: canonical Huffman code assignment. Returns
    {value: (code, length)} for encoding."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> tuple:
    """Decoding table: ``(codes, lut8)`` where ``codes`` maps
    ``(length, code) -> value`` (the canonical assignment, used for
    codes longer than 8 bits) and ``lut8`` is a 256-entry first-byte
    lookup — every 8-bit prefix of a code of length <= 8 resolves the
    symbol AND its length in one indexed read, which is where the vast
    majority of real Huffman decodes land (Annex K tables put all
    common symbols at <= 8 bits). The LUT turns the per-symbol cost
    from up-to-16 Python bit reads into one."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    lut8 = [None] * 256
    for (length, code), value in codes.items():
        if length <= 8:
            base = code << (8 - length)
            for pad in range(1 << (8 - length)):
                lut8[base | pad] = (value, length)
    return codes, lut8


def _quality_scale(table: list[int], quality: int) -> list[int]:
    # the well-known libjpeg quality mapping (public knowledge)
    if not 1 <= quality <= 100:
        raise JpegError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(255, max(1, (t * scale + 50) // 100)) for t in table]


# --- bit I/O ----------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; leaves the
    cursor on any non-RST marker it encounters. Reads are batched: the
    accumulator is topped up a byte at a time and multi-bit reads are
    one shift+mask, not a Python loop per bit."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # set when a non-stuffing marker is hit

    def _try_fill(self) -> bool:
        """Append one data byte to the accumulator; False (without
        consuming) when the next bytes are a marker or the buffer end."""
        if self.pos >= len(self.buf):
            return False
        b = self.buf[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.buf):
                return False
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:  # stuffed 0xFF data byte
                self.pos += 2
            else:
                self.marker = nxt
                return False
        else:
            self.pos += 1
        # drop already-consumed high bits so acc stays machine-int sized
        # over arbitrarily long scans
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8
        return True

    def _raise_exhausted(self) -> None:
        # preserve the historical error messages per exhaustion cause
        if self.marker is not None:
            raise JpegError(f"marker 0x{self.marker:02x} inside entropy data")
        if self.pos < len(self.buf) and self.buf[self.pos] == 0xFF:
            raise JpegError("truncated at 0xFF")
        raise JpegError("truncated entropy-coded data")

    def _ensure(self, n: int) -> int:
        """Best-effort top-up to >= n buffered bits; returns what's
        actually available (less only at a marker / buffer end)."""
        while self.nbits < n and self._try_fill():
            pass
        return self.nbits

    def bit(self) -> int:
        if self.nbits == 0 and not self._try_fill():
            self._raise_exhausted()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self._ensure(n) < n:
            self._raise_exhausted()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def align_to_rst(self) -> None:
        """Consume padding + one RSTn marker (T.81 restart handling)."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.buf) and self.buf[self.pos] == 0xFF:
            m = self.buf[self.pos + 1]
            if 0xD0 <= m <= 0xD7:
                self.pos += 2
                return
            if m == 0x00:
                break
            raise JpegError(f"expected RST marker, found 0x{m:02x}")
        raise JpegError("expected RST marker")


def _huff_decode(br: _BitReader, table: tuple) -> int:
    codes, lut8 = table
    # fast path: resolve symbol + length from the next 8 bits in one
    # table read (covers every code of length <= 8 — the hot set)
    if br._ensure(8) >= 8:
        hit = lut8[(br.acc >> (br.nbits - 8)) & 0xFF]
        if hit is not None:
            br.nbits -= hit[1]
            return hit[0]
        # long code (9..16 bits): extend the known-unmatched 8-bit prefix
        code = (br.acc >> (br.nbits - 8)) & 0xFF
        br.nbits -= 8
        for length in range(9, 17):
            code = (code << 1) | br.bit()
            v = codes.get((length, code))
            if v is not None:
                return v
        raise JpegError("invalid Huffman code")
    # tail: fewer than 8 bits before a marker/end — bit-by-bit
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        v = codes.get((length, code))
        if v is not None:
            return v
    raise JpegError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    # T.81 F.2.2.1: map s low bits to the signed coefficient value
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    s = 0
    a = abs(v)
    while a:
        a >>= 1
        s += 1
    return s


# --- encoder ----------------------------------------------------------------


def _validate_encode_args(
    pixels, width: int, height: int, channels: int, subsampling: str
) -> None:
    if channels not in (1, 3):
        raise JpegError(f"channels must be 1 or 3, got {channels}")
    if subsampling not in ("444", "420"):
        raise JpegError(f"subsampling must be '444' or '420', got {subsampling!r}")
    if len(pixels) != width * height * channels:
        raise JpegError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{width * height * channels}"
        )
    if width < 1 or height < 1:
        raise JpegError("dimensions must be positive")
    if width > 65535 or height > 65535:
        # SOF stores dimensions as u16 — beyond that the format itself
        # cannot represent the image (struct.pack would die instead)
        raise JpegError(
            f"dimensions {width}x{height} exceed the JPEG u16 limit (65535)"
        )


def _prepare_planes(pixels, width, height, channels, subsampling):
    """Color-convert, chroma-subsample, and pad each component plane to
    its MCU block grid. Returns (comp_planes, sampling, mcux, mcuy)."""
    import numpy as np

    img = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    if channels == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [img[..., 0]]

    sampling = (
        [(2, 2), (1, 1), (1, 1)]
        if channels == 3 and subsampling == "420"
        else [(1, 1)] * channels
    )
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    comp_planes = []
    for (h, v), p in zip(sampling, planes):
        fy, fx = vmax // v, hmax // h
        if (fy, fx) != (1, 1):
            # 2x2 box-average chroma downsample (pad to even first)
            ph = -(-height // fy) * fy
            pw = -(-width // fx) * fx
            pp = np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge")
            p = pp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        # pad the (possibly downsampled) plane to its MCU block grid,
        # replicating the last row/column (standard edge extension)
        th, tw = mcuy * v * 8, mcux * h * 8
        p = np.pad(
            p,
            ((0, th - p.shape[0]), (0, tw - p.shape[1])),
            mode="edge",
        )
        comp_planes.append(p)
    return comp_planes, sampling, mcux, mcuy


def _coef_blocks(comp_planes, sampling, qtab_for, mcux, mcuy):
    """Quantized DCT coefficients for every block of every component, in
    ZIGZAG order: a list of int ``(bh*bw, 64)`` arrays (block raster
    order over the padded plane). Per-block math is kept IDENTICAL to
    the historical emit loop (same op order) so baseline output bytes
    are unchanged by the refactor."""
    import numpy as np

    C = _dct_matrix()
    out = []
    for ci, ((h, v), plane) in enumerate(zip(sampling, comp_planes)):
        bw_, bh_ = mcux * h, mcuy * v
        q = np.asarray(qtab_for(ci), dtype=np.float64).reshape(8, 8)
        blocks = np.empty((bh_ * bw_, 64), dtype=np.int64)
        for by in range(bh_):
            for bx in range(bw_):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = C @ (block - 128.0) @ C.T
                quant = np.round(coef / q).astype(np.int64)
                blocks[by * bw_ + bx] = quant.flat[ZIGZAG]
        out.append(blocks)
    return out


def encode_jpeg(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode 8-bit samples to a baseline JFIF JPEG (Annex K Huffman
    tables, quality-scaled Annex K quantization). ``channels`` 1 ->
    grayscale, 3 -> RGB; ``subsampling`` "444" (no chroma subsampling)
    or "420" (2x2 box-averaged chroma — what real corpora mostly use);
    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker
    every that many MCUs (what real encoders do for error resilience —
    and what exercises the decoder's restart path).
    Deterministic for a given input."""
    _validate_encode_args(pixels, width, height, channels, subsampling)
    q_luma = _quality_scale(QUANT_LUMA, quality)
    q_chroma = _quality_scale(QUANT_CHROMA, quality)
    qtabs = [q_luma] + ([q_chroma] if channels == 3 else [])
    enc_dc = [_canonical_codes(*DC_LUMA)] + (
        [_canonical_codes(*DC_CHROMA)] if channels == 3 else []
    )
    enc_ac = [_canonical_codes(*AC_LUMA)] + (
        [_canonical_codes(*AC_CHROMA)] if channels == 3 else []
    )

    comp_planes, sampling, mcux, mcuy = _prepare_planes(
        pixels, width, height, channels, subsampling
    )
    coefs = _coef_blocks(
        comp_planes, sampling, lambda ci: qtabs[0 if ci == 0 else 1], mcux, mcuy
    )

    bw = _BitWriter()
    prev_dc = [0] * channels

    def emit_block(zz, ci: int) -> None:
        # one array->list conversion per block, symbol+value bits fused
        # into single writer calls (MSB-first concatenation: identical
        # bitstream to the historical two-call form)
        ti = 0 if ci == 0 else 1
        zzl = zz.tolist()
        dc = zzl[0]
        diff = dc - prev_dc[ci]
        prev_dc[ci] = dc
        s = _category(diff)
        code, ln = enc_dc[ti][s]
        if s:
            bw.write(
                (code << s) | ((diff if diff >= 0 else diff + (1 << s) - 1) & ((1 << s) - 1)),
                ln + s,
            )
        else:
            bw.write(code, ln)
        ac = enc_ac[ti]
        run = 0
        for k in range(1, 64):
            v = zzl[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac[(run << 4) | s]
            bw.write(
                (code << s) | ((v if v >= 0 else v + (1 << s) - 1) & ((1 << s) - 1)),
                ln + s,
            )
            run = 0
        if run:
            code, ln = ac[0x00]  # EOB
            bw.write(code, ln)

    mcu_index = 0
    rst_n = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                # byte-align (1-padded), emit RSTn raw (markers are never
                # byte-stuffed), reset DC predictors — T.81 restart rules
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst_n % 8)])
                rst_n += 1
                prev_dc[:] = [0] * channels
            for ci in range(channels):
                h, v = sampling[ci]
                bw_blocks = mcux * h
                for by in range(v):
                    for bx in range(h):
                        idx = (my * v + by) * bw_blocks + (mx * h + bx)
                        emit_block(coefs[ci][idx], ci)
            mcu_index += 1
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, qt in enumerate(qtabs):
        # DQT stores the table in zigzag scan order
        zzq = bytes(qt[ZIGZAG[i]] for i in range(64))
        out += seg(0xDB, bytes([ti]) + zzq)
    comp_specs = b""
    for ci in range(channels):
        h, v = sampling[ci]
        comp_specs += bytes([ci + 1, (h << 4) | v, 0 if ci == 0 else 1])
    out += seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, channels) + comp_specs,
    )
    tables = [(0x00, DC_LUMA), (0x10, AC_LUMA)]
    if channels == 3:
        tables += [(0x01, DC_CHROMA), (0x11, AC_CHROMA)]
    for tclass, (bits, vals) in tables:
        out += seg(0xC4, bytes([tclass]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos_comps = b""
    for ci in range(channels):
        sos_comps += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += seg(0xDA, bytes([channels]) + sos_comps + b"\x00\x3f\x00")
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder ----------------------------------------------------

# Flat Huffman table for progressive AC scans: 128 symbols at 8 bits +
# 128 at 9 (Kraft sum 0.75, all-ones code unused — both T.81 table
# constraints hold). Progressive AC coding needs the EOBn symbols
# (r<<4 | 0, r=1..14) that the Annex K baseline tables do not define;
# a complete table keeps the encoder simple and — since tables are
# always read FROM THE STREAM — exercises the decoder's foreign-table
# path on every progressive fixture.
AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 128, 128, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)

# libjpeg-style default scan scripts: (component ids, Ss, Se, Ah, Al).
# DC first with one bit of successive approximation, AC spectral bands
# at Al=2/1 with two refinement passes, DC refinement last — together
# they exercise every progressive scan type the decoder implements.
_PROG_SCANS_GRAY = (
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0,), 1, 63, 1, 0),
    ((0,), 0, 0, 1, 0),
)
_PROG_SCANS_COLOR = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0,), 1, 63, 2, 1),
    ((0, 1, 2), 0, 0, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
    ((0,), 1, 63, 1, 0),
)


class _ProgScanWriter:
    """Entropy writer for one progressive scan: wraps _BitWriter with the
    EOB-run and correction-bit buffering T.81 G.1.2 requires."""

    def __init__(self, enc_dc, enc_ac):
        self.bw = _BitWriter()
        self.enc_dc = enc_dc
        self.enc_ac = enc_ac
        self.eobrun = 0
        self.pending_bits: list[int] = []  # corrections owed after EOBn

    def sym_dc(self, ti, s):
        code, ln = self.enc_dc[ti][s]
        self.bw.write(code, ln)

    def sym_ac(self, ti, s):
        code, ln = self.enc_ac[ti][s]
        self.bw.write(code, ln)

    def flush_eobrun(self, ti):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.sym_ac(ti, r << 4)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending_bits:
            self.bw.write(b, 1)
        self.pending_bits = []

    def dc_first(self, ti, zz, pred, ci, al):
        val = int(zz[0]) >> al  # DC point transform is an arithmetic shift
        diff = val - pred[ci]
        pred[ci] = val
        s = _category(diff)
        self.sym_dc(ti, s)
        if s:
            self.bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)

    def dc_refine(self, zz, al):
        self.bw.write((int(zz[0]) >> al) & 1, 1)

    def ac_first(self, ti, pos, tv, sg, band_len):
        """AC first scan for one block, given the precomputed nonzero
        structure (``pos``/``tv``/``sg`` from :func:`_scan_nonzeros`,
        computed vectorized over the WHOLE component — the per-block
        path is pure-list iteration over the typically-few nonzeros).
        Symbol and value bits are fused into one writer call (MSB-first
        concatenation is associative: identical bitstream)."""
        if not pos:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun(ti)
            return
        self.flush_eobrun(ti)
        enc = self.enc_ac[ti]
        w = self.bw.write
        prev = -1
        for j, i in enumerate(pos):
            run = i - prev - 1
            prev = i
            while run > 15:
                c, ln = enc[0xF0]
                w(c, ln)
                run -= 16
            t = tv[j]
            s = t.bit_length()
            v = t if sg[j] else -t
            c, ln = enc[(run << 4) | s]
            w((c << s) | ((v if v >= 0 else v + (1 << s) - 1) & ((1 << s) - 1)), ln + s)
        if prev < band_len - 1:  # trailing zeros end the block early
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun(ti)

    def ac_refine(self, ti, pos, tv, sg, band_len):
        if not pos:
            # all zero-history: pure EOB block, no correction bits
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun(ti)
            return
        enc = self.enc_ac[ti]
        w = self.bw.write
        eob_rel = -1
        for j in range(len(pos) - 1, -1, -1):
            if tv[j] == 1:
                eob_rel = pos[j]
                break
        run = 0
        br_bits: list[int] = []  # corrections within the current run
        prev = -1
        for j, i in enumerate(pos):
            run += i - prev - 1  # zero-history positions skipped over
            prev = i
            t = tv[j]
            while run > 15 and i <= eob_rel:
                self.flush_eobrun(ti)
                c, ln = enc[0xF0]
                w(c, ln)
                run -= 16
                for b in br_bits:
                    w(b, 1)
                br_bits = []
            if t > 1:
                # already nonzero at the previous precision: one
                # correction bit, run of zero-history coeffs continues
                br_bits.append(t & 1)
                continue
            # newly nonzero at this precision: fuse symbol + sign bit
            self.flush_eobrun(ti)
            c, ln = enc[(run << 4) | 1]
            w((c << 1) | (1 if sg[j] else 0), ln + 1)
            for b in br_bits:
                w(b, 1)
            br_bits = []
            run = 0
        run += (band_len - 1) - prev  # trailing zero-history positions
        if run > 0 or br_bits:
            self.eobrun += 1
            self.pending_bits.extend(br_bits)
            if self.eobrun == 0x7FFF:
                self.flush_eobrun(ti)


def encode_jpeg_progressive(
    pixels: bytes,
    width: int,
    height: int,
    channels: int = 1,
    quality: int = 75,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode a PROGRESSIVE (SOF2) JFIF JPEG: spectral selection +
    successive approximation per T.81 Annex G, with a libjpeg-style
    scan script (DC successive approximation, split AC bands, two AC
    refinement passes). The quantized coefficients are byte-for-byte
    the ones :func:`encode_jpeg` computes, so
    ``decode_jpeg(encode_jpeg_progressive(px)) ==
    decode_jpeg(encode_jpeg(px))`` exactly — the round-trip test the
    decoder's progressive paths are pinned by. ``restart_interval``
    emits RSTn markers inside every scan (resetting DC predictors and
    EOB runs, as the spec requires)."""
    _validate_encode_args(pixels, width, height, channels, subsampling)
    q_luma = _quality_scale(QUANT_LUMA, quality)
    q_chroma = _quality_scale(QUANT_CHROMA, quality)
    qtabs = [q_luma] + ([q_chroma] if channels == 3 else [])
    enc_dc = [_canonical_codes(*DC_LUMA)] + (
        [_canonical_codes(*DC_CHROMA)] if channels == 3 else []
    )
    enc_ac = [_canonical_codes(*AC_PROG), _canonical_codes(*AC_PROG)]

    comp_planes, sampling, mcux, mcuy = _prepare_planes(
        pixels, width, height, channels, subsampling
    )
    coefs = _coef_blocks(
        comp_planes, sampling, lambda ci: qtabs[0 if ci == 0 else 1], mcux, mcuy
    )
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    # per-component block geometry: full padded grid (interleaved scans)
    # and the visible-sample grid (non-interleaved AC scans cover only
    # ceil(ceil(dim * f / fmax) / 8) blocks — T.81 A.2.2/B.2.3)
    geom = []
    for h, v in sampling:
        bw_ = mcux * h
        nbw = (-(-width * h // hmax) + 7) // 8
        nbh = (-(-height * v // vmax) + 7) // 8
        geom.append({"bw": bw_, "nbw": nbw, "nbh": nbh})

    scans = _PROG_SCANS_GRAY if channels == 1 else _PROG_SCANS_COLOR

    def encode_scan(comp_ids, ss, se, ah, al) -> bytes:
        w = _ProgScanWriter(enc_dc, enc_ac)
        pred = [0] * channels
        rst_n = 0
        n_units = 0

        ac_pre = None
        if ss > 0:
            # Precompute the point-transformed nonzero structure for the
            # WHOLE component in one vectorized pass; per-block encoding
            # then iterates plain Python lists of the few nonzeros.
            import numpy as np

            band = coefs[comp_ids[0]][:, ss : se + 1]
            tmat = np.abs(band) >> al
            rows, cols = np.nonzero(tmat)
            starts = np.searchsorted(
                rows, np.arange(band.shape[0] + 1)
            ).tolist()
            ac_pre = (
                starts,
                cols.tolist(),
                tmat[rows, cols].tolist(),
                (band[rows, cols] >= 0).tolist(),
                se - ss + 1,
            )

        def maybe_restart():
            nonlocal rst_n
            if restart_interval and n_units and n_units % restart_interval == 0:
                # flush EOB run + pad, raw RSTn, reset predictors/EOB state
                w.flush_eobrun(0 if comp_ids[0] == 0 else 1)
                w.bw.flush()
                w.bw.out += bytes([0xFF, 0xD0 + (rst_n % 8)])
                rst_n += 1
                pred[:] = [0] * channels

        def do_block(ci, idx):
            ti = 0 if ci == 0 else 1
            if ss == 0:
                zz = coefs[ci][idx]
                if ah == 0:
                    w.dc_first(ti, zz, pred, ci, al)
                else:
                    w.dc_refine(zz, al)
            else:
                starts, pos_a, tv_a, sg_a, blen = ac_pre
                s0, s1 = starts[idx], starts[idx + 1]
                if ah == 0:
                    w.ac_first(ti, pos_a[s0:s1], tv_a[s0:s1], sg_a[s0:s1], blen)
                else:
                    w.ac_refine(ti, pos_a[s0:s1], tv_a[s0:s1], sg_a[s0:s1], blen)

        if len(comp_ids) > 1:  # interleaved (DC scans only)
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for ci in comp_ids:
                        h, v = sampling[ci]
                        for by in range(v):
                            for bx in range(h):
                                idx = (my * v + by) * geom[ci]["bw"] + (
                                    mx * h + bx
                                )
                                do_block(ci, idx)
                    n_units += 1
        else:
            ci = comp_ids[0]
            g = geom[ci]
            for by in range(g["nbh"]):
                for bx in range(g["nbw"]):
                    maybe_restart()
                    do_block(ci, by * g["bw"] + bx)
                    n_units += 1
        w.flush_eobrun(0 if comp_ids[0] == 0 else 1)
        w.bw.flush()
        return bytes(w.bw.out)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, qt in enumerate(qtabs):
        zzq = bytes(qt[ZIGZAG[i]] for i in range(64))
        out += seg(0xDB, bytes([ti]) + zzq)
    comp_specs = b""
    for ci in range(channels):
        h, v = sampling[ci]
        comp_specs += bytes([ci + 1, (h << 4) | v, 0 if ci == 0 else 1])
    out += seg(
        0xC2,  # SOF2: progressive DCT, Huffman
        struct.pack(">BHHB", 8, height, width, channels) + comp_specs,
    )
    tables = [(0x00, DC_LUMA), (0x10, AC_PROG)]
    if channels == 3:
        tables += [(0x01, DC_CHROMA), (0x11, AC_PROG)]
    for tclass, (bits, vals) in tables:
        out += seg(0xC4, bytes([tclass]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for comp_ids, ss, se, ah, al in scans:
        if channels == 1 and comp_ids != (0,):
            continue
        sos_comps = b""
        for ci in comp_ids:
            dc_id = 0 if ci == 0 else 1
            ac_id = 0 if ci == 0 else 1
            sos_comps += bytes([ci + 1, (dc_id << 4) | ac_id])
        out += seg(
            0xDA,
            bytes([len(comp_ids)])
            + sos_comps
            + bytes([ss, se, (ah << 4) | al]),
        )
        out += encode_scan(comp_ids, ss, se, ah, al)
    out += b"\xff\xd9"
    return bytes(out)


# --- decoder ----------------------------------------------------------------


def jpeg_dimensions(buf: bytes) -> dict:
    """Header-only parse: {'width', 'height', 'components', 'precision',
    'progressive'} from the first SOF marker. Cheap (no entropy decode);
    works for progressive files too."""
    if len(buf) < 2 or buf[0:2] != b"\xff\xd8":
        raise JpegError("not a JPEG: missing SOI")
    pos = 2
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        (length,) = struct.unpack(">H", buf[pos + 2 : pos + 4])
        if pos + 2 + length > len(buf):
            raise JpegError(f"truncated segment 0x{marker:02x}")
        if marker in (0xC0, 0xC1, 0xC2):
            data = buf[pos + 4 : pos + 2 + length]
            if len(data) < 6:
                raise JpegError("truncated SOF")
            precision, height, width, ncomp = struct.unpack(">BHHB", data[:6])
            return {
                "width": width,
                "height": height,
                "components": ncomp,
                "precision": precision,
                "progressive": marker == 0xC2,
            }
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0x{marker:02x}")
        pos += 2 + length
    raise JpegError("no SOF marker found")


def _dec_block_full(br: _BitReader, dc_tab: dict, ac_tab: dict, pred: int, zz) -> int:
    """Baseline full-band block: DC diff + AC run-length (T.81 F.2.2)."""
    s = _huff_decode(br, dc_tab)
    if s > 11:
        raise JpegError(f"invalid DC category {s}")
    diff = _extend(br.bits(s), s) if s else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("AC run past block end")
        zz[k] = _extend(br.bits(s), s)
        k += 1
    return pred


def _dec_dc_first(br: _BitReader, dc_tab: dict, pred: int, zz, al: int) -> int:
    """Progressive DC first scan (T.81 G.2): baseline DC diff coding of
    the point-transformed value, stored shifted up by Al."""
    s = _huff_decode(br, dc_tab)
    if s > 11:
        raise JpegError(f"invalid DC category {s}")
    diff = _extend(br.bits(s), s) if s else 0
    pred += diff
    zz[0] = pred << al
    return pred


def _dec_dc_refine(br: _BitReader, zz, al: int) -> None:
    """Progressive DC refinement: one bit per block, ORed into bit Al
    (two's-complement OR — correct for negative coefficients too)."""
    if br.bit():
        zz[0] = int(zz[0]) | (1 << al)


def _dec_ac_first(
    br: _BitReader, ac_tab: dict, zz, ss: int, se: int, al: int, eobrun: int
) -> int:
    """Progressive AC first scan (T.81 G.1.2.2): run-length coding of
    point-transformed coefficients within the band, with EOBn run codes
    spanning whole blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.bits(r)
                return eobrun - 1  # current block consumed
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise JpegError("AC run past band end")
        zz[k] = _extend(br.bits(s), s) << al
        k += 1
    return 0


def _dec_ac_refine(
    br: _BitReader, ac_tab: dict, zz, ss: int, se: int, al: int, eobrun: int
) -> int:
    """Progressive AC refinement scan (T.81 G.1.2.3): corrections for
    already-nonzero coefficients ride along as raw bits while newly
    nonzero ones are placed by zero-history run counts."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(kk: int) -> None:
        coef = int(zz[kk])
        if coef != 0 and br.bit() and (coef & p1) == 0:
            zz[kk] = coef + (p1 if coef >= 0 else m1)

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(br, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break  # rest of the block joins the EOB sweep below
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise JpegError("invalid AC refinement magnitude")
                newval = p1 if br.bit() else m1
            # advance: corrections at nonzero-history positions, run
            # count consumed at zero-history ones
            while k <= se:
                coef = int(zz[k])
                if coef != 0:
                    if br.bit() and (coef & p1) == 0:
                        zz[k] = coef + (p1 if coef >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    # EOB region: every remaining nonzero coefficient gets a correction
    for kk in range(k, se + 1):
        correct(kk)
    if eobrun > 0:
        eobrun -= 1
    return eobrun


def _decode_scan(
    buf: bytes,
    pos: int,
    scan_comps: list,
    htables: dict,
    ss: int,
    se: int,
    ah: int,
    al: int,
    restart_interval: int,
    progressive: bool,
    mcux: int,
    mcuy: int,
) -> int:
    """Decode one scan's entropy-coded data (baseline or any of the four
    progressive scan types), updating each component's coefficient
    array in place. Returns the buffer position after the scan data.

    Interleaved scans walk the MCU grid; single-component scans walk
    the component's visible-sample block grid (T.81 A.2.2) in raster
    order. Restart markers reset DC predictors and the EOB run."""
    br = _BitReader(buf, pos)
    preds = [0] * len(scan_comps)
    eobrun = 0
    n_units = 0
    state = {"eobrun": 0}

    def tables_for(c):
        dc_tab = htables.get((0, c.get("dc", 0)))
        ac_tab = htables.get((1, c.get("ac", 0)))
        return dc_tab, ac_tab

    def do_block(i: int, c: dict, idx: int) -> None:
        zz = c["coef"][idx]
        dc_tab, ac_tab = tables_for(c)
        if not progressive:
            if dc_tab is None or ac_tab is None:
                raise JpegError("missing Huffman table for scan")
            preds[i] = _dec_block_full(br, dc_tab, ac_tab, preds[i], zz)
        elif ss == 0:
            if ah == 0:
                if dc_tab is None:
                    raise JpegError("missing DC Huffman table for scan")
                preds[i] = _dec_dc_first(br, dc_tab, preds[i], zz, al)
            else:
                _dec_dc_refine(br, zz, al)
        else:
            if ac_tab is None:
                raise JpegError("missing AC Huffman table for scan")
            if ah == 0:
                state["eobrun"] = _dec_ac_first(
                    br, ac_tab, zz, ss, se, al, state["eobrun"]
                )
            else:
                state["eobrun"] = _dec_ac_refine(
                    br, ac_tab, zz, ss, se, al, state["eobrun"]
                )

    def check_restart() -> None:
        if restart_interval and n_units and n_units % restart_interval == 0:
            br.align_to_rst()
            for i in range(len(preds)):
                preds[i] = 0
            state["eobrun"] = 0

    if len(scan_comps) > 1:  # interleaved: MCU order
        for my in range(mcuy):
            for mx in range(mcux):
                check_restart()
                for i, c in enumerate(scan_comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            idx = (my * c["v"] + by) * c["bw"] + (
                                mx * c["h"] + bx
                            )
                            do_block(i, c, idx)
                n_units += 1
    else:  # single component: visible-sample block grid, raster order
        c = scan_comps[0]
        for by in range(c["nbh"]):
            for bx in range(c["nbw"]):
                check_restart()
                do_block(0, c, by * c["bw"] + bx)
                n_units += 1
    return br.pos


def decode_jpeg(buf: bytes, max_pixels: int = MAX_PIXELS) -> dict:
    """Decode a baseline, extended-sequential, or PROGRESSIVE Huffman
    JPEG (SOF0/SOF1/SOF2) — multi-scan, spectral selection, successive
    approximation, restart markers, non-interleaved scans.

    Returns ``{"width", "height", "bit_depth", "channels", "pixels"}``
    like :func:`..png.decode_png` — 8-bit samples, row-major
    (y, x, channel); 3-component YCbCr is converted to RGB (JFIF
    full-range formula), grayscale stays 1-channel.
    """
    import numpy as np

    if len(buf) < 2 or buf[0:2] != b"\xff\xd8":
        raise JpegError("not a JPEG: missing SOI")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    sof = None
    comps = None
    progressive = False
    restart_interval = 0
    mcux = mcuy = hmax = vmax = 0
    n_scans = 0

    while True:
        if pos + 2 > len(buf):
            raise JpegError("truncated before EOI")
        if buf[pos] != 0xFF:
            raise JpegError(f"expected marker at {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 2 > len(buf):
            raise JpegError("truncated segment header")
        (length,) = struct.unpack(">H", buf[pos : pos + 2])
        data = buf[pos + 2 : pos + length]
        if len(data) != length - 2:
            raise JpegError(f"truncated segment 0x{marker:02x}")
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0x0F
                i += 1
                n = 64 * (2 if pq == 1 else 1)
                if i + n > len(data):
                    raise JpegError("truncated DQT")
                if pq == 1:
                    vals = list(
                        struct.unpack(f">{64}H", data[i : i + 128])
                    )
                else:
                    vals = list(data[i : i + 64])
                # stored zigzag -> natural order
                nat = [0] * 64
                for k in range(64):
                    nat[ZIGZAG[k]] = vals[k]
                qtables[tq] = nat
                i += n
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 0x0F
                i += 1
                if i + 16 > len(data):
                    raise JpegError("truncated DHT")
                bits = list(data[i : i + 16])
                i += 16
                nvals = sum(bits)
                if i + nvals > len(data):
                    raise JpegError("truncated DHT values")
                vals = list(data[i : i + nvals])
                i += nvals
                htables[(tc, th)] = _decode_table(bits, vals)
        elif marker in (0xC0, 0xC1, 0xC2):
            if len(data) < 6:
                raise JpegError("truncated SOF header")
            precision, height, width, ncomp = struct.unpack(">BHHB", data[:6])
            if len(data) < 6 + 3 * ncomp:
                raise JpegError("truncated SOF component list")
            if precision != 8:
                raise JpegError(f"unsupported precision {precision}")
            if ncomp not in (1, 3):
                raise JpegError(f"unsupported component count {ncomp}")
            if width == 0 or height == 0:
                raise JpegError("zero-dimension image")
            if width * height > max_pixels:
                raise JpegError(
                    f"image is {width}x{height} px, cap is {max_pixels}"
                )
            progressive = marker == 0xC2
            comps = []
            for c in range(ncomp):
                cid, hv, tq = data[6 + 3 * c : 9 + 3 * c]
                h, v = hv >> 4, hv & 0x0F
                if not (1 <= h <= 2 and 1 <= v <= 2):
                    raise JpegError(f"unsupported sampling factors {h}x{v}")
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
            sof = (width, height, ncomp)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                c["bw"] = mcux * c["h"]  # blocks across the padded plane
                c["bh"] = mcuy * c["v"]
                # visible-sample block grid (non-interleaved scans)
                c["nbw"] = (-(-width * c["h"] // hmax) + 7) // 8
                c["nbh"] = (-(-height * c["v"] // vmax) + 7) // 8
                c["coef"] = np.zeros((c["bw"] * c["bh"], 64), dtype=np.int32)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError(f"unsupported SOF marker 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            if len(data) < 2:
                raise JpegError("truncated DRI")
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise JpegError("SOS before SOF")
            if not data:
                raise JpegError("truncated SOS header")
            ns = data[0]
            # ns component specs (2 bytes each) + Ss/Se/AhAl trailer
            if len(data) < 1 + 2 * ns + 3:
                raise JpegError("truncated SOS component list")
            if not 1 <= ns <= len(comps):
                raise JpegError(f"invalid scan component count {ns}")
            by_id = {c["id"]: c for c in comps}
            scan_comps = []
            for c in range(ns):
                cs, tt = data[1 + 2 * c], data[2 + 2 * c]
                comp = by_id.get(cs)
                if comp is None:
                    raise JpegError(f"unknown component {cs} in SOS")
                comp["dc"], comp["ac"] = tt >> 4, tt & 0x0F
                scan_comps.append(comp)
            s_s, s_e = data[1 + 2 * ns], data[2 + 2 * ns]
            ahal = data[3 + 2 * ns]
            ah, alo = ahal >> 4, ahal & 0x0F
            if progressive:
                if s_s == 0 and s_e != 0:
                    raise JpegError("progressive DC scan must have Se=0")
                if s_s > 0 and ns != 1:
                    raise JpegError("progressive AC scans are single-component")
                if s_s > s_e or s_e > 63 or ah > 13 or alo > 13:
                    raise JpegError("invalid spectral selection parameters")
                if ah and ah != alo + 1:
                    raise JpegError("successive approximation must step by 1 bit")
            else:
                if (s_s, s_e, ah, alo) != (0, 63, 0, 0):
                    raise JpegError("invalid baseline scan parameters")
            pos = _decode_scan(
                buf,
                pos + length,
                scan_comps,
                htables,
                s_s,
                s_e,
                ah,
                alo,
                restart_interval,
                progressive,
                mcux,
                mcuy,
            )
            n_scans += 1
            # the next marker follows the entropy data; tolerate stray
            # pad bytes some encoders leave before it
            while pos < len(buf) and buf[pos] != 0xFF:
                pos += 1
            continue
        pos += length

    if sof is None or n_scans == 0:
        raise JpegError("EOI before image data")

    width, height, ncomp = sof
    C = _dct_matrix()
    planes = []
    for c in comps:
        qt = qtables.get(c["tq"])
        if qt is None:
            raise JpegError(f"missing quantization table {c['tq']}")
        n = c["coef"].shape[0]
        zzm = c["coef"].astype(np.float64)
        qzz = np.asarray([qt[ZIGZAG[i]] for i in range(64)], dtype=np.float64)
        zzm *= qzz  # dequantize in zigzag order
        blocks = np.zeros((n, 64))
        blocks[:, ZIGZAG] = zzm  # un-zigzag to natural order
        blocks = blocks.reshape(n, 8, 8)
        sp = np.einsum("ij,njk,kl->nil", C.T, blocks, C) + 128.0
        sp = np.clip(np.round(sp), 0, 255).astype(np.uint8)
        plane = np.zeros((c["bh"] * 8, c["bw"] * 8), dtype=np.uint8)
        for i in range(n):
            byy, bxx = divmod(i, c["bw"])
            plane[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] = sp[i]
        planes.append(plane)

    # upsample to full resolution (pixel replication) and crop
    ys = np.arange(height)
    xs = np.arange(width)
    full = []
    for c, plane in zip(comps, planes):
        py = ys * c["v"] // vmax
        px = xs * c["h"] // hmax
        full.append(plane[np.ix_(py, px)].astype(np.float64))

    if ncomp == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
        out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        channels = 3
    else:
        out = full[0].astype(np.uint8)[..., None]
        channels = 1

    return {
        "width": width,
        "height": height,
        "bit_depth": 8,
        "channels": channels,
        "pixels": out.tobytes(),
    }
