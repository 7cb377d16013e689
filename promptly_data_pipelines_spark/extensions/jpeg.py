"""Pure-stdlib+numpy baseline JPEG codec — the second REAL compressed
raster path behind the multimodal codec boundary (after
extensions/png.py), covering the most common image format on the web.

The container ships no image library (PIL/libjpeg absent — probed and
documented every round), but baseline sequential JPEG (ITU-T T.81 /
ISO 10918-1) needs only arithmetic this environment has: an 8×8 DCT
(two numpy matrix multiplies against a precomputed orthonormal cosine
matrix), quantization tables, and canonical Huffman coding (pure
integer bit twiddling). So, like PNG in r10, JPEG gets a full
encode/decode implementation with zero new dependencies: a real lossy
transform codec, not a header parse.

Scope (asserted, not assumed):
- DECODE: baseline sequential DCT (SOF0), 8-bit precision, grayscale
  or 3-component YCbCr with sampling factors 1×1 (4:4:4), 2×1/1×2
  (4:2:2), and 2×2 (4:2:0 — the dominant web shape; chroma upsampled
  by replication), restart markers (DRI/RSTn) honored, APPn/COM
  skipped per spec. Progressive (SOF2), arithmetic coding (SOF9+),
  12-bit precision, and hierarchical modes raise ValueError with the
  reason — the same loud-refusal posture as the PNG/BMP variant
  checks. Truncated streams and invalid Huffman codes fail loudly,
  never decode to silent garbage.
- ENCODE: SOF0 grayscale or YCbCr at 4:4:4 or 4:2:0, Annex K example
  quantization tables scaled by the libjpeg quality formula, Annex K
  example Huffman tables, optional restart interval. Deterministic:
  same pixels + options → same bytes (no timestamps, fixed tables).

Cost model: the DCT/IDCT, color transforms, quantization, zigzag,
and up/downsampling are all whole-image vectorized numpy (blocks
reshaped to (n_blocks, 8, 8) and transformed in one einsum). Only the
entropy (Huffman) layer walks symbols in Python — inherent to a
variable-length bitstream, amortized per Arrow batch when driven from
mapInPandas like the PNG path.

Oracle design (how a LOSSY codec still gets a value-hash oracle): a
DC-only JPEG — every 8×8 block flat — has a closed-form round trip.
For a constant block of value v, the DCT is S₀₀ = 8·(v−128) with all
AC terms exactly zero; with luminance Q₀₀ = 16 at quality 50, any
even (v−128) makes 8·(v−128)/16 an exact integer, so dequantize +
IDCT reproduces v EXACTLY. multimodal's media_table_jpeg synthesizes
such flat-block images from doc_id and DuckDB recomputes the decoded
pixel sums in closed form (multimodal_jpeg_decode).

Reference parity: the reference repo has no raster codec at all (its
sources are Postgres/Kafka/CSV — SURVEY.md §2j); this implements the
multimodal north-star the build brief adds on top.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constant tables (ITU-T T.81 Annex K — the "typical" tables virtually
# every baseline encoder ships)
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Huffman table specs: (bits[1..16] code-length histogram, symbol list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# Orthonormal 8x8 DCT-II matrix with JPEG's scaling: block_dct = C @ X @ C.T
_C = np.zeros((8, 8))
for _u in range(8):
    _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _C[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def quality_scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg's quality→table scaling (the de-facto standard): scale =
    5000/q below 50 else 200−2q; entries clamped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError(f"JPEG quality {quality} outside [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for q in (QUANT_LUMA, QUANT_CHROMA):
        s = (q * scale + 50) // 100
        out.append(np.clip(s, 1, 255).astype(np.int64))
    return out[0], out[1]


def _huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman code assignment (T.81 Annex C): symbol ->
    (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Canonical Huffman decode tables (T.81 F.2.2.3): per-length
    (mincode, maxcode, valptr) walk — one comparison per bit."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            else:
                self.maxcode[length] = -1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if self.maxcode[length] >= code >= self.mincode[length]:
                return self.vals[self.valptr[length] + code - self.mincode[length]]
        raise ValueError("invalid JPEG Huffman code (corrupt entropy stream)")


class _BitWriter:
    """MSB-first bit accumulator with T.81 byte stuffing (0xFF → 0xFF
    0x00 inside the entropy-coded segment)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def byte_align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3)."""
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


class _BitReader:
    """MSB-first reader over the entropy-coded segment; un-stuffs
    0xFF00 and stops (loudly) at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                marker = self.data[self.pos]
                if marker == 0x00:
                    self.pos += 1  # stuffed 0xFF data byte
                else:
                    raise ValueError(
                        f"unexpected marker 0xFF{marker:02X} inside entropy stream"
                    )
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align_to_marker(self) -> int:
        """Discard pad bits, expect and consume a marker; returns the
        marker's second byte (used for RSTn)."""
        self.nbits = 0
        if self.pos + 1 >= len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("expected JPEG restart marker, found data")
        m = self.data[self.pos + 1]
        self.pos += 2
        return m


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the `size`-bit amplitude to its signed
    value."""
    if size and v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _category(v: int) -> int:
    """Bit size of |v| (0 for 0) — the DC/AC coefficient category."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Whole-image block transforms (vectorized)
# ---------------------------------------------------------------------------


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) multiple-of-8 plane → (n_blocks, 8, 8) in MCU raster
    order (row-major over the block grid)."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    )


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """Forward DCT on a (n, 8, 8) stack: C @ X @ Cᵀ via einsum."""
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C, optimize=True)


def _idct(blocks: np.ndarray) -> np.ndarray:
    """Inverse DCT: Cᵀ @ S @ C, i.e. x[x,y] = Σᵤᵥ C[u,x]·S[u,v]·C[v,y]."""
    return np.einsum("ux,nuv,vy->nxy", _C, blocks, _C, optimize=True)


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate to multiples of (mh, mw) — the standard encoder
    padding that avoids ringing at the right/bottom borders."""
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _encode_block_stream(
    writer: _BitWriter,
    coefs: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    """Entropy-encode one quantized block (natural order, int); returns
    the new DC predictor."""
    zz = coefs.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    size = _category(diff)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        amp = diff if diff > 0 else diff + (1 << size) - 1
        writer.write(amp, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if nz.size else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        amp = v if v > 0 else v + (1 << size) - 1
        writer.write(amp, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def _dqt_segment(tid: int, table: np.ndarray) -> bytes:
    payload = bytes([tid]) + bytes(int(x) for x in table.reshape(64)[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 75,
    subsample: bool | str = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3) RGB uint8 array as a
    baseline sequential JFIF JPEG. ``subsample`` picks the chroma
    layout: False/"444" (default), True/"420" (2×2 box-averaged
    chroma — the dominant web layout), or "422" (horizontal-only).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's resync path). Deterministic: fixed
    tables, no timestamps."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim not in (2, 3) or (arr.ndim == 3 and arr.shape[2] != 3):
        raise ValueError(f"unsupported pixel array shape {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    if h < 1 or w < 1:
        raise ValueError(f"invalid JPEG dimensions {w}x{h}")
    ql, qc = quality_scaled_tables(quality)
    gray = arr.ndim == 2
    mode = {False: "444", True: "420"}.get(subsample, subsample)
    if mode not in ("444", "420", "422"):
        raise ValueError(f"unsupported subsampling mode {subsample!r}")

    if gray:
        comps = [(1, 1, 0, _pad_edge(arr.astype(np.float64), 8, 8))]
    else:
        y, cb, cr = _rgb_to_ycbcr(arr)
        if mode == "420":
            # 2x2 box average on an edge-padded even grid
            ye = _pad_edge(y, 16, 16)
            down = lambda p: p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(  # noqa: E731
                axis=(1, 3)
            )
            comps = [
                (2, 2, 0, ye),
                (1, 1, 1, down(_pad_edge(cb, 16, 16))),
                (1, 1, 1, down(_pad_edge(cr, 16, 16))),
            ]
        elif mode == "422":
            ye = _pad_edge(y, 8, 16)
            down = lambda p: p.reshape(p.shape[0], p.shape[1] // 2, 2).mean(axis=2)  # noqa: E731
            comps = [
                (2, 1, 0, ye),
                (1, 1, 1, down(_pad_edge(cb, 8, 16))),
                (1, 1, 1, down(_pad_edge(cr, 8, 16))),
            ]
        else:
            comps = [
                (1, 1, 0, _pad_edge(y, 8, 8)),
                (1, 1, 1, _pad_edge(cb, 8, 8)),
                (1, 1, 1, _pad_edge(cr, 8, 8)),
            ]

    # quantized blocks per component, in that component's raster order
    quantized = []
    for _hi, _vi, tq, plane in comps:
        q = (ql if tq == 0 else qc).astype(np.float64)
        blocks = _to_blocks(plane) - 128.0
        coefs = np.round(_fdct(blocks) / q).astype(np.int64)
        quantized.append(coefs)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0])
    )
    out += _dqt_segment(0, ql)
    if not gray:
        out += _dqt_segment(1, qc)
    # SOF0
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (hi, vi, tq, _plane) in enumerate(comps):
        sof += bytes([ci + 1, (hi << 4) | vi, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if not gray:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        td_ta = 0 if ci == 0 else 0x11
        sos += bytes([ci + 1, td_ta])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _huffman_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huffman_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huffman_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (ncomp - 1)

    hmax = max(c[0] for c in comps)
    vmax = max(c[1] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    blocks_x = [comps[i][3].shape[1] // 8 for i in range(ncomp)]

    writer = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.byte_align()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
            for ci in range(ncomp):
                hi, vi = comps[ci][0], comps[ci][1]
                for by in range(vi):
                    for bx in range(hi):
                        bi = (my * vi + by) * blocks_x[ci] + (mx * hi + bx)
                        preds[ci] = _encode_block_stream(
                            writer, quantized[ci][bi], *tables[ci], preds[ci]
                        )
            mcu_count += 1
    writer.byte_align()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

_SOF_UNSUPPORTED = {
    0xC1: "extended sequential (SOF1)",
    0xC2: "progressive (SOF2)",
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _parse_segments(payload: bytes):
    """Walk marker segments up to (and including) SOS; yields
    (marker, segment_bytes, next_offset)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI marker)")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected JPEG marker at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI with no scan
            raise ValueError("JPEG has no SOS scan")
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        if length < 2 or pos + 2 + length > len(payload):
            raise ValueError(f"truncated JPEG segment 0xFF{marker:02X}")
        yield marker, payload[pos + 4 : pos + 2 + length], pos + 2 + length
        if marker == 0xDA:
            return
        pos += 2 + length
    raise ValueError("truncated JPEG (no SOS before end of data)")


def decode_jpeg_header(payload: bytes) -> dict:
    """Header-only decode (width/height/channels) — validates markers
    through SOF0 without entropy decoding."""
    for marker, seg, _nxt in _parse_segments(payload):
        if marker == 0xC0:
            precision, h, w = seg[0], *struct.unpack_from(">HH", seg, 1)
            ncomp = seg[5]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision} (only 8)")
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            if w < 1 or h < 1:
                raise ValueError(f"invalid JPEG dimensions {w}x{h}")
            return {"width": w, "height": h, "n_channels": 3 if ncomp == 3 else 1}
        if marker in _SOF_UNSUPPORTED:
            raise ValueError(f"unsupported JPEG mode: {_SOF_UNSUPPORTED[marker]}")
    raise ValueError("JPEG has no SOF0 frame header")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Full baseline decode to (h, w) gray or (h, w, 3) RGB uint8.
    Marker walk → Huffman entropy decode (restart-aware) → dequantize
    → IDCT (vectorized) → chroma upsample (replication) → color
    transform → crop."""
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    scan_comps = None
    scan_start = None
    for marker, seg, nxt in _parse_segments(payload):
        if marker == 0xDB:  # DQT — possibly several tables per segment
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("unsupported 16-bit JPEG quant table")
                if p + 65 > len(seg):
                    raise ValueError("truncated DQT segment")
                zz = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int64)
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT — possibly several tables
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT segment")
                htables[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0:
            precision, h, w = seg[0], *struct.unpack_from(">HH", seg, 1)
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision} (only 8)")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0xF
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"unsupported JPEG sampling factors {hi}x{vi} (only 1-2)"
                    )
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            if ncomp == 1:
                # T.81 A.2: a scan with ONE component is non-interleaved
                # — MCU = one data unit in plain raster order, sampling
                # factors ignored. Real-world grayscale files (libjpeg
                # gray output derived from 4:2:0 sources) declare 2x2
                # here; honoring it would block-permute the image
                # silently (r11 review finding). Forcing 1x1 makes the
                # layout math below collapse to exactly the
                # non-interleaved grid ceil(w/8) x ceil(h/8).
                comps[0]["h"] = comps[0]["v"] = 1
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in _SOF_UNSUPPORTED:
            raise ValueError(f"unsupported JPEG mode: {_SOF_UNSUPPORTED[marker]}")
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            scan_comps = []
            by_id = {c["id"]: c for c in frame["comps"]}
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si], seg[2 + 2 * si]
                if cs not in by_id:
                    raise ValueError(f"JPEG scan references unknown component {cs}")
                scan_comps.append((by_id[cs], tdta >> 4, tdta & 0xF))
            if len(scan_comps) != len(frame["comps"]):
                raise ValueError("multi-scan JPEG not supported (baseline only)")
            scan_start = nxt
    if frame is None or scan_comps is None:
        raise ValueError("JPEG has no SOF0 frame header")

    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component coefficient planes (block grids padded to the MCU)
    planes = []
    for c, _td, _ta in scan_comps:
        bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        planes.append(np.zeros((bw * bh, 8, 8), dtype=np.int64))

    reader = _BitReader(payload, scan_start)
    preds = [0] * len(scan_comps)
    expected_rst = 0
    for mcu in range(mcus_x * mcus_y):
        if restart_interval and mcu and mcu % restart_interval == 0:
            m = reader.byte_align_to_marker()
            if m != 0xD0 + expected_rst:
                raise ValueError(
                    f"JPEG restart marker out of sequence (got 0xFF{m:02X})"
                )
            expected_rst = (expected_rst + 1) % 8
            preds = [0] * len(scan_comps)
        my, mx = divmod(mcu, mcus_x)
        for ci, (c, td, ta) in enumerate(scan_comps):
            dc_tbl = htables.get((0, td))
            ac_tbl = htables.get((1, ta))
            if dc_tbl is None or ac_tbl is None:
                raise ValueError("JPEG scan references a missing Huffman table")
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    size = dc_tbl.decode(reader)
                    preds[ci] += _extend(reader.receive(size), size)
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = ac_tbl.decode(reader)
                        run, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if run == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("JPEG AC run past end of block")
                        zz[k] = _extend(reader.receive(size), size)
                        k += 1
                    bi = (my * c["v"] + by) * (mcus_x * c["h"]) + (mx * c["h"] + bx)
                    nat = np.empty(64, dtype=np.int64)
                    nat[ZIGZAG] = zz
                    planes[ci][bi] = nat.reshape(8, 8)

    # dequantize + IDCT + assemble, all vectorized per component
    out_planes = []
    for ci, (c, _td, _ta) in enumerate(scan_comps):
        q = qtables.get(c["tq"])
        if q is None:
            raise ValueError("JPEG component references a missing quant table")
        px = _idct(planes[ci].astype(np.float64) * q) + 128.0
        bw = mcus_x * c["h"] * 8
        bh = mcus_y * c["v"] * 8
        plane = _from_blocks(px, bh, bw)
        # replication upsample to the full MCU-padded luma grid
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(*out_planes)


def resize_jpeg(payload: bytes, width: int, height: int, quality: int = 75) -> bytes:
    """Decode → vectorized nearest-neighbor gather → re-encode (the
    same resize contract as the PNG/BMP paths)."""
    if width < 1 or height < 1:
        raise ValueError(f"invalid resize target {width}x{height}")
    px = decode_jpeg(payload)
    src_h, src_w = px.shape[0], px.shape[1]
    sy = np.minimum(np.arange(height) * src_h // height, src_h - 1)
    sx = np.minimum(np.arange(width) * src_w // width, src_w - 1)
    out = px[sy][:, sx] if px.ndim == 2 else px[sy][:, sx, :]
    return encode_jpeg(out, quality=quality)
