"""Pure-stdlib PNG codec — the REAL compressed-raster path behind the
multimodal codec boundary (extensions/multimodal.py ``decode_media``).

The container ships no image library (PIL/libjpeg absent — probed and
documented every round), but PNG (ISO/IEC 15948 / the W3C PNG spec)
needs only two things this environment has: DEFLATE (stdlib ``zlib``,
battle-tested) and the five scanline filters (pure arithmetic,
implemented here over numpy). So unlike the JPEG/MP3/H.264 stubs —
whose entropy coders genuinely require the absent libraries — PNG gets
a full encode/decode/resize implementation with zero new dependencies:
an actual compressed codec, not a header parse.

Scope (asserted, not assumed): non-interlaced, bit depth 8, color
types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA). Palette (type 3),
16-bit depth, and Adam7 interlacing raise ValueError with the reason —
the same loud-refusal posture as the BMP variant checks. Chunk CRCs
are verified on decode (corrupt payloads fail loudly, never decode to
garbage); ancillary chunks are skipped per spec.

Decode cost model: one ``zlib.decompress`` per image (C speed), then
unfiltering. Rows filtered with None/Up are vectorized numpy; Sub is
a per-lane ``cumsum`` (mod-256 via uint8 overflow); Average/Paeth use
the spec's sequential recurrence along x (unavoidable — each byte
depends on the reconstructed previous byte) over numpy row buffers.
The encoder picks the per-row filter by the standard
minimum-sum-of-absolute-differences heuristic, so round-trip tests
exercise every unfilter branch through the PRODUCTION path, and
``mtime``-free determinism holds: same pixels → same bytes
(``zlib.compress`` level pinned).

Reference parity: the reference repo has no raster codec at all (its
sources are Postgres/Kafka/CSV — see SURVEY.md §2j); this implements
the multimodal north-star the build brief adds on top.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> channel count (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(recon: np.ndarray, prior: np.ndarray, bpp: int, ftype: int) -> np.ndarray:
    """Apply filter ``ftype`` to a reconstructed row (uint8 vectors;
    ``prior`` is the previous RECONSTRUCTED row, zeros for row 0).
    All five filters are closed-form in the forward direction, so this
    side vectorizes fully."""
    r = recon.astype(np.int16)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prior.astype(np.int16)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:  # Sub
        out = r - left
    elif ftype == 2:  # Up
        out = r - up
    elif ftype == 3:  # Average
        out = r - (left + up) // 2
    elif ftype == 4:  # Paeth
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
        out = r - pred
    else:
        raise ValueError(f"invalid PNG filter type {ftype}")
    return (out % 256).astype(np.uint8)


def _unfilter_row(filt: np.ndarray, prior: np.ndarray, bpp: int, ftype: int) -> np.ndarray:
    """Reconstruct one scanline (PNG spec §9: the inverse recurrences).
    None/Up are pure vector ops; Sub is a per-lane cumsum (uint8
    wraparound IS the mod-256 the spec wants); Average/Paeth recurse on
    the just-reconstructed left byte, so they walk x sequentially."""
    n = filt.shape[0]
    if ftype == 0:
        return filt.copy()
    if ftype == 2:  # Up
        return filt + prior  # uint8 wraparound == mod 256
    if ftype == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp]
        lanes = n // bpp + (1 if n % bpp else 0)
        padded = np.zeros(lanes * bpp, dtype=np.uint8)
        padded[:n] = filt
        out = np.cumsum(
            padded.reshape(lanes, bpp).astype(np.uint64), axis=0
        ).astype(np.uint8).reshape(-1)[:n]
        return out
    recon = np.empty(n, dtype=np.uint8)
    if ftype == 3:  # Average
        f = filt.astype(np.int32)
        pr = prior.astype(np.int32)
        for x in range(n):
            a = int(recon[x - bpp]) if x >= bpp else 0
            recon[x] = (f[x] + (a + pr[x]) // 2) % 256
        return recon
    if ftype == 4:  # Paeth
        f = filt.astype(np.int32)
        pr = prior.astype(np.int32)
        for x in range(n):
            a = int(recon[x - bpp]) if x >= bpp else 0
            c = int(prior[x - bpp]) if x >= bpp else 0
            recon[x] = (f[x] + _paeth(a, int(pr[x]), c)) % 256
        return recon
    raise ValueError(f"invalid PNG filter type {ftype}")


def encode_png(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Encode an (h, w) or (h, w, c) uint8 array as a valid PNG.
    ``filters`` pins one filter type per row (tests use this to build
    known-filter fixtures); default is the min-sum-of-absolute-
    differences heuristic real encoders use, which naturally emits a
    MIX of filter types. Deterministic: fixed zlib level, no
    timestamps, no ancillary chunks."""
    arr = np.ascontiguousarray(np.asarray(pixels, dtype=np.uint8))
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"unsupported pixel array shape {arr.shape}")
    h, w, c = arr.shape
    if h < 1 or w < 1:
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    bpp = c
    rows = arr.reshape(h, w * c)
    prior = np.zeros(w * c, dtype=np.uint8)
    out = bytearray()
    for y in range(h):
        recon = rows[y]
        if filters is not None:
            ftype = filters[y % len(filters)]
            best = _filter_row(recon, prior, bpp, ftype)
        else:
            ftype, best, best_score = 0, None, None
            for t in range(5):
                cand = _filter_row(recon, prior, bpp, t)
                # SAD heuristic: bytes as signed deltas, sum of |v|
                score = int(np.abs(cand.astype(np.int8)).sum())
                if best_score is None or score < best_score:
                    ftype, best, best_score = t, cand, score
        out.append(ftype)
        out.extend(best.tobytes())
        prior = recon
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    idat = zlib.compress(bytes(out), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _parse_chunks(payload: bytes):
    """Walk the chunk stream with CRC verification. Yields (tag, data).
    Truncation or a CRC mismatch is a loud ValueError — a corrupt
    image must never decode to silent garbage."""
    off = len(_SIG)
    while off < len(payload):
        if off + 8 > len(payload):
            raise ValueError("truncated PNG chunk header")
        (length,), tag = struct.unpack_from(">I", payload, off), payload[off + 4 : off + 8]
        data_end = off + 8 + length
        if data_end + 4 > len(payload):
            raise ValueError(f"truncated PNG chunk {tag!r}")
        data = payload[off + 8 : data_end]
        (crc,) = struct.unpack_from(">I", payload, data_end)
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        yield tag, data
        off = data_end + 4


def decode_png_header(payload: bytes) -> dict:
    """Header-only decode (width/height/channels) — the cheap metadata
    path feature extraction uses; validates signature + IHDR CRC but
    does not inflate the pixel stream."""
    if payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    for tag, data in _parse_chunks(payload):
        if tag != b"IHDR":
            raise ValueError("PNG first chunk is not IHDR")
        w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
        if depth != 8:
            raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
        if ctype not in _CHANNELS:
            raise ValueError(
                f"unsupported PNG color type {ctype} (palette/invalid)"
            )
        if comp != 0 or filt != 0:
            raise ValueError("invalid PNG compression/filter method")
        if interlace != 0:
            raise ValueError("Adam7-interlaced PNG not supported")
        if w < 1 or h < 1:
            raise ValueError(f"invalid PNG dimensions {w}x{h}")
        return {"width": w, "height": h, "n_channels": _CHANNELS[ctype]}
    raise ValueError("PNG has no IHDR chunk")


def decode_png(payload: bytes) -> np.ndarray:
    """Full decode to an (h, w, c) uint8 array: chunk walk (CRCs
    verified), concatenated-IDAT inflate, per-row unfilter."""
    hdr = decode_png_header(payload)
    w, h, c = hdr["width"], hdr["height"], hdr["n_channels"]
    idat = bytearray()
    saw_end = False
    for tag, data in _parse_chunks(payload):
        if tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            saw_end = True
            break
    if not saw_end:
        raise ValueError("PNG has no IEND chunk")
    if not idat:
        raise ValueError("PNG has no IDAT chunk")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    stride = w * c
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"PNG pixel stream length {len(raw)} != expected {h * (1 + stride)}"
        )
    flat = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        prior = _unfilter_row(flat[y, 1:], prior, c, int(flat[y, 0]))
        out[y] = prior
    return out.reshape(h, w, c)


def resize_png(payload: bytes, width: int, height: int) -> bytes:
    """Decode → vectorized nearest-neighbor gather (the same
    row/column index-table pattern as the BMP resize) → re-encode.
    Output is a valid PNG of the target dims with the source's
    channel count."""
    if width < 1 or height < 1:
        raise ValueError(f"invalid resize target {width}x{height}")
    px = decode_png(payload)
    src_h, src_w = px.shape[0], px.shape[1]
    sy = np.minimum(np.arange(height) * src_h // height, src_h - 1)
    sx = np.minimum(np.arange(width) * src_w // width, src_w - 1)
    return encode_png(px[sy][:, sx, :])
