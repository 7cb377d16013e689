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
types 0 (gray), 2 (RGB), 3 (palette — PLTE-indexed, decoded by table
lookup to RGB; the most common color type on the real web), 4
(gray+alpha), 6 (RGBA). 16-bit depth, sub-byte palette depths, Adam7
interlacing, and palette transparency (tRNS) raise ValueError with
the reason — the same loud-refusal posture as the BMP variant checks.
Chunk CRCs are verified on decode (corrupt payloads fail loudly,
never decode to garbage); ancillary chunks are skipped per spec.

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

# color type -> DECODED channel count (bit depth 8 only); palette
# expands to RGB on decode, so its output channels (3) differ from its
# scanline samples-per-pixel (1, one index byte) — _SCANLINE_SAMPLES
_CHANNELS = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}
_SCANLINE_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
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


def _choose_filter(recon: np.ndarray, prior: np.ndarray, bpp: int):
    """Try all 5 scanline filters, return (ftype, filtered_row) with
    the minimum signed-SAD score — THE single definition (truecolor
    and palette encoders both call it; the int8 abs(-128) overflow fix
    lives only here). SAD: bytes as signed deltas, min(v, 256-v) ==
    |signed(v)| without the overflow (byte 128 scores 128)."""
    ftype, best, best_score = 0, None, None
    for t in range(5):
        cand = _filter_row(recon, prior, bpp, t)
        c16 = cand.astype(np.int16)
        score = int(np.minimum(c16, 256 - c16).sum())
        if best_score is None or score < best_score:
            ftype, best, best_score = t, cand, score
    return ftype, best


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
            ftype, best = _choose_filter(recon, prior, bpp)
        out.append(ftype)
        out.extend(best.tobytes())
        prior = recon
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    idat = zlib.compress(bytes(out), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def encode_png_palette(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 index array + (n<=256, 3) uint8 palette
    as a valid color-type-3 PNG (IHDR + PLTE + IDAT + IEND). Scanlines
    carry one index byte per pixel, filtered with the same min-SAD
    heuristic as :func:`encode_png` (bpp=1), so palette decode tests
    exercise every unfilter branch too. Deterministic like the
    truecolor encoder: pinned zlib level, no ancillary chunks."""
    idx = np.ascontiguousarray(np.asarray(indices, dtype=np.uint8))
    pal = np.ascontiguousarray(np.asarray(palette, dtype=np.uint8))
    if idx.ndim != 2:
        raise ValueError(f"palette indices must be (h, w), got shape {idx.shape}")
    if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= pal.shape[0] <= 256:
        raise ValueError(f"palette must be (1..256, 3), got shape {pal.shape}")
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError(
            f"palette index {int(idx.max())} out of range for {pal.shape[0]} entries"
        )
    h, w = idx.shape
    if h < 1 or w < 1:
        raise ValueError(f"invalid PNG dimensions {w}x{h}")
    prior = np.zeros(w, dtype=np.uint8)
    out = bytearray()
    for y in range(h):
        recon = idx[y]
        ftype, best = _choose_filter(recon, prior, 1)
        out.append(ftype)
        out.extend(best.tobytes())
        prior = recon
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    idat = zlib.compress(bytes(out), 6)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


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


def _parse_ihdr(payload: bytes) -> tuple[int, int, int]:
    """Validate signature + IHDR (CRC via the chunk walk) and return
    (width, height, color_type). Shared by the header-only path and
    the full decode (which also needs the color type for palette)."""
    if payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    for tag, data in _parse_chunks(payload):
        if tag != b"IHDR":
            raise ValueError("PNG first chunk is not IHDR")
        if len(data) != 13:
            raise ValueError(
                f"malformed IHDR chunk (length {len(data)}, expected 13)"
            )
        w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
        if ctype not in _CHANNELS:
            raise ValueError(f"unsupported PNG color type {ctype}")
        if depth != 8:
            raise ValueError(
                f"unsupported PNG bit depth {depth} (only 8"
                + ("; sub-byte palette depths not supported" if ctype == 3 else "")
                + ")"
            )
        if comp != 0 or filt != 0:
            raise ValueError("invalid PNG compression/filter method")
        if interlace != 0:
            raise ValueError("Adam7-interlaced PNG not supported")
        if w < 1 or h < 1:
            raise ValueError(f"invalid PNG dimensions {w}x{h}")
        return w, h, ctype
    raise ValueError("PNG has no IHDR chunk")


def decode_png_header(payload: bytes) -> dict:
    """Header-only decode (width/height/channels) — the cheap metadata
    path feature extraction uses; validates signature + IHDR CRC but
    does not inflate the pixel stream. For palette images n_channels
    is the DECODED channel count (3, post-lookup)."""
    w, h, ctype = _parse_ihdr(payload)
    return {"width": w, "height": h, "n_channels": _CHANNELS[ctype]}


def decode_png(payload: bytes) -> np.ndarray:
    """Full decode to an (h, w, c) uint8 array: chunk walk (CRCs
    verified), concatenated-IDAT inflate, per-row unfilter; palette
    (type 3) images additionally pass through the PLTE table lookup
    (one vectorized fancy-index) and come back as RGB."""
    w, h, ctype = _parse_ihdr(payload)
    spp = _SCANLINE_SAMPLES[ctype]
    idat = bytearray()
    plte = None
    saw_end = False
    for tag, data in _parse_chunks(payload):
        if tag == b"IDAT":
            idat.extend(data)
        elif tag == b"PLTE":
            if plte is not None:
                raise ValueError("PNG has multiple PLTE chunks")
            if not data or len(data) % 3 or len(data) > 768:
                raise ValueError(f"malformed PLTE chunk (length {len(data)})")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            raise ValueError("PNG palette transparency (tRNS) not supported")
        elif tag == b"IEND":
            saw_end = True
            break
    if not saw_end:
        raise ValueError("PNG has no IEND chunk")
    if not idat:
        raise ValueError("PNG has no IDAT chunk")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG has no PLTE chunk")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"PNG IDAT inflate failed: {e}") from e
    stride = w * spp
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"PNG pixel stream length {len(raw)} != expected {h * (1 + stride)}"
        )
    flat = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    out = np.empty((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        prior = _unfilter_row(flat[y, 1:], prior, spp, int(flat[y, 0]))
        out[y] = prior
    if ctype == 3:
        if int(out.max()) >= plte.shape[0]:
            raise ValueError(
                f"palette index {int(out.max())} out of range "
                f"(PLTE has {plte.shape[0]} entries)"
            )
        return plte[out.reshape(h, w)]  # (h, w) indices -> (h, w, 3) RGB
    return out.reshape(h, w, _CHANNELS[ctype])


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
