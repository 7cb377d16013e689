"""PNG codec (extensions/png.py): spec conformance the parity sweep
can't see. The production decode is cross-checked against an
INDEPENDENT reference unfilter written straight from the PNG spec
text (plain-Python recurrences, no shared code with the vectorized
implementation) so an encoder/decoder bug pair can't cancel out; the
malformed-input cases pin the loud-refusal contract (ValueError,
never silent garbage). Spark-side value parity runs in
tests/test_oracle_parity.py (multimodal_png_features /
multimodal_png_roundtrip — DuckDB recomputes dims from doc_id).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from promptly_data_pipelines_spark.extensions.png import (
    _SIG,
    decode_png,
    decode_png_header,
    encode_png,
    encode_png_palette,
    resize_png,
)


def _ref_decode(payload: bytes) -> np.ndarray:
    """Reference decoder: chunk walk + zlib + the spec's §9 filter
    recurrences transcribed directly (scalar, byte-at-a-time)."""
    assert payload[:8] == _SIG
    off, idat, meta = 8, b"", None
    while off < len(payload):
        (length,) = struct.unpack_from(">I", payload, off)
        tag = payload[off + 4 : off + 8]
        data = payload[off + 8 : off + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", data)
            meta = (w, h, {0: 1, 2: 3, 4: 2, 6: 4}[ctype])
        elif tag == b"IDAT":
            idat += data
        off += 12 + length
    w, h, c = meta
    raw = zlib.decompress(idat)
    stride = w * c
    out = []
    prior = [0] * stride
    pos = 0
    for _y in range(h):
        ftype = raw[pos]
        row = list(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        recon = [0] * stride
        for x in range(stride):
            a = recon[x - c] if x >= c else 0
            b = prior[x]
            cc = prior[x - c] if x >= c else 0
            if ftype == 0:
                v = row[x]
            elif ftype == 1:
                v = row[x] + a
            elif ftype == 2:
                v = row[x] + b
            elif ftype == 3:
                v = row[x] + (a + b) // 2
            elif ftype == 4:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                v = row[x] + pr
            recon[x] = v % 256
        out.append(recon)
        prior = recon
    return np.array(out, dtype=np.uint8).reshape(h, w, c)


def test_production_decode_matches_reference_on_all_filters():
    rng = np.random.default_rng(42)
    for shape in [(7, 5, 1), (6, 9, 3), (4, 4, 2), (8, 3, 4)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        # heuristic encode (mixes filter types) AND each pinned type
        for filters in [None, [0], [1], [2], [3], [4], [4, 3, 2, 1, 0]]:
            b = encode_png(px, filters=filters)
            assert np.array_equal(decode_png(b), _ref_decode(b)), (shape, filters)
            assert np.array_equal(decode_png(b), px), (shape, filters)


def test_heuristic_encoder_emits_multiple_filter_types():
    """The min-SAD heuristic on a gradient+noise image must not
    degenerate to filter 0 for every row — otherwise round-trip tests
    stop exercising the unfilter branches through the default path."""
    rng = np.random.default_rng(3)
    grad = np.add.outer(np.arange(40) * 5, np.arange(30) * 3) % 256
    px = (grad + rng.integers(0, 9, size=(40, 30))).astype(np.uint8)
    b = encode_png(px)
    idat_off = b.index(b"IDAT") + 4
    (length,) = struct.unpack_from(">I", b, idat_off - 8)
    raw = zlib.decompress(b[idat_off : idat_off + length])
    stride = 30 + 1
    types = {raw[y * stride] for y in range(40)}
    assert len(types) >= 2, types


def test_header_decode_fields_and_determinism():
    px = np.arange(60, dtype=np.uint8).reshape(5, 4, 3)
    b1, b2 = encode_png(px), encode_png(px)
    assert b1 == b2  # no timestamps, pinned zlib level
    hdr = decode_png_header(b1)
    assert hdr == {"width": 4, "height": 5, "n_channels": 3}


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"JUNK" + b[4:], "signature"),
        (lambda b: b[:-5] + bytes([b[-5] ^ 0xFF]) + b[-4:], "CRC"),
        (lambda b: b[: len(b) // 2], "truncated"),
    ],
)
def test_corrupt_payloads_raise(mutate, msg):
    b = encode_png(np.zeros((3, 3), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(mutate(b))


def _with_ihdr(depth=8, ctype=2, interlace=0):
    ihdr = struct.pack(">IIBBBBB", 3, 3, depth, ctype, 0, 0, interlace)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    return _SIG + chunk


def test_unsupported_variants_refused_loudly():
    with pytest.raises(ValueError, match="bit depth"):
        decode_png_header(_with_ihdr(depth=16))
    with pytest.raises(ValueError, match="color type"):
        decode_png_header(_with_ihdr(ctype=5))  # 5 is not a PNG color type
    with pytest.raises(ValueError, match="interlaced"):
        decode_png_header(_with_ihdr(interlace=1))
    # sub-byte palette depths (1/2/4-bit indexed) are real-web PNGs we
    # deliberately refuse — the message must say so
    with pytest.raises(ValueError, match="sub-byte palette"):
        decode_png_header(_with_ihdr(depth=4, ctype=3))
    with pytest.raises(ValueError, match="malformed IHDR"):
        # valid-CRC IHDR with a 12-byte body: ValueError, never struct.error
        ihdr = struct.pack(">IIBBBB", 3, 3, 8, 2, 0, 0)
        chunk = (
            struct.pack(">I", len(ihdr))
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        decode_png_header(_SIG + chunk)


def test_idat_length_mismatch_raises():
    """A pixel stream that inflates to the wrong length (forged IHDR
    dims) must fail the frame check, not reshape garbage."""
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    b = bytearray(encode_png(px))
    i = bytes(b).index(b"IHDR") + 4
    b[i : i + 4] = struct.pack(">I", 5)  # width 2 -> 5, CRC now stale
    with pytest.raises(ValueError):
        decode_png(bytes(b))


def test_resize_nearest_neighbor_content_and_alpha():
    # column gradient: NN downscale must pick exact source columns
    g = np.tile(np.arange(0, 240, 12, dtype=np.uint8), (4, 1))[:, :, None]
    out = decode_png(resize_png(encode_png(g), 5, 4))
    assert np.array_equal(out[0, :, 0], g[0, ::4, 0])
    # RGBA: channel count survives the loop, alpha plane intact
    rgba = np.zeros((4, 4, 4), dtype=np.uint8)
    rgba[..., 3] = 200
    out = decode_png(resize_png(encode_png(rgba), 2, 2))
    assert out.shape == (2, 2, 4) and (out[..., 3] == 200).all()
    # upscale replicates rather than interpolating (NN contract)
    one = np.array([[[10, 20, 30]]], dtype=np.uint8)
    out = decode_png(resize_png(encode_png(one), 3, 2))
    assert (out == [10, 20, 30]).all()


def _palette_fixture(h=9, w=7, n=5, seed=11):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n, size=(h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    return idx, pal


def test_palette_roundtrip_is_table_lookup():
    """Type-3 decode: PLTE lookup must reproduce palette[idx] exactly,
    through the production filter heuristic (bpp=1 scanlines)."""
    idx, pal = _palette_fixture()
    b = encode_png_palette(idx, pal)
    hdr = decode_png_header(b)
    assert hdr == {"width": 7, "height": 9, "n_channels": 3}
    out = decode_png(b)
    assert out.shape == (9, 7, 3)
    assert np.array_equal(out, pal[idx])
    # determinism holds for the palette encoder too
    assert b == encode_png_palette(idx, pal)


def test_palette_decode_matches_reference_unfilter():
    """The index-plane unfilter (bpp=1) agrees with the spec-transcribed
    reference decoder: compare the looked-up RGB against feeding the
    same filtered stream through _ref_decode as if it were grayscale."""
    idx, pal = _palette_fixture(h=16, w=11, n=64, seed=7)
    b = encode_png_palette(idx, pal)
    # rewrite IHDR color type 3 -> 0 (gray) and drop PLTE so the
    # reference decoder sees the raw index plane
    i = b.index(b"IHDR") + 4
    ihdr = bytearray(b[i : i + 13])
    ihdr[9] = 0
    chunk = (
        struct.pack(">I", 13)
        + b"IHDR"
        + bytes(ihdr)
        + struct.pack(">I", zlib.crc32(b"IHDR" + bytes(ihdr)) & 0xFFFFFFFF)
    )
    plte_off = b.index(b"PLTE") - 4
    (plte_len,) = struct.unpack_from(">I", b, plte_off)
    gray = _SIG + chunk + b[plte_off + 8 + plte_len + 4 :]
    ref_idx = _ref_decode(gray)[:, :, 0]
    assert np.array_equal(ref_idx, idx)
    assert np.array_equal(decode_png(b), pal[ref_idx])


def test_palette_malformed_cases_raise():
    idx, pal = _palette_fixture()
    # index out of palette range: encoder refuses to build it...
    with pytest.raises(ValueError, match="out of range"):
        encode_png_palette(np.full((2, 2), 9, dtype=np.uint8), pal[:3])
    # ...and the decoder refuses to decode one (truncate PLTE in place)
    b = bytearray(encode_png_palette(idx, pal))
    plte_off = bytes(b).index(b"PLTE") - 4
    short = pal[:2].tobytes()
    rebuilt = (
        bytes(b[:plte_off])
        + struct.pack(">I", len(short))
        + b"PLTE"
        + short
        + struct.pack(">I", zlib.crc32(b"PLTE" + short) & 0xFFFFFFFF)
        + bytes(b[plte_off + 8 + len(pal.tobytes()) + 4 :])
    )
    with pytest.raises(ValueError, match="out of range"):
        decode_png(rebuilt)
    # PLTE length not a multiple of 3
    bad = pal.tobytes()[:-1]
    rebuilt = (
        bytes(b[:plte_off])
        + struct.pack(">I", len(bad))
        + b"PLTE"
        + bad
        + struct.pack(">I", zlib.crc32(b"PLTE" + bad) & 0xFFFFFFFF)
        + bytes(b[plte_off + 8 + len(pal.tobytes()) + 4 :])
    )
    with pytest.raises(ValueError, match="malformed PLTE"):
        decode_png(rebuilt)
    # missing PLTE entirely
    no_plte = bytes(b[:plte_off]) + bytes(b[plte_off + 8 + len(pal.tobytes()) + 4 :])
    with pytest.raises(ValueError, match="no PLTE"):
        decode_png(no_plte)
    # tRNS (palette transparency): loud refusal, not silent alpha-drop
    trns = b"\x80" * 3
    with_trns = (
        bytes(b[: plte_off + 8 + len(pal.tobytes()) + 4])
        + struct.pack(">I", len(trns))
        + b"tRNS"
        + trns
        + struct.pack(">I", zlib.crc32(b"tRNS" + trns) & 0xFFFFFFFF)
        + bytes(b[plte_off + 8 + len(pal.tobytes()) + 4 :])
    )
    with pytest.raises(ValueError, match="tRNS"):
        decode_png(with_trns)


def test_resize_palette_png_comes_back_rgb():
    """resize of a type-3 source: decode expands to RGB, the re-encode
    is truecolor (our encoder never quantizes back to a palette) — the
    output must be a valid RGB PNG with NN-gathered palette colors."""
    idx, pal = _palette_fixture(h=6, w=6, n=4, seed=3)
    out_bytes = resize_png(encode_png_palette(idx, pal), 3, 3)
    out = decode_png(out_bytes)
    assert out.shape == (3, 3, 3)
    assert np.array_equal(out, pal[idx][::2, ::2])
