"""JPEG codec (extensions/jpeg.py): spec conformance the parity sweep
can't see. Two independence layers keep an encoder/decoder bug pair
from cancelling out: (1) the DCT is checked against a scalar
transcription of the T.81 Annex A formula (no shared code with the
einsum path), and (2) the decoder is fed a BITSTREAM BUILT BY HAND in
this file — markers and Huffman bits derived on paper from the Annex K
tables — so a decode of those bytes exercises zero encoder code.
Spark-side value parity runs in tests/test_oracle_parity.py
(multimodal_jpeg_decode — DuckDB recomputes decoded pixel sums in
closed form from doc_id)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from promptly_data_pipelines_spark.extensions.jpeg import (
    QUANT_LUMA,
    ZIGZAG,
    _fdct,
    decode_jpeg,
    decode_jpeg_header,
    encode_jpeg,
    quality_scaled_tables,
    resize_jpeg,
)


def test_fdct_matches_scalar_spec_formula():
    """T.81 A.3.3 transcribed with explicit loops: S_vu = (1/4) C_v C_u
    ΣΣ s_yx cos((2x+1)uπ/16) cos((2y+1)vπ/16)."""
    rng = np.random.default_rng(5)
    X = rng.integers(-128, 128, size=(8, 8)).astype(np.float64)
    ref = np.zeros((8, 8))
    for v in range(8):
        for u in range(8):
            acc = 0.0
            for y in range(8):
                for x in range(8):
                    acc += (
                        X[y, x]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            ref[v, u] = 0.25 * cu * cv * acc
    got = _fdct(X[None, :, :])[0]
    assert np.abs(got - ref).max() < 1e-9


def _handmade_dc_only_jpeg(values: list[int]) -> bytes:
    """Build a (8, 8*len(values)) grayscale baseline JPEG BY HAND:
    each value is one flat 8×8 block. Entropy bits derived on paper
    from the Annex K canonical tables:
      DC luma: category 4 = '101' (3rd code of length 3); amplitudes
      are the category-sized bit patterns of T.81 F.1.2.1.
      AC luma: EOB (0x00) = '1010'.
    Only even (v-128) offsets with |diff| in category 4 keep the
    hand-math small: quantized DC = (v-128)/2 with Q00=16."""
    bits = ""
    pred = 0
    for v in values:
        dc = (v - 128) * 8 // 16
        diff = dc - pred
        pred = dc
        assert diff != 0 and abs(diff) < 16, "hand-coder covers category 1-4 only"
        size = abs(diff).bit_length()
        dc_codes = {1: "010", 2: "011", 3: "100", 4: "101"}  # categories 1-4, len-3 codes
        amp = diff if diff > 0 else diff + (1 << size) - 1
        bits += dc_codes[size] + format(amp, f"0{size}b")
        bits += "1010"  # EOB
    bits += "1" * ((8 - len(bits) % 8) % 8)
    entropy = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert b"\xff" not in entropy, "hand fixture must not need byte stuffing"

    w = 8 * len(values)
    q = QUANT_LUMA.reshape(64)[ZIGZAG]
    out = b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(x) for x in q)
    out += b"\xff\xc0" + struct.pack(">H", 11) + bytes([8]) + struct.pack(">HH", 8, w)
    out += bytes([1, 1, 0x11, 0])
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    ac_bits = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
    from promptly_data_pipelines_spark.extensions.jpeg import AC_LUMA_VALS

    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 12) + b"\x00" + bytes(dc_bits) + bytes(range(12))
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 162) + b"\x10" + bytes(ac_bits) + bytes(AC_LUMA_VALS)
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    out += entropy
    out += b"\xff\xd9"
    return out


def test_decoder_on_handmade_bitstream():
    """Decoder independence: bytes assembled by hand (markers + paper-
    derived Huffman bits) must decode to the exact flat blocks. The
    DC-only construction is lossless for even offsets at quality 50."""
    values = [144, 130, 156, 134]
    b = _handmade_dc_only_jpeg(values)
    out = decode_jpeg(b)
    assert out.shape == (8, 32)
    for i, v in enumerate(values):
        assert (out[:, 8 * i : 8 * i + 8] == v).all(), (i, v)
    assert decode_jpeg_header(b) == {"width": 32, "height": 8, "n_channels": 1}


def test_dc_only_roundtrip_is_exact():
    """The oracle property: flat 8×8 blocks with even offsets survive
    encode(quality=50) → decode EXACTLY (S₀₀ = 8·(v−128), Q₀₀ = 16)."""
    rng = np.random.default_rng(7)
    blocks = (128 + 2 * rng.integers(-30, 31, size=(5, 7))).astype(np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=50)), img)
    # and in color: gray-valued pixels put chroma at exactly 128
    cimg = np.stack([img] * 3, axis=-1)
    assert np.array_equal(decode_jpeg(encode_jpeg(cimg, quality=50)), cimg)


def test_roundtrip_error_bounds_all_modes():
    """Lossy, but boundedly so on a smooth gradient at quality 95 —
    and every subsampling layout decodes to the declared dims."""
    smooth = np.zeros((21, 19, 3), np.uint8)
    for c in range(3):
        smooth[..., c] = (
            np.add.outer(np.arange(21) * 4, np.arange(19) * 3) % 180 + 30 + c * 10
        )
    for mode in ("444", "420", "422"):
        out = decode_jpeg(encode_jpeg(smooth, quality=95, subsample=mode))
        assert out.shape == smooth.shape, mode
        err = np.abs(out.astype(int) - smooth.astype(int)).max()
        assert err <= 2, (mode, err)
    g = smooth[..., 0]
    out = decode_jpeg(encode_jpeg(g, quality=95))
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 1


def test_restart_markers_roundtrip_and_resync_check():
    # smooth non-wrapping gradient (max 23*5 + 39*3 = 232): a sawtooth
    # wrap would add legitimate ringing at the discontinuity and the
    # bound here is about the RESTART path, not edge behavior
    g = np.add.outer(np.arange(24) * 5, np.arange(40) * 3).astype(np.uint8)
    b = encode_jpeg(g, quality=92, restart_interval=3)
    assert b"\xff\xdd" in b  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in b for i in range(8))
    out = decode_jpeg(b)
    assert np.abs(out.astype(int) - g.astype(int)).max() <= 2
    # corrupt the first restart marker's index: loud out-of-sequence error
    for i in range(8):
        m = bytes([0xFF, 0xD0 + i])
        pos = b.find(m, b.find(b"\xff\xda"))
        if pos != -1:
            bad = b[:pos] + bytes([0xFF, 0xD0 + ((i + 1) % 8)]) + b[pos + 2 :]
            with pytest.raises(ValueError, match="restart marker"):
                decode_jpeg(bad)
            break
    else:
        pytest.fail("no restart marker found in stream")


def test_quality_scaling_formula():
    ql50, _ = quality_scaled_tables(50)
    assert np.array_equal(ql50, QUANT_LUMA)  # scale 100 = identity
    ql100, _ = quality_scaled_tables(100)
    assert ql100.min() == 1 and ql100.max() == 1
    ql10, _ = quality_scaled_tables(10)
    assert (ql10 >= QUANT_LUMA).all() and ql10.max() <= 255
    with pytest.raises(ValueError, match="quality"):
        quality_scaled_tables(0)


def test_determinism_and_header():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(10, 14, 3), dtype=np.uint8)
    assert encode_jpeg(px, 80) == encode_jpeg(px, 80)
    hdr = decode_jpeg_header(encode_jpeg(px, 80))
    assert hdr == {"width": 14, "height": 10, "n_channels": 3}
    ghdr = decode_jpeg_header(encode_jpeg(px[..., 0], 80))
    assert ghdr == {"width": 14, "height": 10, "n_channels": 1}


def test_unsupported_modes_refused_loudly():
    b = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    # flip SOF0 -> SOF2 (progressive): marker byte 0xC0 -> 0xC2
    pos = b.index(b"\xff\xc0")
    prog = b[:pos] + b"\xff\xc2" + b[pos + 2 :]
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg_header(prog)
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(prog)
    # not a JPEG at all
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"JUNKJUNK")
    # truncated entropy stream
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(b[: len(b) - 6])
    # 16-bit quant table: set DQT precision nibble
    pos = b.index(b"\xff\xdb")
    bad = bytearray(b)
    bad[pos + 4] = 0x10
    with pytest.raises(ValueError, match="16-bit"):
        decode_jpeg(bytes(bad))


def test_resize_and_odd_dims():
    rng = np.random.default_rng(11)
    odd = rng.integers(0, 256, size=(13, 11), dtype=np.uint8)
    assert decode_jpeg(encode_jpeg(odd, quality=100)).shape == (13, 11)
    smooth = np.tile(np.arange(0, 240, 10, dtype=np.uint8), (12, 1))
    rz = resize_jpeg(encode_jpeg(smooth, 95), 6, 4)
    assert decode_jpeg_header(rz) == {"width": 6, "height": 4, "n_channels": 1}
    assert decode_jpeg(rz).shape == (4, 6)


def test_grayscale_ignores_declared_sampling_factors():
    """T.81 A.2: a single-component scan is non-interleaved — sampling
    factors in SOF0 are ignored. Real grayscale files often declare
    2x2 (libjpeg gray from 4:2:0 sources); decode must be identical,
    not silently block-permuted."""
    rng = np.random.default_rng(7)
    img = (128 + 2 * rng.integers(-30, 31, size=(4, 6))).astype(np.uint8)
    img = np.repeat(np.repeat(img, 8, axis=0), 8, axis=1)  # 32x48, mult of 16
    data = bytearray(encode_jpeg(img, quality=50))
    # locate SOF0 and its first (only) component's h/v byte
    i = 2
    while not (data[i] == 0xFF and data[i + 1] == 0xC0):
        seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
        i += 2 + seg_len
    hv_pos = i + 4 + 1 + 2 + 2 + 1 + 1  # marker+len, prec, h, w, ncomp, cid
    assert data[hv_pos] == 0x11
    data[hv_pos] = 0x22  # declare 2x2 sampling on the grayscale component
    assert np.array_equal(decode_jpeg(bytes(data)), decode_jpeg(encode_jpeg(img, quality=50)))
