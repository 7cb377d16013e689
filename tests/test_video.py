"""MJPEG/AVI video tier (extensions/video.py): container conformance
and frame-walk edge cases the parity sweep can't see. Spark-side value
parity runs in tests/test_oracle_parity.py (multimodal_video_frames /
multimodal_video_sample — DuckDB recomputes per-frame pixel sums in
closed form)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from promptly_data_pipelines_spark.extensions.jpeg import decode_jpeg, encode_jpeg
from promptly_data_pipelines_spark.extensions.video import (
    decode_avi_header,
    encode_avi_mjpeg,
    iter_avi_frames,
)


def _flat_jpeg(vals: np.ndarray) -> tuple[bytes, np.ndarray]:
    img = np.repeat(np.repeat(vals.astype(np.uint8), 8, axis=0), 8, axis=1)
    return encode_jpeg(img, quality=50), img


def test_roundtrip_bytes_and_header():
    rng = np.random.default_rng(9)
    frames, pixels = zip(
        *[_flat_jpeg(128 + 2 * rng.integers(-30, 31, size=(2, 3))) for _ in range(4)]
    )
    avi = encode_avi_mjpeg(list(frames), 24, 16, fps=8)
    assert decode_avi_header(avi) == {
        "width": 24, "height": 16, "n_frames": 4, "us_per_frame": 125000,
    }
    got = list(iter_avi_frames(avi))
    assert [g == f for g, f in zip(got, frames)] == [True] * 4
    # frames decode to the exact source pixels (DC-only construction)
    for g, px in zip(got, pixels):
        assert np.array_equal(decode_jpeg(g), px)
    # determinism: no timestamps anywhere in the container
    assert avi == encode_avi_mjpeg(list(frames), 24, 16, fps=8)


def test_odd_length_frames_word_aligned():
    """RIFF chunks are 2-byte aligned: an odd-length JPEG frame gets a
    pad byte that must NOT leak into the next frame's bytes."""
    # craft two 'frames' of odd length (any bytes — the walker doesn't
    # decode); parser must return them byte-exact
    f1, f2 = b"\x01\x02\x03", b"\x04\x05\x06\x07\x08"
    avi = encode_avi_mjpeg([f1, f2], 8, 8)
    assert list(iter_avi_frames(avi)) == [f1, f2]


def test_loud_refusals():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi_header(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="at least one frame"):
        encode_avi_mjpeg([], 8, 8)
    avi = encode_avi_mjpeg([b"xx"], 8, 8)
    with pytest.raises(ValueError, match="truncated"):
        list(iter_avi_frames(avi[:-6]))
    # two streams declared -> unsupported
    bad = bytearray(avi)
    pos = bytes(bad).index(b"avih") + 8
    struct.pack_into("<I", bad, pos + 24, 2)  # dwStreams = 2
    with pytest.raises(ValueError, match="stream count"):
        decode_avi_header(bytes(bad))
    # no movi LIST: truncate the RIFF size to end right after hdrl
    with pytest.raises(ValueError, match="no movi"):
        hdr_only_end = bytes(avi).index(b"movi") - 8
        trimmed = bytearray(avi[:hdr_only_end])
        struct.pack_into("<I", trimmed, 4, hdr_only_end - 8)
        list(iter_avi_frames(bytes(trimmed)))


def test_non_mjpeg_codec_refused_by_name():
    """An H.264-in-AVI payload must fail as 'unsupported AVI codec',
    not as a per-frame 'not a JPEG payload' that reads as corruption."""
    from promptly_data_pipelines_spark.extensions.video import iter_avi_frames

    avi = bytearray(encode_avi_mjpeg([b"\x01\x02"], 8, 8))
    pos = bytes(avi).index(b"strh") + 8  # strh data: fccType + handler
    assert bytes(avi)[pos : pos + 8] == b"vidsMJPG"
    avi[pos + 4 : pos + 8] = b"H264"
    with pytest.raises(ValueError, match="unsupported AVI codec 'H264'"):
        list(iter_avi_frames(bytes(avi)))
