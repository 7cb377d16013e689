"""Audio DSP (extensions/audio.py): PCM edge cases the closed-form
tone oracle can't produce — silence, DC offset, zero-holds-previous
crossing semantics, stereo interleave, truncated containers. Value
parity of the full Spark pipeline runs in tests/test_oracle_parity.py
(audio_tone_features)."""

from __future__ import annotations

import numpy as np
import pytest

from promptly_data_pipelines_spark.extensions.audio import (
    pcm_features,
    wav_pcm,
)
from promptly_data_pipelines_spark.extensions.multimodal import encode_wav


def _wav(samples: np.ndarray, sr: int = 8000, ch: int = 1) -> bytes:
    return encode_wav(sr, ch, samples.astype("<i2").tobytes())


def test_pcm_decode_roundtrip_and_fmt():
    s = np.array([0, 100, -100, 32767, -32768], dtype=np.int16)
    fmt, out = wav_pcm(_wav(s, sr=16000))
    assert fmt == {"sample_rate": 16000, "n_channels": 1}
    assert np.array_equal(out, s)


def test_silence_and_dc_have_zero_crossings():
    silent = pcm_features(np.zeros(1000, dtype=np.int16), 1)
    assert silent["rms"] == 0.0 and silent["n_zero_crossings"] == 0
    dc = pcm_features(np.full(1000, 500, dtype=np.int16), 1)
    assert dc["rms"] == 500.0 and dc["n_zero_crossings"] == 0
    assert dc["peak"] == 500


def test_zero_samples_hold_previous_sign():
    """+A, 0, 0, -A is ONE crossing (zeros are not sign flips), and
    +A, 0, 0, +A is ZERO crossings — the convention that keeps a
    fading signal from counting as noise."""
    one = pcm_features(np.array([100, 0, 0, -100], dtype=np.int16), 1)
    assert one["n_zero_crossings"] == 1
    none = pcm_features(np.array([100, 0, 0, 100], dtype=np.int16), 1)
    assert none["n_zero_crossings"] == 0
    # leading zeros carry no sign at all: 0, 0, +A is no crossing
    lead = pcm_features(np.array([0, 0, 100], dtype=np.int16), 1)
    assert lead["n_zero_crossings"] == 0
    # ...but real crossings AFTER a leading-zero prefix still count
    # (regression: an earlier formula over-subtracted one per leading
    # zero, under-counting this case)
    mixed = pcm_features(np.array([0, 0, 100, -100, 100], dtype=np.int16), 1)
    assert mixed["n_zero_crossings"] == 2


def test_stereo_analyzes_channel_zero():
    # channel 0 alternates every sample; channel 1 is silent
    inter = np.zeros(200, dtype=np.int16)
    inter[0::2] = np.where(np.arange(100) % 2 == 0, 1000, -1000)
    feats = pcm_features(inter, 2)
    assert feats["n_samples"] == 100
    assert feats["rms"] == 1000.0
    assert feats["n_zero_crossings"] == 99


def test_frame_count_rounds_up():
    feats = pcm_features(np.ones(257, dtype=np.int16), 1)
    assert feats["n_frames"] == 2
    assert pcm_features(np.ones(256, dtype=np.int16), 1)["n_frames"] == 1


def test_truncated_or_missing_data_chunk_raises():
    good = _wav(np.ones(10, dtype=np.int16))
    with pytest.raises(ValueError, match="truncated"):
        wav_pcm(good[:-4])
    # RIFF/WAVE + fmt but no data chunk at all
    no_data = good[: good.index(b"data")]
    with pytest.raises(ValueError, match="no data chunk"):
        wav_pcm(no_data)


def test_odd_length_data_chunk_raises():
    """An odd byte count is corrupt for int16 PCM — loud refusal, not
    a silent trailing-byte drop (r10 ADVICE)."""
    good = _wav(np.ones(10, dtype=np.int16))
    off = good.index(b"data")
    import struct

    bad = (
        good[:off]
        + struct.pack("<4sI", b"data", 19)
        + good[off + 8 : off + 8 + 19]
    )
    with pytest.raises(ValueError, match="odd byte length"):
        wav_pcm(bad)


def test_frame_features_odd_tail_and_boundary_pairs():
    from promptly_data_pipelines_spark.extensions.audio import (
        FRAME,
        frame_features,
        pcm_features,
    )

    # 2.5 frames: tail frame has FRAME//2 samples and its own features
    n = FRAME * 2 + FRAME // 2
    sig = np.where(np.arange(n) % 2 == 0, 700, -700).astype(np.int16)
    frames = frame_features(sig, 1)
    assert [f["frame_idx"] for f in frames] == [0, 1, 2]
    assert [f["n_samples"] for f in frames] == [FRAME, FRAME, FRAME // 2]
    assert all(f["rms"] == 700.0 and f["peak"] == 700 for f in frames)
    # alternating signal: every in-frame pair crosses; boundary pairs
    # (FRAME-1, FRAME) and (2*FRAME-1, 2*FRAME) belong to NO frame
    assert [f["n_zero_crossings"] for f in frames] == [
        FRAME - 1, FRAME - 1, FRAME // 2 - 1,
    ]
    # frame counts sum to full-signal count minus the boundary pairs
    full = pcm_features(sig, 1)["n_zero_crossings"]
    assert sum(f["n_zero_crossings"] for f in frames) == full - 2


def test_frame_features_stereo_and_empty():
    from promptly_data_pipelines_spark.extensions.audio import frame_features

    # stereo: analyze channel 0 only (same convention as pcm_features)
    inter = np.zeros(40, dtype=np.int16)
    inter[0::2] = 300
    frames = frame_features(inter, 2)
    assert len(frames) == 1 and frames[0]["n_samples"] == 20
    assert frames[0]["rms"] == 300.0 and frames[0]["n_zero_crossings"] == 0
    assert frame_features(np.array([], dtype=np.int16), 1) == []
    # single sample: one frame, no pairs
    one = frame_features(np.array([-5], dtype=np.int16), 1)
    assert one[0]["n_zero_crossings"] == 0 and one[0]["peak"] == 5
