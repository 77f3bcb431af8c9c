"""Audio constellation fingerprints (operators/audiodup.py).

The driver gates pin WAV + FLAC decode -> landmark tables against
construction-parameter oracles; these tests cover the kernel edges and
the lossy path (G.711 companding must keep dominant bins)."""

from __future__ import annotations

import numpy as np
import pytest

from smartcrawler_spark.operators import audiodup as AD


def _tone(bin_, n_frames, frame=256, amp=0.5):
    i = np.arange(n_frames * frame)
    return amp * np.sin(2 * np.pi * bin_ * i / frame)


def test_peak_bins_kernel():
    x = np.concatenate([_tone(32, 3), _tone(77, 2)])
    assert AD.peak_bins(x, frame=256) == [32, 32, 32, 77, 77]
    # trailing partial frame is dropped
    assert AD.peak_bins(x[:-1], frame=256) == [32, 32, 32, 77]
    # shorter than one frame: no peaks
    assert AD.peak_bins(np.zeros(255), frame=256) == []
    # silence: all-zero spectrum, argmax ties to the lowest bin (1)
    assert AD.peak_bins(np.zeros(256), frame=256) == [1]


def test_landmarks_kernel():
    assert AD.landmarks([5, 9, 9], fanout=2) == [
        (0, (5 << 20) | (9 << 10) | 1),
        (0, (5 << 20) | (9 << 10) | 2),
        (1, (9 << 20) | (9 << 10) | 1),
    ]
    assert AD.landmarks([5], fanout=3) == []


def test_frame_packing_guard():
    with pytest.raises(ValueError, match="10-bit"):
        AD.audio_fingerprint_table(None, frame=4096)


def test_g711_companding_keeps_landmarks(spark):
    """The lossy tier the gates can't pin: mu-law round-trip distorts
    samples but the dominant bins — hence the whole landmark set —
    survive, so a companded re-encode dedups against the original."""
    from smartcrawler_spark import multimodal as MM

    x = np.concatenate([_tone(32, 6), _tone(77, 6)])
    rows = [
        ("clean.wav", bytearray(MM.encode_wav(x, rate=8000))),
        ("mulaw.wav", bytearray(MM.encode_wav_g711(x, rate=8000, law="mu"))),
        ("junk", bytearray(b"not audio")),
    ]
    df = spark.createDataFrame(rows, "media_ref string, payload binary")
    fps = AD.audio_fingerprint_table(df, frame=256, fanout=1)
    got = {r["media_ref"]: set() for r in fps.collect()}
    for r in fps.collect():
        got[r["media_ref"]].add((r["frame_idx"], r["fp"]))
    assert set(got) == {"clean.wav", "mulaw.wav"}
    assert got["clean.wav"] == got["mulaw.wav"]
    ov = AD.audio_overlap(fps).collect()
    assert len(ov) == 1
    assert ov[0]["containment_a_bp"] == 10000
    assert ov[0]["containment_b_bp"] == 10000


def test_peak_bins_vectorized_equals_scalar_oracle():
    """r6 vectorization (sliding_window_view + one batched rfft) must
    emit exactly the per-frame loop's integer bins — every frame size,
    hop (overlapping, aligned, and non-dividing), tail remainder, and
    the sub-frame empty case."""
    rng = np.random.default_rng(42)
    for n in [0, 255, 256, 257, 1024, 5000, 44100]:
        for frame in [256, 1024, 2047]:
            for hop in [None, frame // 2, frame + 7]:
                x = rng.standard_normal(n)
                assert AD.peak_bins(x, frame, hop) == AD.peak_bins_scalar(
                    x, frame, hop), (n, frame, hop)
