"""Audio near-dup via constellation fingerprints (Shazam-style, Wang
2003, radically simplified to an integer spec) over binary audio
columns, using the in-repo decoders (WAV all widths / G.711 / ADPCM,
FLAC, MP3 — multimodal.decode_audio).

A clip becomes a SET of landmark hashes: frame the mono signal, take
the dominant spectral bin per frame (argmax of the rFFT magnitude —
the float FFT is only a quantizer; every emitted value is an integer
bin index), and hash pairs of nearby peaks:

    fp = peak[t] * 2^20 + peak[t + dt] * 2^10 + dt,   dt in 1..fanout

(frame <= 2048 keeps both bins under 2^10). Re-encodes and lossy
round-trips keep dominant bins, so two encodes of the same material
share most landmarks; overlap scoring is the SAME operator videos use
— videodup.video_frame_overlap over (ref, fp) — an exact equi-join on
long keys, never all-pairs, with the hot-hash cap for degenerate
landmarks (silence, mains hum).

Scale: fingerprinting is map-only (mapInPandas decode + FFT per
Arrow batch, zero Exchange); a clip of n samples emits about
(n/hop) * fanout rows.

Reference context: the reference drops media outright
(/root/reference/src/html_parser.rs); like imagedup/videodup this is
100 TB multimodal-corpus breadth.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_FP_SCHEMA = "media_ref string, frame_idx int, fp long"


def peak_bins_scalar(samples: np.ndarray, frame: int = 1024,
                     hop: int | None = None) -> list[int]:
    """Reference kernel (one rfft per frame) — the pytest oracle for
    the vectorized `peak_bins` below; same spec, loop form."""
    hop = hop or frame
    out = []
    for start in range(0, len(samples) - frame + 1, hop):
        mag = np.abs(np.fft.rfft(samples[start:start + frame]))
        out.append(int(np.argmax(mag[1:])) + 1)
    return out


def peak_bins(samples: np.ndarray, frame: int = 1024,
              hop: int | None = None) -> list[int]:
    """Dominant rFFT bin (DC excluded) per full frame; ties resolve to
    the lowest bin (argmax first-occurrence). The integer quantizer the
    fingerprint spec is built on.

    Vectorized (r6, guide §4.2): all frames are materialized as one
    (n_frames, frame) view via sliding_window_view and transformed with
    a single batched rfft(axis=1) + one argmax — numpy computes each
    row with the same FFT kernel as the per-frame call, so the emitted
    integer bins are identical to `peak_bins_scalar`
    (tests/test_audiodup.py asserts equality)."""
    hop = hop or frame
    if len(samples) < frame:
        return []
    frames = np.lib.stride_tricks.sliding_window_view(samples, frame)[::hop]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    return [int(b) + 1 for b in np.argmax(mag[:, 1:], axis=1)]


def landmarks(peaks: list[int], fanout: int = 2) -> list[tuple[int, int]]:
    """(frame_idx, fp) landmark hashes from a peak sequence."""
    out = []
    for t in range(len(peaks)):
        for dt in range(1, fanout + 1):
            if t + dt < len(peaks):
                out.append((t, (peaks[t] << 20) | (peaks[t + dt] << 10) | dt))
    return out


def audio_fingerprint_table(raw: DataFrame, ref_col: str = "media_ref",
                            payload_col: str = "payload",
                            frame: int = 1024, hop: int | None = None,
                            fanout: int = 2) -> DataFrame:
    """(media_ref, frame_idx, fp) landmark rows for every decodable
    audio payload; undecodable or shorter-than-one-frame clips are
    dropped. Map-only. Feed to videodup.video_frame_overlap(...,
    hash_col='fp') for pairwise containment."""
    # r6 ADVICE fix: at frame == 2048 the rFFT yields bins 0..1024 and a
    # peak of 1024 needs 11 bits — (peak2=1024)<<10 would collide with
    # bit 0 of the peak1 field. The 10-bit packing is safe exactly when
    # the max bin frame/2 fits 10 bits, i.e. frame < 2048.
    if frame >= 2048:
        raise ValueError("frame >= 2048 overflows the 10-bit bin packing")
    from smartcrawler_spark.multimodal import decode_audio

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            refs, idxs, fps = [], [], []
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                try:
                    dec = decode_audio(bytes(payload))
                except Exception:
                    dec = None
                if dec is None:
                    continue
                samples, _rate = dec
                for t, fp in landmarks(
                        peak_bins(samples, frame, hop), fanout):
                    refs.append(ref)
                    idxs.append(t)
                    fps.append(fp)
            yield pd.DataFrame({
                "media_ref": pd.Series(refs, dtype="object"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "fp": pd.Series(fps, dtype="int64"),
            })

    return (raw.select(ref_col, payload_col)
            .mapInPandas(batches, AUDIO_FP_SCHEMA))


def audio_overlap(fps: DataFrame, min_shared: int = 1,
                  max_hash_bucket: int = 10_000) -> DataFrame:
    """Pairwise landmark-set containment between clips — the videodup
    overlap operator over the fp column (same integer-div basis points,
    same hot-cap semantics)."""
    from .videodup import video_frame_overlap

    return video_frame_overlap(fps, min_shared=min_shared, hash_col="fp",
                               max_hash_bucket=max_hash_bucket)
