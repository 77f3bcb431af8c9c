"""spark-submit entrypoint for multimodal near-dup over a media table.

The media companion to jobs/run_pipeline.py: one job that takes a
(media_ref, payload) parquet and emits the three fingerprint-dedup
artifacts, every stage an existing gated operator:

    images -> integer dHash -> exact hamming<=k pairs
              (operators/imagedup, multi-index banding)
    videos -> per-frame dHash (MJPEG-AVI / animated GIF / APNG) ->
              shot table + frame-set containment (operators/videodup)
    audio  -> constellation landmarks (WAV/G.711/ADPCM/FLAC/MP3) ->
              landmark-set containment (operators/audiodup)

Every payload is offered to all three extractors; each keeps what its
decoders accept (a still image contributes no frames, junk contributes
nothing anywhere), so routing needs no content-type column. Outputs
land as parquet next to --output: image_pairs/, video_shots/,
video_overlap/, audio_overlap/; one JSON metrics line on stdout.

Local sandbox:

    python jobs/run_media_dedup.py --input media.parquet --output /tmp/md
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description="multimodal near-dup pipeline")
    ap.add_argument("--input", required=True,
                    help="media parquet (media_ref, payload)")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--image-hamming", type=int, default=6,
                    help="dHash near-dup radius (exact for <= 7)")
    ap.add_argument("--shot-threshold", type=int, default=5,
                    help="frame-hamming shot-cut threshold")
    ap.add_argument("--min-shared", type=int, default=1,
                    help="min shared fingerprints for an overlap pair")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from smartcrawler_spark.operators import audiodup as AD
    from smartcrawler_spark.operators import imagedup as ID
    from smartcrawler_spark.operators import videodup as VD

    spark = SparkSession.getActiveSession()
    if spark is None:
        from smartcrawler_spark.session import get_spark

        spark = get_spark(app_name="smartcrawler-media-dedup")

    raw = spark.read.parquet(args.input).select("media_ref", "payload")
    counts: dict[str, int] = {"input": raw.count()}
    out = args.output.rstrip("/")

    hashes = ID.image_dhash_table(raw).persist()
    counts["images_hashed"] = hashes.count()
    pairs = ID.dhash_near_dup(hashes, max_hamming=args.image_hamming)
    pairs.write.mode("overwrite").parquet(f"{out}/image_pairs")
    counts["image_pairs"] = spark.read.parquet(f"{out}/image_pairs").count()

    frames = VD.frame_dhash_table(raw).persist()
    counts["video_frames"] = frames.count()
    VD.shot_bounds(frames, threshold=args.shot_threshold) \
        .write.mode("overwrite").parquet(f"{out}/video_shots")
    VD.video_frame_overlap(frames, min_shared=args.min_shared) \
        .write.mode("overwrite").parquet(f"{out}/video_overlap")
    counts["video_shots"] = spark.read.parquet(f"{out}/video_shots").count()
    counts["video_pairs"] = spark.read.parquet(f"{out}/video_overlap").count()

    fps = AD.audio_fingerprint_table(raw).persist()
    counts["audio_landmarks"] = fps.count()
    AD.audio_overlap(fps, min_shared=args.min_shared) \
        .write.mode("overwrite").parquet(f"{out}/audio_overlap")
    counts["audio_pairs"] = spark.read.parquet(f"{out}/audio_overlap").count()

    print(json.dumps({"stages": counts, "output": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
