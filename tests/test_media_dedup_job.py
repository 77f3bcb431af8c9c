"""End-to-end test of the multimodal near-dup job
(jobs/run_media_dedup.py): real CLI main() on a mixed media parquet —
images, videos (two containers), audio (two codecs), junk — asserting
each modality's pair artifacts."""

from __future__ import annotations

import json
import os
import sys

import numpy as np

JOBS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "jobs")
sys.path.insert(0, JOBS)


def _run(capsys, argv):
    import run_media_dedup

    old = sys.argv
    sys.argv = ["run_media_dedup.py"] + argv
    try:
        assert run_media_dedup.main() == 0
    finally:
        sys.argv = old
    out = [ln for ln in capsys.readouterr().out.splitlines()
           if ln.startswith("{")]
    return json.loads(out[-1])


def test_media_dedup_job_end_to_end(spark, tmp_path, capsys):
    import __spark_entry__ as E
    from smartcrawler_spark import multimodal as MM
    from smartcrawler_spark.flac import encode_flac

    pa, pb = E._dhash_case_pixels(0, 48, 36, None), \
        E._dhash_case_pixels(5, 48, 36, None)
    i = np.arange(8 * 256)
    tone = np.round(0.5 * np.sin(2 * np.pi * 40 * i / 256) * 32767
                    ).astype(np.int64)
    rows = [
        # exact image twins across containers -> one hamming-0 pair
        ("imgA.png", bytearray(MM.encode_png(pa))),
        ("imgA.ppm", bytearray(MM.encode_ppm(pa))),
        ("imgB.png", bytearray(MM.encode_png(pb))),
        # same clip in two video containers -> full-containment pair
        ("vid1.avi", bytearray(MM.encode_avi_mjpeg([pa, pa, pb]))),
        ("vid2.png", bytearray(MM.encode_apng([pa, pa, pb]))),
        # same samples in two audio codecs -> full-containment pair
        ("aud1.wav", bytearray(MM.encode_wav(
            tone.astype("float64") / 32768.0, rate=8000))),
        ("aud2.flac", bytearray(encode_flac(tone, rate=8000, bps=16))),
        ("junk.bin", bytearray(b"none of the above")),
    ]
    src = str(tmp_path / "media")
    spark.createDataFrame(rows, "media_ref string, payload binary") \
        .write.parquet(src)
    out = str(tmp_path / "dedup")
    res = _run(capsys, ["--input", src, "--output", out])
    st = res["stages"]
    assert st["input"] == 8
    # still images hash — and the APNG's default image is ALSO an image
    # (its first frame), so it joins the image tier; AVI/audio/junk don't
    assert st["images_hashed"] == 4
    img = {(r["ref_a"], r["ref_b"]): r["hamming"]
           for r in spark.read.parquet(f"{out}/image_pairs").collect()}
    assert img.get(("imgA.png", "imgA.ppm")) == 0
    # cross-modality catch: the animation whose first frame is imgA
    assert img.get(("imgA.png", "vid2.png")) == 0
    assert not any("imgB.png" in p for p in img)
    assert st["video_frames"] == 6 and st["video_pairs"] == 1
    vid = spark.read.parquet(f"{out}/video_overlap").collect()[0]
    assert (vid["ref_a"], vid["ref_b"]) == ("vid1.avi", "vid2.png")
    assert vid["containment_a_bp"] == 10000 == vid["containment_b_bp"]
    shots = spark.read.parquet(f"{out}/video_shots")
    assert shots.filter("media_ref = 'vid1.avi'").count() == 2  # pa|pb cut
    assert st["audio_pairs"] == 1
    aud = spark.read.parquet(f"{out}/audio_overlap").collect()[0]
    assert (aud["ref_a"], aud["ref_b"]) == ("aud1.wav", "aud2.flac")
    assert aud["containment_a_bp"] == 10000 == aud["containment_b_bp"]
