"""jobs/run_freshness.py e2e: two corpus snapshots -> per-host change
rates -> intervals parquet, matching a hand-computed oracle."""

from __future__ import annotations

import sys


def test_freshness_job_cli(spark, tmp_path, capsys):
    from jobs import run_freshness

    # a.com: 4 docs seen twice, 2 changed -> (2+1)e6 // (4+2) = 500000 ppm
    # b.com: 2 docs seen twice, 0 changed -> (0+1)e6 // (2+2) = 250000 ppm
    # c.com: only added in new -> no observation, absent from output
    old_rows = [(f"https://a.com/p{i}", f"text a {i}") for i in range(4)]
    old_rows += [(f"https://b.com/p{i}", f"text b {i}") for i in range(2)]
    old_rows += [("https://a.com/gone", "removed later")]
    new_rows = [
        ("https://a.com/p0", "text a 0 CHANGED"),
        ("https://a.com/p1", "text a 1 CHANGED"),
        ("https://a.com/p2", "text a 2"),
        ("https://a.com/p3", "text a 3"),
        ("https://b.com/p0", "text b 0"),
        ("https://b.com/p1", "text b 1"),
        ("https://c.com/new", "brand new"),
    ]
    old_p, new_p = str(tmp_path / "old"), str(tmp_path / "new")
    out_p = str(tmp_path / "ivs")
    spark.createDataFrame(old_rows, "doc_id string, text string") \
        .write.parquet(old_p)
    spark.createDataFrame(new_rows, "doc_id string, text string") \
        .write.parquet(new_p)

    argv_save = sys.argv
    sys.argv = ["run_freshness.py", "--old", old_p, "--new", new_p,
                "--out", out_p, "--base-interval", "4",
                "--max-interval", "20", "--text-col", "text"]
    try:
        assert run_freshness.main() == 0
    finally:
        sys.argv = argv_save
    assert "2 hosts" in capsys.readouterr().out

    got = {r["key"]: (r["n_obs"], r["n_changed"], r["rate_ppm"],
                      r["interval"])
           for r in spark.read.parquet(out_p).collect()}
    # intervals: a: floor(4e6/500000)=8; b: floor(4e6/250000)=16
    assert got == {"a.com": (4, 2, 500000, 8), "b.com": (2, 0, 250000, 16)}
