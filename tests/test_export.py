"""Deterministic sharded export + manifest (sources/export.py)."""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import functions as F

from smartcrawler_spark.sources import export as EX


def _u48(v, salt):
    return int(hashlib.md5(f"{v}|{salt}".encode()).hexdigest()[:12], 16)


def _u60(v, salt):
    return int(hashlib.md5(f"{v}|{salt}".encode()).hexdigest()[:15], 16)


def _docs(spark, n=200):
    rows = [(f"doc-{i}", f"text body {i}", i % 7) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id string, text string, grp int"), rows


def test_shard_assignment_matches_python_oracle(spark):
    df, rows = _docs(spark)
    got = {r["doc_id"]: r["s"]
           for r in df.select("doc_id",
                              EX.shard_of("doc_id", 8).alias("s")).collect()}
    assert got == {d: _u48(d, "export") % 8 for d, _, _ in rows}


def test_manifest_matches_python_oracle_and_is_order_independent(spark):
    df, rows = _docs(spark)
    man = {r["shard"]: (r["n_rows"], r["checksum"])
           for r in EX.export_manifest(df, "doc_id", 4).collect()}
    want = {}
    for d, t, g in rows:
        s = _u48(d, "export") % 4
        # row checksum: md5-60bit of sorted-column JSON serialization
        payload = json.dumps({"doc_id": d, "grp": g, "text": t},
                             separators=(",", ":"))
        n, c = want.get(s, (0, 0))
        want[s] = (n + 1, (c + _u60(payload, "cksum")))
    want = {s: (n, c % (1 << 63)) for s, (n, c) in want.items()}
    assert man == want
    # order/partitioning independence: shuffled input, same manifest
    man2 = {r["shard"]: (r["n_rows"], r["checksum"])
            for r in EX.export_manifest(
                df.orderBy(F.desc("text")).repartition(13),
                "doc_id", 4).collect()}
    assert man2 == man


def test_export_write_verify_roundtrip_and_tamper(spark, tmp_path):
    df, _ = _docs(spark, 120)
    out = str(tmp_path / "exp")
    manifest = EX.export_dataset(df, out, "doc_id", n_shards=4)
    assert manifest["total_rows"] == 120
    assert "_MANIFEST.json" in os.listdir(out)
    assert EX.verify_export(spark, out) == {"ok": True, "bad_shards": []}
    # written shard dirs exist per manifest
    for s in manifest["shards"]:
        assert os.path.isdir(os.path.join(out, f"shard={s['shard']}"))
    # tamper: drop one shard's files -> exactly that shard flagged
    victim = manifest["shards"][0]["shard"]
    vdir = os.path.join(out, f"shard={victim}")
    for fn in os.listdir(vdir):
        if fn.endswith(".parquet"):
            os.remove(os.path.join(vdir, fn))
    res = EX.verify_export(spark, out)
    assert res["ok"] is False and victim in res["bad_shards"]


def test_export_deterministic_across_runs(spark, tmp_path):
    df, _ = _docs(spark, 90)
    m1 = EX.export_dataset(df, str(tmp_path / "a"), "doc_id", 5)
    m2 = EX.export_dataset(df.repartition(7), str(tmp_path / "b"), "doc_id", 5)
    assert m1 == m2
