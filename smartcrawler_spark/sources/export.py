"""Deterministic training-data export: sharded parquet + integrity manifest.

The last stage of the pipeline — turning a refined corpus into the
artifact a training run consumes — has two requirements ordinary
`df.write.parquet` does not meet:

* **deterministic sharding**: the same input rows must land in the same
  shard regardless of input partitioning or cluster size, so exports
  are reproducible and shard-level diffs are meaningful.  Shard =
  md5-derived hash of the id column mod n_shards (the engine-replayable
  recipe of sampling.md5_uniform_bits — NOT Spark's internal
  hashPartitioning, which is plan-dependent), written via
  partitionBy(shard) so each shard is a stable directory.
* **an integrity manifest**: per-shard row counts plus an ORDER-
  INDEPENDENT content checksum (sum of per-row md5-int64 over the
  serialized row, mod 2^63) so a consumer can verify a shard without
  re-reading the whole export on one machine — checksums add, so
  shard checks parallelize and the total verifies the union.

Scale shape: one map to tag shard + one partitionBy write (a single
hash exchange), one groupBy(shard) agg for the manifest; no collects
beyond the n_shards manifest rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import md5_uniform_bits


def shard_of(id_col, n_shards: int, salt: str = "export"):
    """Deterministic shard id in [0, n_shards): md5-uniform 48 bits of
    the id, mod n_shards — stable across partitioning, plans, engines."""
    return (md5_uniform_bits(F.col(id_col) if isinstance(id_col, str)
                             else id_col, salt=salt, nbits=48)
            % n_shards).cast("int")


def row_checksum(cols: list[str]):
    """Order-independent content checksum column: md5-int60 of the
    JSON-serialized named columns (sorted names — schema-order-proof).
    Summed per shard mod 2^63 by `export_manifest`."""
    payload = F.to_json(F.struct(*[F.col(c) for c in sorted(cols)]))
    return md5_uniform_bits(payload, salt="cksum", nbits=60)


def export_manifest(df: DataFrame, id_col: str, n_shards: int,
                    cols: list[str] | None = None,
                    salt: str = "export") -> DataFrame:
    """(shard, n_rows, checksum): the integrity manifest of a sharded
    export, computable WITHOUT writing — run it on the source to predict
    the manifest, on the written files to verify. checksum = sum of
    row_checksum mod 2^63 (commutative -> order/partitioning
    independent)."""
    cols = cols if cols is not None else df.columns
    return (
        df.select(
            shard_of(id_col, n_shards, salt).alias("shard"),
            row_checksum(cols).alias("_ck"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(F.col("_ck").cast("decimal(38,0)"))
             % F.expr("CAST(9223372036854775808 AS DECIMAL(38,0))"))
            .cast("long").alias("checksum"),
        )
    )


def export_dataset(df: DataFrame, out_dir: str, id_col: str,
                   n_shards: int, salt: str = "export") -> dict:
    """Write the sharded export + _MANIFEST.json (underscore prefix
    so Spark readers skip it, like _SUCCESS); returns the manifest
    dict. Layout: out_dir/shard=K/*.parquet + out_dir/_MANIFEST.json with
    per-shard rows/checksums and the totals."""
    tagged = df.withColumn("shard", shard_of(id_col, n_shards, salt))
    (tagged.repartition("shard")
     .write.mode("overwrite").partitionBy("shard").parquet(out_dir))
    man_rows = sorted(
        (r["shard"], r["n_rows"], r["checksum"])
        for r in export_manifest(df, id_col, n_shards,
                                 cols=df.columns, salt=salt).collect()
    )
    manifest = {
        "n_shards": n_shards,
        "id_col": id_col,
        "salt": salt,
        "columns": sorted(df.columns),
        "shards": [
            {"shard": s, "n_rows": n, "checksum": c} for s, n, c in man_rows
        ],
        "total_rows": sum(n for _, n, _ in man_rows),
        "total_checksum": sum(c for _, _, c in man_rows) % (1 << 63),
    }
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def verify_export(spark, out_dir: str) -> dict:
    """Re-read a written export and check it against its _MANIFEST.json.
    Returns {'ok': bool, 'bad_shards': [...]} — each shard re-counted
    and re-checksummed from the files (columns from the manifest, so a
    schema drift also fails)."""
    with open(os.path.join(out_dir, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    df = spark.read.parquet(out_dir)
    cols = manifest["columns"]
    got = {
        r["shard"]: (r["n_rows"], r["checksum"])
        for r in (
            df.select("shard", row_checksum(cols).alias("_ck"))
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.sum(F.col("_ck").cast("decimal(38,0)"))
             % F.expr("CAST(9223372036854775808 AS DECIMAL(38,0))"))
            .cast("long").alias("checksum"),
            )
            .collect()
        )
    }
    bad = []
    for s in manifest["shards"]:
        if got.get(s["shard"]) != (s["n_rows"], s["checksum"]):
            bad.append(s["shard"])
    for shard in got:
        if shard not in {s["shard"] for s in manifest["shards"]}:
            bad.append(shard)
    return {"ok": not bad, "bad_shards": sorted(set(bad))}
