"""Iceberg backend for the SnapshotTable seam (production catalog target).

`sources.snapshot` implements the engine's five-method snapshot contract
(commit / append / commit_upsert / read / latest_meta, plus resume +
maintenance) directly over parquet + JSON manifests, because this sandbox
ships no `iceberg-spark-runtime` jar. THIS module is the same contract
expressed against a real Iceberg catalog, auto-skipped when the jar is
absent (`iceberg_available`), so a cluster with the jar gets real Iceberg
snapshots/time-travel/maintenance with zero engine changes:

| seam call                    | Iceberg expression                        |
|------------------------------|-------------------------------------------|
| commit(df, meta)             | df.writeTo(t).createOrReplace()           |
| append(df, meta)             | df.writeTo(t).append()  (fast-append)     |
| commit_upsert(df, buckets)   | df.writeTo(t).overwritePartitions() over  |
|                              | the identity `_pb` bucket partition       |
|                              | (partition-scoped copy-on-write MERGE)    |
| read(version=N)              | spark.read.option("snapshot-id", ...)     |
| latest_meta()                | snapshot summary `graft_meta` property    |
| rollback_newer_than(r)       | CALL catalog.system.rollback_to_snapshot  |
| expire_older_than(keep)      | CALL catalog.system.expire_snapshots      |
| compact()                    | CALL catalog.system.rewrite_data_files    |
| data_file_count()            | SELECT count(*) FROM t.files              |

Round/lineage metadata rides each commit as a snapshot summary property
(`snapshot-property.graft_meta` write option), so resume semantics are
identical to the parquet backend: read the newest snapshot's meta,
continue from `meta['round']`; trailing snapshots for unacknowledged
rounds roll back by snapshot id.

Versions: the seam exposes small ordinal versions (1..n); Iceberg snapshot
ids are random longs. The mapping is ordinal over the CURRENT ancestor
lineage (parent_id walk from the head recorded in `<table>.history`), not
the raw `<table>.snapshots` listing — rollback_to_snapshot leaves orphaned
snapshots in table metadata until expire_snapshots, and those must never
count as versions or resume rounds.

Enable on a real cluster with e.g.:
    spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<v>
    spark.sql.catalog.graft=org.apache.iceberg.spark.SparkCatalog
    spark.sql.catalog.graft.type=hadoop
    spark.sql.catalog.graft.warehouse=<path>
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

META_PROP = "graft_meta"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — classpath probe
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _q(ident: str) -> str:
    """Backtick-quote each identifier part (idents come from config, never
    user data, but quoting keeps odd table names safe)."""
    return ".".join(f"`{p}`" for p in ident.split("."))


class IcebergSnapshotTable:
    """Append/commit snapshot table over an Iceberg catalog table."""

    def __init__(self, spark: SparkSession, ident: str):
        self.spark = spark
        self.ident = ident            # e.g. "graft.db.crawl_log"
        self.catalog = ident.split(".", 1)[0]

    # -- existence / snapshot bookkeeping -----------------------------------

    def _exists(self) -> bool:
        return self.spark.catalog.tableExists(self.ident)

    def _snapshots(self) -> list[dict]:
        """CURRENT-LINEAGE snapshots oldest-first: [{snapshot_id, meta}].

        `<table>.snapshots` keeps snapshots orphaned by
        rollback_to_snapshot until expire_snapshots runs, so reading it
        raw would resurface rolled-back (unacknowledged) rounds after a
        crash-recovery rollback. We therefore walk `parent_id` from the
        current head (newest `.history` row with is_current_ancestor) and
        return only that ancestor chain — orphans never appear in
        versions()/latest_meta()/read(version)."""
        if not self._exists():
            return []
        rows = self.spark.sql(
            f"SELECT snapshot_id, parent_id, committed_at, summary "
            f"FROM {_q(self.ident)}.snapshots"
        ).collect()
        if not rows:
            return []
        by_id = {int(r["snapshot_id"]): r for r in rows}
        head_rows = self.spark.sql(
            f"SELECT snapshot_id FROM {_q(self.ident)}.history "
            f"WHERE is_current_ancestor "
            f"ORDER BY made_current_at DESC, snapshot_id DESC LIMIT 1"
        ).collect()
        if head_rows:
            head = int(head_rows[0]["snapshot_id"])
        else:  # degenerate: no history rows — fall back to newest commit
            head = max(by_id, key=lambda i: (by_id[i]["committed_at"], i))
        lineage: list[dict] = []
        cur: int | None = head
        seen: set[int] = set()
        while cur is not None and cur in by_id and cur not in seen:
            seen.add(cur)
            r = by_id[cur]
            summary = dict(r["summary"] or {})
            try:
                meta = json.loads(summary.get(META_PROP, "{}"))
            except (TypeError, ValueError):
                meta = {}
            lineage.append({"snapshot_id": cur, "meta": meta})
            cur = int(r["parent_id"]) if r["parent_id"] is not None else None
        lineage.reverse()
        return lineage

    def versions(self) -> list[int]:
        return list(range(1, len(self._snapshots()) + 1))

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def latest_meta(self) -> dict:
        snaps = self._snapshots()
        return snaps[-1]["meta"] if snaps else {}

    def _writer(self, df: DataFrame, meta: dict | None):
        return df.writeTo(self.ident).option(
            f"snapshot-property.{META_PROP}", json.dumps(meta or {})
        )

    # -- the seam ------------------------------------------------------------

    def commit(self, df: DataFrame, meta: dict | None = None) -> int:
        self._writer(df, meta).using("iceberg").createOrReplace()
        return self.latest_version() or 1

    def append(self, df: DataFrame, meta: dict | None = None) -> int:
        if not self._exists():
            self._writer(df, meta).using("iceberg").create()
        else:
            self._writer(df, meta).append()
        return self.latest_version() or 1

    def read(self, spark: SparkSession, version: int | None = None
             ) -> DataFrame | None:
        snaps = self._snapshots()
        if not snaps:
            return None
        reader = spark.read.format("iceberg")
        if version is not None:
            if not 1 <= version <= len(snaps):
                return None
            reader = reader.option(
                "snapshot-id", snaps[version - 1]["snapshot_id"]
            )
        df = reader.table(self.ident)
        return df if df.limit(1).count() else None

    # -- maintenance ---------------------------------------------------------

    def rollback_newer_than(self, round_no: int) -> int:
        snaps = self._snapshots()
        removed = 0
        target = None
        for s in reversed(snaps):
            r = s["meta"].get("round")
            if r is None or int(r) <= round_no:
                target = s["snapshot_id"]
                break
            removed += 1
        if removed == 0:
            return 0
        if target is None:
            # every snapshot belongs to unacknowledged rounds: drop the table
            self.spark.sql(f"DROP TABLE IF EXISTS {_q(self.ident)}")
            return removed
        self.spark.sql(
            f"CALL {self.catalog}.system.rollback_to_snapshot"
            f"('{self.ident.split('.', 1)[1]}', {target})"
        )
        return removed

    def expire_older_than(self, keep_last: int = 3) -> None:
        if not self._exists():
            return
        self.spark.sql(
            f"CALL {self.catalog}.system.expire_snapshots"
            f"(table => '{self.ident.split('.', 1)[1]}', "
            f"retain_last => {int(keep_last)})"
        )

    def compact(self, spark: SparkSession, target_partitions: int | None = None,
                keep_last: int = 1) -> int | None:
        if not self._exists():
            return None
        spark.sql(
            f"CALL {self.catalog}.system.rewrite_data_files"
            f"(table => '{self.ident.split('.', 1)[1]}')"
        )
        self.expire_older_than(keep_last=keep_last)
        return self.latest_version()

    def data_file_count(self) -> int:
        if not self._exists():
            return 0
        return self.spark.sql(
            f"SELECT count(*) AS n FROM {_q(self.ident)}.files"
        ).collect()[0]["n"]

    def row_count_estimate(self) -> int:
        """Row count from Iceberg manifest statistics (no data scan)."""
        if not self._exists():
            return 0
        n = self.spark.sql(
            f"SELECT sum(record_count) AS n FROM {_q(self.ident)}.files"
        ).collect()[0]["n"]
        return int(n or 0)


class IcebergBucketedSnapshotTable(IcebergSnapshotTable):
    """Bucketed variant: rows carry an identity `_pb` partition column
    (pmod(key, n_buckets) — byte-identical bucketing to the parquet
    backend), and commit_upsert is `overwritePartitions`, Iceberg's
    partition-scoped copy-on-write: only the partitions present in `df`
    are replaced, untouched buckets' files are re-referenced by the new
    snapshot — the same O(changed) write bound the manifest backend
    provides."""

    def __init__(self, spark: SparkSession, ident: str, n_buckets: int,
                 key_col: str):
        super().__init__(spark, ident)
        self.n_buckets = n_buckets
        self.key_col = key_col

    def bucket_expr(self):
        return F.pmod(F.col(self.key_col), F.lit(self.n_buckets)).cast("int")

    def _with_pb(self, df: DataFrame) -> DataFrame:
        return df.withColumn("_pb", self.bucket_expr())

    def commit_upsert(self, df: DataFrame,
                      changed_buckets: list[int] | str | None = None,
                      meta: dict | None = None) -> int:
        tagged = self._with_pb(df)
        if not self._exists() or changed_buckets is None:
            (self._writer(tagged, meta).using("iceberg")
             .partitionedBy(F.col("_pb")).createOrReplace())
            return self.latest_version() or 1
        if isinstance(changed_buckets, list):
            # buckets declared changed but absent from df were EMPTIED —
            # overwritePartitions alone would leave their old rows live
            written = {r["_pb"] for r in tagged.select("_pb").distinct().collect()}
            emptied = [int(b) for b in changed_buckets if int(b) not in written]
            if emptied:
                self.spark.sql(
                    f"DELETE FROM {_q(self.ident)} WHERE _pb IN "
                    f"({', '.join(str(b) for b in emptied)})"
                )
        self._writer(tagged, meta).overwritePartitions()
        return self.latest_version() or 1

    def read(self, spark: SparkSession, version: int | None = None
             ) -> DataFrame | None:
        df = super().read(spark, version)
        return None if df is None else df.drop("_pb")

    def read_buckets(self, spark: SparkSession, buckets: list[int]
                     ) -> DataFrame | None:
        """Partition pruning: the `_pb IN (...)` predicate prunes at the
        Iceberg manifest level before any data file is opened."""
        df = super().read(spark, None)
        if df is None:
            return None
        pruned = df.filter(F.col("_pb").isin([int(b) for b in buckets]))
        return pruned.drop("_pb") if pruned.limit(1).count() else None
