"""Versioned snapshot tables over parquet — the checkpoint/resume substrate.

Contract (modeled on Iceberg's snapshot semantics, which is the production
target — the sandbox has no iceberg-spark-runtime jar, so this implements
the same guarantees directly over parquet + JSON manifests):

* every commit writes NEW immutable data files and then atomically
  publishes ``_snapshots/v{N}.json`` via write-tmp-then-rename — readers
  either see a fully published snapshot or the previous one, never a
  partial write;
* ``read()`` resolves the highest published version — a crashed writer
  leaves at most an unpublished data dir that is ignored and overwritten;
* manifests carry engine metadata (crawl round, per-partition lineage), so
  resume = read latest manifest, continue from ``meta['round']``.

Two write shapes, both O(changed) — the property Iceberg's manifest reuse
buys and the reason a 10^10-row frontier is commit-able per round:

* ``SnapshotTable.append(df)`` — the new manifest references all previous
  data dirs plus one new dir holding ONLY this commit's rows (Iceberg
  fast-append).  Used for the crawl_log / metrics streams: per-round bytes
  written scale with the round's rows, not the table's history.
* ``BucketedSnapshotTable.commit_upsert(df, changed_buckets)`` — the table
  is hash-bucketed on a key column; a commit rewrites only the buckets
  that changed and the manifest re-references the previous version's files
  for every untouched bucket (Iceberg MERGE INTO with partition-scoped
  copy-on-write).  Used for the frontier (buckets touched by this round's
  scheduled+admitted URLs) and the bloom/cuckoo filter-blob table.

On a real cluster swap these classes for ``df.writeTo(...)`` /
``MERGE INTO`` against an Iceberg catalog; the engine only uses
commit/append/commit_upsert/read/latest_meta.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _has_parquet_files(path: str) -> bool:
    """True if the dir contains at least one parquet part file (an empty
    DataFrame writes only _SUCCESS, which spark.read.parquet rejects)."""
    try:
        return any(f.endswith(".parquet") for f in os.listdir(path))
    except FileNotFoundError:
        return False


class SnapshotTable:
    def __init__(self, root: str, name: str):
        self.path = os.path.join(root, name)
        self.snap_dir = os.path.join(self.path, "_snapshots")
        os.makedirs(self.snap_dir, exist_ok=True)

    # -- version bookkeeping ------------------------------------------------

    def versions(self) -> list[int]:
        out = []
        for f in os.listdir(self.snap_dir):
            if f.startswith("v") and f.endswith(".json"):
                try:
                    out.append(int(f[1:-5]))
                except ValueError:
                    pass
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest_path(self, v: int) -> str:
        return os.path.join(self.snap_dir, f"v{v}.json")

    def manifest(self, v: int | None = None) -> dict | None:
        v = v if v is not None else self.latest_version()
        if v is None:
            return None
        with open(self._manifest_path(v)) as f:
            return json.load(f)

    def latest_meta(self) -> dict:
        m = self.manifest()
        return (m or {}).get("meta", {})

    def _publish(self, manifest: dict) -> int:
        v = manifest["version"]
        tmp = self._manifest_path(v) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._manifest_path(v))  # atomic publish
        return v

    def _next_data_dir(self, v: int) -> str:
        data_dir = os.path.join(self.path, "data", f"v{v}")
        if os.path.exists(data_dir):  # leftover from a crashed, unpublished commit
            shutil.rmtree(data_dir)
        return data_dir

    # -- commit / append / read ----------------------------------------------

    def commit(self, df: DataFrame, meta: dict | None = None) -> int:
        """Full-replace commit: the new version's data is exactly `df`."""
        v = (self.latest_version() or 0) + 1
        data_dir = self._next_data_dir(v)
        df.write.mode("overwrite").parquet(data_dir)
        return self._publish({"version": v, "data": data_dir, "meta": meta or {}})

    def append(self, df: DataFrame, meta: dict | None = None) -> int:
        """Fast-append commit: write ONLY `df`'s rows; the manifest carries
        the previous version's data dirs plus the new one.  Per-commit I/O
        is O(|df|) regardless of table history — this is what keeps the
        crawl_log write path linear over a long crawl (the round-1 design
        re-wrote the whole history every round)."""
        v = (self.latest_version() or 0) + 1
        data_dir = self._next_data_dir(v)
        df.write.mode("overwrite").parquet(data_dir)
        dirs = list(self._data_dirs(self.manifest()))
        if _has_parquet_files(data_dir):
            dirs.append(data_dir)
        return self._publish({"version": v, "data_dirs": dirs, "meta": meta or {}})

    @staticmethod
    def _data_dirs(m: dict | None) -> list[str]:
        if m is None:
            return []
        if "data_dirs" in m:
            return m["data_dirs"]
        return [m["data"]] if "data" in m else []

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        m = self.manifest(version)
        if m is None:
            return None
        dirs = [d for d in self._data_dirs(m) if _has_parquet_files(d)]
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def expire_older_than(self, keep_last: int = 3) -> None:
        """Snapshot expiration (Iceberg expire_snapshots analog): drop old
        manifests, then any data dir no kept manifest references."""
        vs = self.versions()
        keep, drop = vs[-keep_last:], vs[:-keep_last]
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self._data_dirs(self.manifest(v)))
        for v in drop:
            m = self.manifest(v)
            os.remove(self._manifest_path(v))
            for d in self._data_dirs(m):
                if d not in referenced and os.path.exists(d):
                    shutil.rmtree(d)

    def _manifest_dirs(self, m: dict | None) -> list[str]:
        """Every data dir a manifest references (storage-layout specific)."""
        return self._data_dirs(m)

    def rollback_newer_than(self, round_no: int) -> int:
        """Crash recovery: delete trailing versions whose lineage round is
        NEWER than `round_no`. A round's commits land log/metrics/filters
        first and the frontier LAST (the resume authority) — if the process
        dies in between, the side tables hold rows for a round the frontier
        never acknowledged; on resume those versions are trimmed and the
        round re-runs deterministically. Returns versions removed."""
        removed = 0
        while True:
            v = self.latest_version()
            if v is None:
                break
            m = self.manifest(v)
            r = (m.get("meta") or {}).get("round")
            if r is None or int(r) <= round_no:
                break
            os.remove(self._manifest_path(v))
            referenced: set[str] = set()
            for vv in self.versions():
                referenced.update(self._manifest_dirs(self.manifest(vv)))
            for d in self._manifest_dirs(m):
                if d not in referenced and os.path.exists(d):
                    shutil.rmtree(d)
            removed += 1
        return removed

    def compact(self, spark: SparkSession, target_partitions: int | None = None,
                keep_last: int = 1) -> int | None:
        """Small-files compaction (Iceberg rewrite_data_files analog).

        An append-only table accumulates one data dir per commit — after
        thousands of crawl rounds / micro-batches the read path opens
        thousands of small parquet files, the classic small-files failure
        mode at scale.  `compact` rewrites the CURRENT contents as one new
        full commit (optionally coalesced to `target_partitions` files),
        then expires everything older, so reads are one dir again while
        readers of already-published versions stay correct (their manifests
        and files persist until expiration).  Returns the new version, or
        None for an empty table."""
        df = self.read(spark)
        if df is None:
            return None
        if target_partitions:
            df = df.coalesce(target_partitions)
        # materialize into the NEW version's dir first; expiration below
        # drops the old dirs only after the manifest is published
        v = self.commit(df, meta={**self.latest_meta(), "compacted": True})
        self.expire_older_than(keep_last=keep_last)
        return v

    def data_file_count(self) -> int:
        """Number of parquet part files the current version's read opens."""
        n = 0
        for d in self._data_dirs(self.manifest()):
            try:
                n += sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
            except FileNotFoundError:
                pass
        return n

    def row_count_estimate(self) -> int:
        """Exact current row count from parquet FOOTERS only (no data scan,
        no Spark job) — the cheap size signal the crawl loop's adaptive
        bloom policy keys on. Iceberg keeps the same number in its manifest
        statistics (`SELECT sum(record_count) FROM t.files`)."""
        import pyarrow.parquet as pq

        n = 0
        for d in self._manifest_dirs(self.manifest()):
            try:
                files = os.listdir(d)
            except FileNotFoundError:
                continue
            for f in files:
                if f.endswith(".parquet"):
                    n += pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
        return n


class BucketedSnapshotTable(SnapshotTable):
    """Hash-bucketed snapshot table with partition-scoped upsert.

    Rows are bucketed by ``pmod(key_col, n_buckets)``; each version's
    manifest maps bucket id -> the data dir holding that bucket's rows.
    ``commit_upsert`` writes ONLY the changed buckets' rows and re-points
    every untouched bucket at the previous version's files — per-commit
    bytes written scale with the changed rows, not the table size.  This
    is the parquet-manifest expression of Iceberg ``MERGE INTO`` with
    partition-level copy-on-write, matching the reference's per-round
    status transitions (/root/reference/src/storage.rs:101-117) without
    rewriting the 10^10-row frontier each round.

    ``read_buckets`` gives manifest-level partition pruning: a round's
    merge reads only the bucket dirs its scheduled+admitted URLs live in.
    """

    def __init__(self, root: str, name: str, n_buckets: int, key_col: str):
        super().__init__(root, name)
        self.n_buckets = n_buckets
        self.key_col = key_col

    def bucket_expr(self):
        return F.pmod(F.col(self.key_col), F.lit(self.n_buckets)).cast("int")

    def _buckets_map(self, m: dict | None) -> dict[int, str]:
        if not m:
            return {}
        return {int(b): p for b, p in m.get("buckets", {}).items() if p}

    def _manifest_dirs(self, m: dict | None) -> list[str]:
        return list(self._buckets_map(m).values())

    def commit_upsert(self, df: DataFrame,
                      changed_buckets: list[int] | str | None = None,
                      meta: dict | None = None) -> int:
        """Commit `df` as the FULL new content of `changed_buckets`
        (None = full-table replace; the string "written" = whichever
        buckets `df` actually produced rows for — valid when a changed
        bucket can never become empty).  `df` must contain only rows whose
        bucket is in `changed_buckets`."""
        prev = self.manifest()
        if prev is not None and prev.get("n_buckets") not in (None, self.n_buckets):
            raise ValueError(
                f"bucket count mismatch: table has {prev.get('n_buckets')}, "
                f"engine configured {self.n_buckets}"
            )
        v = (self.latest_version() or 0) + 1
        data_dir = self._next_data_dir(v)
        (
            df.withColumn("_pb", self.bucket_expr())
            .write.mode("overwrite").partitionBy("_pb").parquet(data_dir)
        )
        written = {
            int(d.split("=", 1)[1]): os.path.join(data_dir, d)
            for d in os.listdir(data_dir)
            if d.startswith("_pb=")
        }
        if changed_buckets == "written":
            changed_buckets = list(written)
        if changed_buckets is None:
            buckets = written
        else:
            buckets = self._buckets_map(prev)
            for b in changed_buckets:
                if b in written:
                    buckets[int(b)] = written[b]
                else:
                    buckets.pop(int(b), None)  # bucket emptied by this commit
        manifest = {
            "version": v,
            "n_buckets": self.n_buckets,
            "buckets": {str(b): p for b, p in sorted(buckets.items())},
            "meta": meta or {},
        }
        return self._publish(manifest)

    def _bucket_dirs(self, version: int | None = None,
                     buckets: list[int] | None = None) -> list[str]:
        bmap = self._buckets_map(self.manifest(version))
        if buckets is not None:
            bmap = {b: p for b, p in bmap.items() if b in set(buckets)}
        return [p for p in bmap.values() if _has_parquet_files(p)]

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        dirs = self._bucket_dirs(version)
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def read_buckets(self, spark: SparkSession, buckets: list[int]
                     ) -> DataFrame | None:
        """Read only the named buckets' dirs — manifest-level partition
        pruning for the per-round merge."""
        dirs = self._bucket_dirs(buckets=buckets)
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def compact(self, spark: SparkSession, target_partitions: int | None = None,
                keep_last: int = 1) -> int | None:
        """Full-table rewrite into one fresh version (every bucket gets one
        new dir), then expire superseded versions' dirs. The bucketed READ
        path never accumulates small files (each bucket points at its
        latest dir), so this reclaims disk from superseded bucket dirs and
        re-chunks buckets whose files fragmented across many upserts."""
        df = self.read(spark)
        if df is None:
            return None
        v = self.commit_upsert(df, changed_buckets=None,
                               meta={**self.latest_meta(), "compacted": True})
        self.expire_older_than(keep_last=keep_last)
        return v

    def expire_older_than(self, keep_last: int = 3) -> None:
        vs = self.versions()
        keep, drop = vs[-keep_last:], vs[:-keep_last]
        referenced: set[str] = set()
        for v in keep:
            referenced.update(self._buckets_map(self.manifest(v)).values())
        for v in drop:
            m = self.manifest(v)
            os.remove(self._manifest_path(v))
            for p in self._buckets_map(m).values():
                if p not in referenced and os.path.exists(p):
                    shutil.rmtree(p)
        # sweep version dirs left with no data (only _SUCCESS markers /
        # empty shells remain once their bucket dirs were reclaimed)
        data_root = os.path.join(self.path, "data")
        if os.path.isdir(data_root):
            for d in os.listdir(data_root):
                full = os.path.join(data_root, d)
                if not os.path.isdir(full):
                    continue
                has_data = any(
                    f.endswith(".parquet")
                    for _, _, files in os.walk(full) for f in files
                )
                if not has_data:
                    shutil.rmtree(full)
