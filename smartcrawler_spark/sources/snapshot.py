"""Versioned snapshot tables over parquet — the checkpoint/resume substrate.

Contract (modeled on Iceberg's snapshot semantics, which is the production
target — the sandbox has no iceberg-spark-runtime jar, so this implements
the same guarantees directly over parquet + JSON manifests):

* every commit writes a NEW immutable data directory ``data/v{N}/`` and then
  atomically publishes ``_snapshots/v{N}.json`` via write-tmp-then-rename —
  readers either see a fully published snapshot or the previous one, never
  a partial write;
* ``read()`` resolves the highest published version — a crashed writer
  leaves at most an unpublished data dir that is ignored and overwritten;
* manifests carry engine metadata (crawl round, per-partition lineage), so
  resume = read latest manifest, continue from ``meta['round']``.

On a real cluster swap this class for `df.writeTo(...)` against an Iceberg
catalog; the engine only uses commit/read/latest_meta.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


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

    # -- commit / read ------------------------------------------------------

    def commit(self, df: DataFrame, meta: dict | None = None) -> int:
        v = (self.latest_version() or 0) + 1
        data_dir = os.path.join(self.path, "data", f"v{v}")
        if os.path.exists(data_dir):  # leftover from a crashed, unpublished commit
            shutil.rmtree(data_dir)
        df.write.mode("overwrite").parquet(data_dir)
        manifest = {"version": v, "data": data_dir, "meta": meta or {}}
        tmp = self._manifest_path(v) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._manifest_path(v))  # atomic publish
        return v

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        m = self.manifest(version)
        if m is None:
            return None
        return spark.read.parquet(m["data"])

    def expire_older_than(self, keep_last: int = 3) -> None:
        """Snapshot expiration (Iceberg expire_snapshots analog)."""
        vs = self.versions()
        for v in vs[:-keep_last]:
            m = self.manifest(v)
            os.remove(self._manifest_path(v))
            if m and os.path.exists(m["data"]):
                shutil.rmtree(m["data"])
