"""Local stand-in for the driver's correctness gate: run every queries()
entry via Spark AND its oracle_sql() via DuckDB at a given sf, compare
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_entry.py [sf_dir] [query ...]
       python tools/check_entry.py --json OUT.json [sf_dir]   # full-gate artifact

The --json artifact (VERDICT r04 item 3) records every gate's rows /
columns / hash verdict so rounds carry 98/98 local evidence even when
the driver samples a subset.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as E
from smartcrawler_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def value_hash(rows: list[dict], cols: list[str]) -> str:
    cols = sorted(cols)
    canon = sorted(
        tuple(repr(r[c]) for c in cols) for r in rows
    )
    h = hashlib.sha256()
    for t in canon:
        h.update("\x1f".join(t).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main():
    import json
    import time

    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records: dict[str, dict] = {}
    t_start = time.time()
    spark = get_spark(app_name="check-entry", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
            scols = sdf.columns
        except Exception as ex:
            failures.append(name)
            records[name] = {"status": "spark_error",
                             "error": f"{type(ex).__name__}: {ex}"[:300]}
            print(f"FAIL  {name}: spark error {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            records[name] = {"status": "rows_only", "rows": len(srows)}
            print(f"ROWS  {name}: {len(srows)} rows (rows-only check, no oracle)")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = [dict(zip(dcols, row)) for row in cur.fetchall()]  # native types
        except Exception as ex:
            failures.append(name)
            records[name] = {"status": "duckdb_error", "error": str(ex)[:300]}
            print(f"FAIL  {name}: duckdb error {ex}")
            continue
        ok_count = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh = value_hash(srows, scols) if ok_cols else "-"
        dh = value_hash(drows, dcols) if ok_cols else "-"
        ok_hash = sh == dh
        status = "OK  " if (ok_count and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        records[name] = {"status": "ok" if status == "OK  " else "fail",
                         "rows": len(srows), "oracle_rows": len(drows),
                         "cols_ok": ok_cols, "hash": sh, "oracle_hash": dh,
                         "hash_ok": ok_hash}
        print(f"{status}  {name}: rows {len(srows)}/{len(drows)} cols_ok={ok_cols} hash {sh}/{dh}")
        if status == "FAIL" and ok_cols:
            # show first differing rows for debugging
            sset = {tuple(repr(r[c]) for c in sorted(scols)) for r in srows}
            dset = {tuple(repr(r[c]) for c in sorted(dcols)) for r in drows}
            for t in list(sset - dset)[:3]:
                print("   spark-only:", t)
            for t in list(dset - sset)[:3]:
                print("   duck-only: ", t)
    print("FAILURES:", failures or "none")
    if json_out:
        n_ok = sum(1 for r in records.values() if r["status"] == "ok")
        with open(json_out, "w") as f:
            json.dump({
                "metric": "full driver-gate verification (every queries() "
                          "entry vs its DuckDB oracle: rows + columns + "
                          "order-insensitive value hash)",
                "sf_dir": sf_dir,
                "n_gates": len(records),
                "n_ok": n_ok,
                "n_rows_only": sum(1 for r in records.values()
                                   if r["status"] == "rows_only"),
                "failures": failures,
                "wall_s": round(time.time() - t_start, 1),
                "gates": records,
            }, f, indent=1)
        print(f"wrote {json_out}: {n_ok}/{len(records)} ok")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
