#!/usr/bin/env python
"""Generate an N-x scaled replica of an sf testdata directory (guide §1:
measure at a scale where super-linear behavior is visible BEFORE the driver
does). Pure pyarrow — no Spark. Each table is concatenated N times with
consistent per-key-domain offsets so joins keep their structure (an order's
lineitems follow it into the same copy); dimension tables (nation, region)
are copied once. Text/embedding payloads are replicated verbatim — the
driver's own generator also produces heavy cross-row collisions, and r6
measurements with this replica tracked the driver's sf1.0 numbers.

Usage: python tools/gen_scaled_sf.py --src /root/testdata/sf0.1 \
           --dst /root/testdata_x10/sf1.0 --mult 10
"""
from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key domains that must shift consistently across tables
DOMAINS = {
    "orderkey": [("orders.parquet", "o_orderkey"), ("lineitem.parquet", "l_orderkey")],
    "custkey": [("customer.parquet", "c_custkey"), ("orders.parquet", "o_custkey")],
    "partkey": [("part.parquet", "p_partkey"), ("lineitem.parquet", "l_partkey")],
    "suppkey": [("supplier.parquet", "s_suppkey"), ("lineitem.parquet", "l_suppkey")],
    "docid": [("documents.parquet", "doc_id")],
    "vecid": [("embeddings.parquet", "vec_id")],
    "eventid": [("events.parquet", "event_id")],
    "userid": [("events.parquet", "user_id")],
}
DIM_TABLES = {"nation.parquet", "region.parquet"}


def _pow10_above(x: int) -> int:
    p = 1
    while p <= x:
        p *= 10
    return p


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)

    tables = {f: pq.read_table(os.path.join(args.src, f))
              for f in sorted(os.listdir(args.src)) if f.endswith(".parquet")}

    # one offset quantum per domain: next power of 10 above the domain max
    quantum: dict[str, int] = {}
    for dom, cols in DOMAINS.items():
        mx = 0
        for fname, col in cols:
            if fname in tables:
                m = pc.max(tables[fname][col]).as_py()
                mx = max(mx, int(m or 0))
        quantum[dom] = _pow10_above(mx)

    col_quantum: dict[tuple[str, str], int] = {}
    for dom, cols in DOMAINS.items():
        for fname, col in cols:
            col_quantum[(fname, col)] = quantum[dom]

    for fname, tbl in tables.items():
        out_path = os.path.join(args.dst, fname)
        if fname in DIM_TABLES:
            pq.write_table(tbl, out_path)
            print(f"{fname}: dim, copied 1x ({tbl.num_rows} rows)")
            continue
        copies = []
        for i in range(args.mult):
            t = tbl
            for ci, name in enumerate(t.column_names):
                q = col_quantum.get((fname, name))
                if q and i > 0:
                    shifted = pc.add(t[name], pa.scalar(i * q, type=t[name].type))
                    t = t.set_column(ci, name, shifted)
            copies.append(t)
        out = pa.concat_tables(copies)
        pq.write_table(out, out_path)
        print(f"{fname}: {tbl.num_rows} -> {out.num_rows} rows")
    # bench.py checks for the _DONE sentinel in some tiers; mirror it
    open(os.path.join(args.dst, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
