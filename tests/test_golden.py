"""Golden-parquet oracle invariants (tools/gen_golden.py).

The driver gates `dedup_minhash` / `dedup_simhash` / `ann_lsh` / `ann_ivf`
against golden parquet computed by an independent pure-Python/numpy oracle.
Two invariants keep that gate honest:

1. ORACLE == KERNEL: the generator's pure-Python re-implementation must be
   bit-exact against the production Spark kernels — checked here on the
   sf0.001 tables (different data than the sf0.01 goldens, so the logic is
   validated, not the fixture).
2. FIXTURE FRESHNESS: the committed golden files must equal a fresh
   regeneration over the sf0.01 driver tables (catches stale fixtures
   after testdata or parameter changes).
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import gen_golden as G  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD_DIR = os.path.join(REPO, "fixtures", "golden")
SF001 = "/root/testdata/sf0.01"


def _spark_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _table_rows(t, cols):
    return sorted(tuple(r[c] for c in cols) for r in t.to_pylist())


@pytest.mark.parametrize("name,cols", [
    ("dedup_minhash", ["doc_id"]),
    ("dedup_simhash", ["a", "b", "hamming"]),
    ("ann_lsh", ["vec_id", "sim"]),
    ("ann_ivf", ["vec_id", "sim"]),
    ("embedding_near_dup_lsh", ["a", "b", "sim"]),
    ("audio_stream_info", ["media_ref", "codec", "sample_rate", "channels",
                           "duration_ms", "bitrate_kbps", "n_frames"]),
    ("mp3_decode", ["media_ref", "sample_rate", "channels", "n_samples",
                    "line0", "line1"]),
    ("cdc_chunks", ["media_ref", "chunk_idx", "offset", "length", "fp"]),
    ("image_stream_info", ["media_ref", "format", "width", "height",
                           "bit_depth", "n_frames", "progressive",
                           "orientation"]),
    ("charset_decode", ["case_id", "text", "encoding"]),
    ("image_dhash", ["media_ref", "dhash", "width", "height"]),
    ("image_dhash_pairs", ["ref_a", "ref_b", "hamming"]),
])
def test_generator_matches_kernel_on_other_sf(spark, sf_dir, name, cols):
    import __spark_entry__ as E

    got = _spark_rows(E.queries()[name](spark, sf_dir), cols)
    want = _table_rows(G.GOLDENS[name](sf_dir), cols)
    assert got == want, f"{name}: oracle != kernel at {sf_dir}"


@pytest.mark.parametrize("name", list(G.GOLDENS))
def test_committed_golden_is_fresh(name):
    committed = pq.read_table(os.path.join(GOLD_DIR, f"{name}.parquet"))
    fresh = G.GOLDENS[name](SF001)
    assert committed.schema == fresh.schema, f"{name}: schema drift"
    assert committed.to_pylist() == fresh.to_pylist(), (
        f"{name}: committed golden is stale — rerun `python tools/gen_golden.py`"
    )
