#!/usr/bin/env python3
"""Golden-parquet oracles for the four production (numpy/blake2b) kernels.

The driver's DuckDB gate needs SQL it can run — but `dedup_minhash`,
`dedup_simhash`, `ann_lsh` and `ann_ivf` hash with blake2b / seeded numpy
hyperplanes, which no SQL engine reproduces. Their algorithm SPECS are
already oracle-gated through the md5/integer portable twins
(`minhash_lsh_portable`, `simhash_portable`, `ann_lsh_portable`,
`ann_ivf_portable`); THIS tool closes the remaining gap for the production
kernels themselves: it recomputes each kernel's expected output with an
INDEPENDENT pure-Python/numpy implementation (no pyspark, no
smartcrawler_spark imports — the same re-derivation standard as the pytest
oracles in tests/test_dedup.py / tests/test_similarity.py) over the fixed
sf0.01 driver tables, and materializes the result as golden parquet. The
driver gate then becomes `SELECT * FROM read_parquet(golden)` — a full
rows+schema+hash check of the production kernel against an independent
implementation (VERDICT r02 next-step 1: the template_detect trick,
extended to fixtures).

Bit-exactness notes (each replicates a documented engine-side coercion):
* Spark `l2_norm` over array<float> multiplies v*v in FLOAT32 (FloatType x
  FloatType -> FloatType) before accumulating in double; the dot product
  against the double query literal promotes per-element to double.
* Spark `round(x, 6)` on doubles goes through BigDecimal(Double.toString)
  with HALF_UP — identical to Decimal(repr(x)).quantize(..., ROUND_HALF_UP)
  in Python (both use the shortest decimal representation).
* LSH/IVF matmuls run float32 numpy in the engine's Arrow UDF; the oracle
  uses the same dtype and op shapes, and `tests/test_golden.py` asserts
  generator == Spark output so any BLAS/batching divergence fails loudly.

Regenerate with:  python tools/gen_golden.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import hashlib
import math
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

M31 = (1 << 31) - 1


def _blake8(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def _load(sf_dir: str, table: str):
    return pq.read_table(f"{sf_dir}/{table}.parquet")


# ---------------------------------------------------------------------------
# dedup_minhash: survivors of MinHash-LSH banding (operators/dedup.py
# minhash_dedup; num_perm=64, bands=16, shingle_n=3, seed=7, doc_id < 1000)
# ---------------------------------------------------------------------------


def golden_dedup_minhash(sf_dir: str, num_perm=64, bands=16, shingle_n=3,
                         seed=7, max_doc=1000) -> pa.Table:
    t = _load(sf_dir, "documents")
    docs = [
        (int(i), s if s is not None else "")
        for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        if int(i) < max_doc
    ]
    rng = np.random.default_rng(seed)
    a = rng.integers(1, M31, num_perm, dtype=np.uint64)
    b = rng.integers(0, M31, num_perm, dtype=np.uint64)
    r = num_perm // bands
    sigs: dict[int, tuple] = {}
    for doc_id, text in docs:
        toks = text.lower().split()
        if not toks:
            sh = set()
        elif len(toks) < shingle_n:
            sh = {" ".join(toks)}
        else:
            sh = {" ".join(toks[i:i + shingle_n])
                  for i in range(len(toks) - shingle_n + 1)}
        if not sh:
            sig = (0,) * num_perm
        else:
            arr = np.fromiter((_blake8(s) & M31 for s in sh),
                              dtype=np.uint64, count=len(sh))
            sig = tuple(
                ((arr[:, None] * a[None, :] + b[None, :]) % np.uint64(M31))
                .min(axis=0).astype(np.int64).tolist()
            )
        sigs[doc_id] = sig
    # group-min per (band, band-slice): grouping on the slice VALUES is the
    # same partition the engine's xxhash64(to_json(slice)) bucket induces
    # (the hash only renames the group key)
    gmin: dict[tuple, int] = {}
    for d, sig in sigs.items():
        for bi in range(bands):
            key = (bi, sig[bi * r:(bi + 1) * r])
            if key not in gmin or d < gmin[key]:
                gmin[key] = d
    survivors = sorted(
        d for d, sig in sigs.items()
        if all(gmin[(bi, sig[bi * r:(bi + 1) * r])] == d for bi in range(bands))
    )
    return pa.table({"doc_id": pa.array(survivors, pa.int64())})


# ---------------------------------------------------------------------------
# dedup_simhash: chunk-collision candidate pairs with Hamming <= 6
# (operators/dedup.py simhash_candidate_pairs; seed=11 blake2b bits)
# ---------------------------------------------------------------------------


def _simhash64(text: str) -> int:
    toks = text.lower().split()
    if not toks:
        return 0
    votes = [0] * 64
    for w in toks:
        h = _blake8(w)
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    v = 0
    for i in range(64):
        if votes[i] > 0:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def golden_dedup_simhash(sf_dir: str, max_hamming=6, max_doc=1000) -> pa.Table:
    t = _load(sf_dir, "documents")
    docs = [
        (int(i), s if s is not None else "")
        for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
        if int(i) < max_doc
    ]
    sig = {d: _simhash64(s) for d, s in docs}
    buckets: dict[tuple, list[int]] = {}
    for d, v in sig.items():
        u = v & ((1 << 64) - 1)
        for c in range(4):
            buckets.setdefault((c, (u >> (16 * c)) & 0xFFFF), []).append(d)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i, da in enumerate(ids):
            for db in ids[i + 1:]:
                ua, ub = sig[da] & ((1 << 64) - 1), sig[db] & ((1 << 64) - 1)
                ham = bin(ua ^ ub).count("1")
                if ham <= max_hamming:
                    pairs.add((da, db, ham))
    rows = sorted(pairs)
    return pa.table({
        "a": pa.array([r[0] for r in rows], pa.int64()),
        "b": pa.array([r[1] for r in rows], pa.int64()),
        "hamming": pa.array([r[2] for r in rows], pa.int32()),
    })


# ---------------------------------------------------------------------------
# shared: Spark-coercion-faithful cosine + HALF_UP rounding
# ---------------------------------------------------------------------------


def _round6(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def _spark_cosine(vec_f32: np.ndarray, q: list[float]) -> float:
    dot = 0.0
    for xv, yv in zip(vec_f32.tolist(), q):  # f32 widened exactly to double
        dot += xv * yv
    na = 0.0
    for xv in vec_f32:  # v*v in FLOAT32 first (FloatType x FloatType)
        na += float(np.float32(xv) * np.float32(xv))
    nb = 0.0
    for yv in q:
        nb += yv * yv
    return _round6(dot / (math.sqrt(na) * math.sqrt(nb)))


def _embeddings(sf_dir: str):
    t = _load(sf_dir, "embeddings")
    ids = [int(i) for i in t["vec_id"].to_pylist()]
    vecs = [np.asarray(v, dtype=np.float32) for v in t["embedding"].to_pylist()]
    return ids, vecs


# ---------------------------------------------------------------------------
# ann_lsh: hyperplane-LSH candidates + exact rerank (operators/similarity.py
# cosine_topk_lsh; k=10, bits=4, tables=16, seed=5, query = vec_id 0)
# ---------------------------------------------------------------------------


def golden_ann_lsh(sf_dir: str, k=10, bits=4, tables=16, seed=5) -> pa.Table:
    ids, vecs = _embeddings(sf_dir)
    dim = len(vecs[0])
    planes = np.random.default_rng(seed).standard_normal(
        (tables, bits, dim)).astype(np.float32)
    qv = vecs[ids.index(0)]
    q = [float(x) for x in qv]
    weights = 1 << np.arange(bits, dtype=np.int64)
    mat = np.stack(vecs)  # float32, all rows at once (engine batches match;
    # tests/test_golden.py asserts equality so any divergence fails loudly)
    sigs = np.zeros((len(ids), tables), dtype=np.int64)
    for ti, plane in enumerate(planes):
        sigs[:, ti] = ((mat @ plane.T) > 0) @ weights
    qb = [int(((plane @ np.asarray(q, dtype=np.float32)) > 0) @ weights)
          for plane in planes]
    cand = [i for i, vid in enumerate(ids)
            if any(int(sigs[i, t]) == qb[t] for t in range(tables))]
    scored = sorted(
        ((-_spark_cosine(vecs[i], q), ids[i]) for i in cand)
    )[:k]
    return pa.table({
        "vec_id": pa.array([vid for _, vid in scored], pa.int64()),
        "sim": pa.array([-s for s, _ in scored], pa.float64()),
    })


# ---------------------------------------------------------------------------
# ann_ivf: coarse-cell probe + exact rerank (operators/similarity.py
# cosine_topk_ivf; k=10, n_centroids=32, nprobe=16, seed=13, query vec_id 0)
# ---------------------------------------------------------------------------


def golden_ann_ivf(sf_dir: str, k=10, n_centroids=32, nprobe=16,
                   seed=13) -> pa.Table:
    ids, vecs = _embeddings(sf_dir)
    dim = len(vecs[0])
    c = np.random.default_rng(seed).standard_normal(
        (n_centroids, dim)).astype(np.float32)
    cents = c / np.linalg.norm(c, axis=1, keepdims=True)
    qv = vecs[ids.index(0)]
    q = [float(x) for x in qv]
    qf = np.asarray(q, dtype=np.float32)
    qn = qf / (np.linalg.norm(qf) or 1.0)
    probes = set(np.argsort(-(cents @ qn))[:nprobe].tolist())
    mat = np.stack(vecs)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cells = (mat / norms @ cents.T).argmax(axis=1)
    cand = [i for i in range(len(ids)) if int(cells[i]) in probes]
    scored = sorted(
        ((-_spark_cosine(vecs[i], q), ids[i]) for i in cand)
    )[:k]
    return pa.table({
        "vec_id": pa.array([vid for _, vid in scored], pa.int64()),
        "sim": pa.array([-s for s, _ in scored], pa.float64()),
    })


# ---------------------------------------------------------------------------
# embedding_near_dup_lsh: the PRODUCTION near-dup path (operators/similarity.py
# embedding_near_dup_pairs) — LSH bucket self-join candidates + exact cosine
# verify; threshold=0.3, bits=4, tables=8, seed=5 (udf default), all vec_ids.
# This gates the bucketed plan itself, not a brute-force subset stand-in.
# ---------------------------------------------------------------------------


def _spark_cosine_ff(va: np.ndarray, vb: np.ndarray) -> float:
    """cosine() on TWO array<float> columns: elementwise products round to
    FLOAT32 (FloatType x FloatType -> FloatType) then accumulate left-to-
    right in double (aggregate's 0.0 init promotes acc)."""
    dot = 0.0
    for p in (va * vb).tolist():
        dot += p
    na = 0.0
    for p in (va * va).tolist():
        na += p
    nb = 0.0
    for p in (vb * vb).tolist():
        nb += p
    return _round6(dot / (math.sqrt(na) * math.sqrt(nb)))


def golden_embedding_near_dup_lsh(sf_dir: str, threshold=0.3, bits=4,
                                  tables=8, seed=5) -> pa.Table:
    ids, vecs = _embeddings(sf_dir)
    dim = len(vecs[0])
    planes = np.random.default_rng(seed).standard_normal(
        (tables, bits, dim)).astype(np.float32)
    weights = 1 << np.arange(bits, dtype=np.int64)
    mat = np.stack(vecs)  # float32, all rows (see batching note up top)
    sigs = np.zeros((len(ids), tables), dtype=np.int64)
    for ti, plane in enumerate(planes):
        sigs[:, ti] = ((mat @ plane.T) > 0) @ weights
    buckets: dict[tuple, list[int]] = {}
    for i in range(len(ids)):
        for t in range(tables):
            buckets.setdefault((t, int(sigs[i, t])), []).append(i)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        for xi, i in enumerate(members):
            for j in members[xi + 1:]:
                a, b = (i, j) if ids[i] < ids[j] else (j, i)
                cand.add((a, b))
    rows = []
    for i, j in cand:
        sim = _spark_cosine_ff(vecs[i], vecs[j])
        if sim >= threshold:
            rows.append((ids[i], ids[j], sim))
    rows.sort()
    return pa.table({
        "a": pa.array([r[0] for r in rows], pa.int64()),
        "b": pa.array([r[1] for r in rows], pa.int64()),
        "sim": pa.array([r[2] for r in rows], pa.float64()),
    })




# ---------------------------------------------------------------------------
# audio_stream_info: header-only stream metadata over synthesized compressed
# audio containers (multimodal.audio_stream_info_table). Expected values are
# re-derived HERE from the public specs' framing arithmetic (ISO 11172-3
# frame-length formulas, RFC 3533 Ogg lacing, FLAC STREAMINFO, RIFF sizes) —
# the parser under test is never imported, so a parser bug cannot leak into
# its own oracle. The case list is mirrored literally in __spark_entry__
# (q_audio_stream_info); test_golden.py keeps the two in lockstep.
# ---------------------------------------------------------------------------

AUDIO_INFO_CASES = [
    ("a01.mp3", "mp3", dict(version=1, layer=3, kbps=128, rate=44100, ch=2, n=38, xing=False)),
    ("a02.mp3", "mp3", dict(version=2, layer=3, kbps=64, rate=22050, ch=1, n=50, xing=False)),
    ("a03.mp3", "mp3", dict(version=1, layer=2, kbps=192, rate=48000, ch=2, n=20, xing=False)),
    ("a04.mp3", "mp3", dict(version=1, layer=1, kbps=256, rate=32000, ch=2, n=20, xing=False)),
    ("a05.mp3", "mp3", dict(version=2.5, layer=3, kbps=16, rate=8000, ch=1, n=12, xing=False)),
    ("a06.mp3", "mp3", dict(version=1, layer=3, kbps=128, rate=44100, ch=2, n=100, xing=True)),
    ("a07.opus", "ogg", dict(codec="opus", rate=48000, ch=2, n_pages=4, spp=48000, preskip=312, body=420)),
    ("a08.opus", "ogg", dict(codec="opus", rate=24000, ch=1, n_pages=6, spp=12000, preskip=104, body=200)),
    ("a09.ogg", "ogg", dict(codec="vorbis", rate=44100, ch=1, n_pages=3, spp=44100, body=420)),
    ("a10.ogg", "ogg", dict(codec="vorbis", rate=11025, ch=2, n_pages=5, spp=5000, body=300)),
    ("a11.flac", "flac", dict(rate=96000, ch=2, bps=24, total=480000, frame_bytes=4096)),
    ("a12.flac", "flac", dict(rate=44100, ch=1, bps=16, total=44100, frame_bytes=1000)),
    ("a13.wav", "wav", dict(rate=8000, n=8000)),
    ("a14.bin", "junk", dict()),
]


def golden_audio_stream_info(sf_dir: str) -> pa.Table:  # sf-independent
    rows = []
    for ref, kind, p in AUDIO_INFO_CASES:
        if kind == "mp3":
            spf = 384 if p["layer"] == 1 else (
                1152 if (p["layer"] == 2 or p["version"] == 1) else 576)
            if p["layer"] == 1:
                flen = (12 * p["kbps"] * 1000 // p["rate"]) * 4
            else:
                flen = spf // 8 * p["kbps"] * 1000 // p["rate"]
            n_disk = p["n"] + (1 if p["xing"] else 0)  # Xing frame is extra
            dur = round(p["n"] * spf * 1000 / p["rate"])
            rows.append((ref, "mp3", p["rate"], p["ch"], dur,
                         n_disk * flen * 8 // max(dur, 1), p["n"]))
        elif kind == "ogg":
            id_len = 19 if p["codec"] == "opus" else 30
            page0 = 27 + 1 + id_len  # BOS page: 1 lacing segment
            nseg = p["body"] // 255 + 1  # RFC 3533 lacing for one packet
            total = page0 + p["n_pages"] * (27 + nseg + p["body"])
            gr = 48000 if p["codec"] == "opus" else p["rate"]
            dur = round(p["n_pages"] * p["spp"] * 1000 / gr)
            rows.append((ref, "ogg-" + p["codec"], p["rate"], p["ch"], dur,
                         total * 8 // max(dur, 1), p["n_pages"]))
        elif kind == "flac":
            total_len = 4 + 4 + 34 + p["frame_bytes"]
            dur = round(p["total"] * 1000 / p["rate"])
            rows.append((ref, "flac", p["rate"], p["ch"], dur,
                         total_len * 8 // max(dur, 1), p["total"]))
        elif kind == "wav":
            dur = round(p["n"] * 1000 / p["rate"])
            rows.append((ref, "wav", p["rate"], 1, dur,
                         p["rate"] * 2 * 8 // 1000, p["n"]))
        else:
            rows.append((ref, "unknown", None, None, None, None, None))
    cols = ["media_ref", "codec", "sample_rate", "channels", "duration_ms",
            "bitrate_kbps", "n_frames"]
    arrays = {
        "media_ref": pa.array([r[0] for r in rows], pa.string()),
        "codec": pa.array([r[1] for r in rows], pa.string()),
    }
    for idx, c in enumerate(cols[2:], start=2):
        arrays[c] = pa.array([r[idx] for r in rows], pa.int32())
    return pa.table(arrays)




# ---------------------------------------------------------------------------
# cdc_chunks: content-defined chunking over deterministic block payloads.
# The ORACLE here is the textbook per-byte Gear recurrence
# h = ((h << 1) + G[b]) mod 2^64 — a different algorithm shape from the
# engine's vectorized 64-term windowed-sum kernel (operators/dedup.py
# _gear_hashes), so a vectorization bug cannot cancel out. Payload
# synthesis (block sequences from md5) is mirrored literally in
# __spark_entry__._cdc_payload; test_golden.py keeps them in lockstep.
# ---------------------------------------------------------------------------

CDC_REFS = [f"m{i:02d}" for i in range(12)]


def _cdc_payload(ref: str) -> bytes:
    blocks = [hashlib.blake2b(f"cdc-block-{j}".encode(),
                              digest_size=32).digest() * 8
              for j in range(8)]  # 8 shared 256-byte blocks
    seq = [int(hashlib.md5(f"{ref}|{i}".encode()).hexdigest(), 16) % 8
           for i in range(24)]
    return b"".join(blocks[j] for j in seq)


def golden_cdc_chunks(sf_dir: str, min_size=64, avg_bits=8,
                      max_size=1024) -> pa.Table:  # sf-independent
    import bisect

    gear = [int.from_bytes(hashlib.blake2b(bytes([i]), digest_size=8).digest(),
                           "big") for i in range(256)]
    rows = []
    for ref in CDC_REFS:
        payload = _cdc_payload(ref)
        n = len(payload)
        mask = (1 << avg_bits) - 1
        h = 0
        cand = []
        for i, b in enumerate(payload):
            h = ((h << 1) + gear[b]) & ((1 << 64) - 1)
            if (h & mask) == 0:
                cand.append(i + 1)
        s = 0
        idx = 0
        while s < n:
            lo, hi = s + min_size, min(s + max_size, n)
            if lo >= n:
                e = n
            else:
                i = bisect.bisect_left(cand, lo)
                e = cand[i] if i < len(cand) and cand[i] <= hi else hi
            fp = int.from_bytes(
                hashlib.blake2b(payload[s:e], digest_size=8).digest(),
                "big", signed=True)
            rows.append((ref, idx, s, e - s, fp))
            idx += 1
            s = e
    return pa.table({
        "media_ref": pa.array([r[0] for r in rows], pa.string()),
        "chunk_idx": pa.array([r[1] for r in rows], pa.int32()),
        "offset": pa.array([r[2] for r in rows], pa.int64()),
        "length": pa.array([r[3] for r in rows], pa.int32()),
        "fp": pa.array([r[4] for r in rows], pa.int64()),
    })




# ---------------------------------------------------------------------------
# image_stream_info: header-only image metadata over engine-encoded files.
# The truth table is the SYNTHESIS PARAMETERS (dims / progressive flag /
# EXIF orientation the entry-side encoders are told to produce) — the
# parser under test contributes nothing here. Mirrored literally in
# __spark_entry__._IMAGE_INFO_CASES.
# ---------------------------------------------------------------------------

IMAGE_INFO_CASES = [
    # (ref, format, width, height, progressive, orientation)
    ("i01.png", "png", 31, 24, False, 0),
    ("i02.ppm", "ppm", 23, 17, False, 0),
    ("i03.jpg", "jpeg", 16, 16, False, 0),
    ("i04.jpg", "jpeg", 33, 20, True, 0),
    ("i05.jpg", "jpeg", 24, 8, False, 6),
    ("i06.jpg", "jpeg", 40, 9, True, 8),
    ("i07.bin", "unknown", None, None, None, None),
]


def golden_image_stream_info(sf_dir: str) -> pa.Table:  # sf-independent
    rows = []
    for ref, fmt, w, h, prog, orient in IMAGE_INFO_CASES:
        if fmt == "unknown":
            rows.append((ref, fmt, None, None, None, None, None, None))
        else:
            rows.append((ref, fmt, w, h, 8, 1, prog, orient))
    return pa.table({
        "media_ref": pa.array([r[0] for r in rows], pa.string()),
        "format": pa.array([r[1] for r in rows], pa.string()),
        "width": pa.array([r[2] for r in rows], pa.int32()),
        "height": pa.array([r[3] for r in rows], pa.int32()),
        "bit_depth": pa.array([r[4] for r in rows], pa.int32()),
        "n_frames": pa.array([r[5] for r in rows], pa.int32()),
        "progressive": pa.array([r[6] for r in rows], pa.bool_()),
        "orientation": pa.array([r[7] for r in rows], pa.int32()),
    })


# ---------------------------------------------------------------------------
# mp3_decode: full Layer III decode over in-repo encoder fixtures. The
# ORACLE is pure signal physics — every golden value derives from the
# fixture PARAMETERS (tone line index, sample count, channel count),
# never from the decoder: the decoder must reproduce each channel's tone
# on its MDCT line and emit exactly n_frames*1152 samples. Case list is
# mirrored literally in __spark_entry__._MP3_DECODE_CASES;
# test_golden.py keeps them in lockstep.
# ---------------------------------------------------------------------------

MP3_DECODE_CASES = [
    ("m01.mp3", dict(line=26, n=9216, ch=1)),            # 1014.45 Hz mono
    ("m02.mp3", dict(line=78, n=9216, ch=1)),            # 3005.47 Hz mono
    ("m03.mp3", dict(line=26, line2=52, n=9216, ch=2)),  # stereo, distinct tones
    ("m04.mp3", dict(line=130, n=4608, ch=1)),           # 4996 Hz, short clip
    ("m05.bin", dict(junk=True)),
]


def golden_mp3_decode(sf_dir: str) -> pa.Table:  # sf-independent
    rows = []
    for ref, p in MP3_DECODE_CASES:
        if p.get("junk"):
            rows.append((ref, None, None, None, None, None))
            continue
        n_frames = (p["n"] + 1151) // 1152
        rows.append((ref, 44100, p["ch"], n_frames * 1152,
                     p["line"], p.get("line2")))
    return pa.table({
        "media_ref": pa.array([r[0] for r in rows], pa.string()),
        "sample_rate": pa.array([r[1] for r in rows], pa.int32()),
        "channels": pa.array([r[2] for r in rows], pa.int32()),
        "n_samples": pa.array([r[3] for r in rows], pa.int32()),
        "line0": pa.array([r[4] for r in rows], pa.int32()),
        "line1": pa.array([r[5] for r in rows], pa.int32()),
    })


def golden_charset_decode(sf_dir: str) -> pa.Table:  # sf-independent
    """Expected (case_id, text, encoding) for sources.charset.gate_cases.

    INDEPENDENT of the engine's sniffing: each case's true codec is
    DECLARED here (we authored the fixture bytes, so the truth is known)
    and the expected text is a direct payload.decode(truth) — the engine
    must arrive at the same answer by detection."""
    from smartcrawler_spark.sources.charset import gate_cases

    truth = {  # case_id -> (codec to decode with, reported encoding name)
        "utf8_plain": ("utf-8", "utf-8"),
        "utf8_bom": ("utf-8-sig", "utf-8"),
        "utf16le_bom": ("utf-16", "utf-16-le"),   # utf-16 consumes the BOM
        "utf16be_bom": ("utf-16", "utf-16-be"),
        "ctype_latin1": ("cp1252", "cp1252"),
        "meta_cp1251": ("cp1251", "cp1251"),
        "meta_httpequiv_sjis": ("shift_jis", "shift_jis"),
        "bogus_label_damage": ("utf-8", "utf-8"),     # fallback + U+FFFD
        "empty": ("utf-8", "utf-8"),
        "meta_past_prescan": ("utf-8", "utf-8"),      # meta outside window
    }
    ids, texts, encs = [], [], []
    for case_id, payload, _ct in gate_cases():
        codec, reported = truth[case_id]
        ids.append(case_id)
        texts.append(payload.decode(codec, errors="replace"))
        encs.append(reported)
    return pa.table({
        "case_id": pa.array(ids, pa.string()),
        "text": pa.array(texts, pa.string()),
        "encoding": pa.array(encs, pa.string()),
    })


# ---------------------------------------------------------------------------
# image_dhash / image_dhash_pairs: perceptual image near-dup. The golden
# derives every hash from KNOWN pixel truth — the same deterministic
# integer pixel recipe the gate encodes LOSSLESSLY (PNG/PPM), so decode
# must reproduce the exact arrays and the dHash kernel is re-computed
# here with an independent straightforward implementation (per-box
# double loop, no integral image). Pairs are brute-force O(n^2) at this
# scale. Case list + pixel recipe are mirrored literally in
# __spark_entry__._IMAGE_DHASH_CASES / _dhash_case_pixels;
# tests/test_golden.py keeps them in lockstep.
# ---------------------------------------------------------------------------

# (ref, seed, w, h, variant_amp) — variant_amp None = base image from
# seed; an int = perturbation of the SAME seed's base (3 seeded 3x3
# patches shifted by +amp). Duplicate (ref, seed) rows with distinct
# refs are exact pixel twins encoded in different lossless formats.
IMAGE_DHASH_CASES = [
    ("img00.png", 0, 48, 36, None), ("img01.ppm", 1, 64, 48, None),
    ("img02.png", 2, 32, 24, None), ("img03.ppm", 3, 80, 60, None),
    ("img04.png", 4, 40, 40, None), ("img05.ppm", 5, 56, 42, None),
    ("img06.png", 6, 72, 54, None), ("img07.ppm", 7, 24, 20, None),
    ("img08.png", 8, 60, 44, None), ("img09.ppm", 9, 36, 28, None),
    ("img10.png", 10, 52, 38, None), ("img11.ppm", 11, 44, 34, None),
    # exact pixel twins of img00/img03 in the other container
    ("img00_twin.ppm", 0, 48, 36, None), ("img03_twin.png", 3, 80, 60, None),
    # light perturbations (near-dups if few grid bits flip)
    ("img01_near.png", 1, 64, 48, 24), ("img04_near.ppm", 4, 40, 40, 24),
    ("img06_near.png", 6, 72, 54, 32), ("img08_near.ppm", 8, 60, 44, 24),
    # heavy perturbations (should fall outside max_hamming)
    ("img02_far.png", 2, 32, 24, 120), ("img05_far.ppm", 5, 56, 42, 120),
]
IMAGE_DHASH_JUNK = [("junk0.bin", b"\x00\x01 not an image"),
                    ("tiny0.ppm", None)]  # 6x6 PPM, below the 8x9 grid


def _dhash_case_pixels(seed: int, w: int, h: int,
                       variant_amp: int | None) -> np.ndarray:
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 // max(w - 1, 1)).astype(np.int64)
    g = (yy * 255 // max(h - 1, 1)).astype(np.int64)
    b = ((xx + yy) * 127 // max(w + h - 2, 1)).astype(np.int64)
    px = np.stack([r, g, b], axis=-1)
    for _ in range(5):
        x0 = int(rng.integers(0, max(w - 4, 1)))
        y0 = int(rng.integers(0, max(h - 4, 1)))
        bw = int(rng.integers(3, max(w // 3, 4)))
        bh = int(rng.integers(3, max(h // 3, 4)))
        val = rng.integers(0, 256, 3)
        px[y0:y0 + bh, x0:x0 + bw] = (px[y0:y0 + bh, x0:x0 + bw] + val) // 2
    if variant_amp is not None and variant_amp <= 32:
        # near variant: nudge two grid-box-sized regions — flips a few
        # adjacent-mean comparisons, leaving the rest of the hash intact
        vrng = np.random.default_rng(1000 + seed)
        bh, bw = max(h // 8, 1), max(w // 9, 1)
        for _ in range(2):
            y0 = int(vrng.integers(0, max(h - bh, 1)))
            x0 = int(vrng.integers(0, max(w - bw, 1)))
            px[y0:y0 + bh, x0:x0 + bw] += variant_amp
    elif variant_amp is not None:
        # far variant: shove opposite quadrants apart — flips gradient
        # signs across much of the grid
        px[: h // 2, : w // 2] += variant_amp
        px[h // 2:, w // 2:] -= variant_amp
    return px.clip(0, 255).astype(np.uint8)


def _golden_dhash64(px: np.ndarray) -> int:
    """Independent dHash: per-box double loop, integer means."""
    h, w = px.shape[:2]
    luma = [[(77 * int(px[y, x, 0]) + 150 * int(px[y, x, 1])
              + 29 * int(px[y, x, 2])) >> 8 for x in range(w)]
            for y in range(h)]
    grid = []
    for r in range(8):
        row = []
        for c in range(9):
            y0, y1 = r * h // 8, (r + 1) * h // 8
            x0, x1 = c * w // 9, (c + 1) * w // 9
            s = sum(luma[y][x] for y in range(y0, y1) for x in range(x0, x1))
            row.append(s // ((y1 - y0) * (x1 - x0)))
        grid.append(row)
    bits = 0
    for r in range(8):
        for c in range(8):
            bits = (bits << 1) | (1 if grid[r][c] > grid[r][c + 1] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def golden_image_dhash(sf_dir: str) -> pa.Table:  # sf-independent
    rows = [(ref, _golden_dhash64(_dhash_case_pixels(seed, w, h, amp)), w, h)
            for ref, seed, w, h, amp in IMAGE_DHASH_CASES]
    rows.sort()
    return pa.table({
        "media_ref": pa.array([r[0] for r in rows], pa.string()),
        "dhash": pa.array([r[1] for r in rows], pa.int64()),
        "width": pa.array([r[2] for r in rows], pa.int32()),
        "height": pa.array([r[3] for r in rows], pa.int32()),
    })


def golden_image_dhash_pairs(sf_dir: str, max_hamming=6) -> pa.Table:
    hashes = [(ref, _golden_dhash64(_dhash_case_pixels(seed, w, h, amp)))
              for ref, seed, w, h, amp in IMAGE_DHASH_CASES]
    pairs = []
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            ham = bin((hashes[i][1] ^ hashes[j][1]) & ((1 << 64) - 1)).count("1")
            if ham <= max_hamming:
                a, b = sorted((hashes[i][0], hashes[j][0]))
                pairs.append((a, b, ham))
    pairs.sort()
    return pa.table({
        "ref_a": pa.array([p[0] for p in pairs], pa.string()),
        "ref_b": pa.array([p[1] for p in pairs], pa.string()),
        "hamming": pa.array([p[2] for p in pairs], pa.int32()),
    })


GOLDENS = {
    "dedup_minhash": golden_dedup_minhash,
    "dedup_simhash": golden_dedup_simhash,
    "ann_lsh": golden_ann_lsh,
    "ann_ivf": golden_ann_ivf,
    "embedding_near_dup_lsh": golden_embedding_near_dup_lsh,
    "audio_stream_info": golden_audio_stream_info,
    "mp3_decode": golden_mp3_decode,
    "cdc_chunks": golden_cdc_chunks,
    "image_stream_info": golden_image_stream_info,
    "charset_decode": golden_charset_decode,
    "image_dhash": golden_image_dhash,
    "image_dhash_pairs": golden_image_dhash_pairs,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "fixtures/golden"
    import os

    os.makedirs(out_dir, exist_ok=True)
    for name, fn in GOLDENS.items():
        table = fn(sf_dir)
        path = f"{out_dir}/{name}.parquet"
        pq.write_table(table, path)
        print(f"{name}: {table.num_rows} rows -> {path}")


if __name__ == "__main__":
    main()
