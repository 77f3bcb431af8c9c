"""Partitioned bloom + cuckoo URL-seen prefilters (numpy, deterministic).

Role in the frontier (north_rule): these are PREFILTERS in front of the
exact anti-join — a candidate whose bucket filter says "definitely unseen"
skips the exact join entirely; "maybe seen" candidates still go through it.
False positives therefore cost one extra join lookup and can never corrupt
the seen set; the exact anti-join (operators.frontier.seen_anti_join)
remains the authority, matching the reference's insert-if-absent semantics
(/root/reference/src/storage.rs:78-89) bit-for-bit.

Keys are the engine's 64-bit `url_hash` (xxhash64 of the canonical URL), so
filter probes are pure uint64 numpy arithmetic — no string hashing in
Python. Mixing uses the splitmix64 finalizer (public-domain constants).

Scale design: one filter per `pmod(url_hash, n_buckets)` bucket, built
inside `applyInPandas` ON THE EXECUTORS (one task per bucket — the build
never funnels raw URLs through the driver; only the finished ~KB-MB filter
blobs are collected and re-broadcast). At 10^10 URLs you'd keep
n_buckets == number of frontier partitions and persist the blobs next to
each snapshot so resume doesn't rebuild (rebuild-on-miss stays correct).

The cuckoo filter complements the bloom: it supports DELETE (bloom can't),
which the engine uses for the mutable recent-rounds delta, and gives a
bounded false-positive rate at higher load factors.
"""

from __future__ import annotations

import numpy as np

# Sentinel blob marking a bucket whose cuckoo delta OVERFLOWED: admitted
# keys could not all be inserted, so the filter pair would return false
# NEGATIVES (bloom fast path would skip the exact join and re-admit seen
# URLs). A degraded bucket answers maybe_seen=True for everything — every
# candidate in it pays the exact join (correct, just slower) until the next
# bloom rebuild absorbs the delta. 6 bytes, shorter than any valid blob
# (cuckoo blobs are 8 + n_buckets*8 bytes), so it can never be misparsed.
CUCKOO_SATURATED = b"\xffCKSAT"

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_PHI = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _PHI).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _C1
    x ^= x >> np.uint64(27)
    x *= _C2
    x ^= x >> np.uint64(31)
    return x


def _as_u64(keys) -> np.ndarray:
    return np.asarray(keys, dtype=np.int64).view(np.uint64)


class BloomFilter:
    """Double-hashed bloom over int64 keys. m bits, k probes."""

    def __init__(self, capacity: int, fp_rate: float = 0.01):
        capacity = max(capacity, 16)
        m = int(-capacity * np.log(fp_rate) / (np.log(2) ** 2))
        self.m = max(64, (m + 63) // 64 * 64)
        self.k = max(1, int(round(self.m / capacity * np.log(2))))
        self.words = np.zeros(self.m // 64, dtype=np.uint64)

    def add_many(self, keys) -> None:
        u = _as_u64(keys)
        if u.size == 0:
            return
        h1 = _splitmix64(u)
        h2 = _splitmix64(u ^ _C2) | np.uint64(1)
        for i in range(self.k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
            np.bitwise_or.at(self.words, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))

    def contains_many(self, keys) -> np.ndarray:
        u = _as_u64(keys)
        if u.size == 0:
            return np.zeros(0, dtype=bool)
        h1 = _splitmix64(u)
        h2 = _splitmix64(u ^ _C2) | np.uint64(1)
        out = np.ones(u.size, dtype=bool)
        for i in range(self.k):
            pos = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
            bits = self.words[(pos >> np.uint64(6)).astype(np.int64)]
            out &= (bits >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return out

    def to_bytes(self) -> bytes:
        header = np.array([self.m, self.k], dtype=np.uint64).tobytes()
        return header + self.words.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        header = np.frombuffer(blob[:16], dtype=np.uint64)
        bf = cls.__new__(cls)
        bf.m, bf.k = int(header[0]), int(header[1])
        bf.words = np.frombuffer(blob[16:], dtype=np.uint64).copy()
        return bf


class CuckooFilter:
    """4-way bucketed cuckoo filter over int64 keys (16-bit fingerprints).

    Supports add/contains/delete. Deterministic eviction path (seeded by the
    key being inserted), bounded kicks; returns False on insert failure
    (caller falls back to exact join — correctness unaffected)."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        nb = 1
        while nb * self.SLOTS < max(capacity, 16) * 1.1:
            nb <<= 1
        self.n_buckets = nb
        self.table = np.zeros((nb, self.SLOTS), dtype=np.uint16)  # 0 = empty

    def _fp_and_idx(self, u: np.ndarray):
        h = _splitmix64(u)
        fp = ((h >> np.uint64(48)) % np.uint64(65535) + np.uint64(1)).astype(np.uint16)
        i1 = (h % np.uint64(self.n_buckets)).astype(np.int64)
        i2 = (i1 ^ (_splitmix64(fp.astype(np.uint64)) % np.uint64(self.n_buckets)).astype(np.int64))
        return fp, i1, i2

    def _alt(self, idx: int, fp: int) -> int:
        return int(
            idx ^ int(_splitmix64(np.array([fp], dtype=np.uint64))[0] % np.uint64(self.n_buckets))
        )

    def add(self, key: int) -> bool:
        fp, i1, i2 = self._fp_and_idx(_as_u64([key]))
        fp, i1, i2 = int(fp[0]), int(i1[0]), int(i2[0])
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.where(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                return True
        idx, cur = i1, fp
        rng = np.random.default_rng(int(_as_u64([key])[0]))  # deterministic per key
        for _ in range(self.MAX_KICKS):
            slot = int(rng.integers(self.SLOTS))
            cur, self.table[idx, slot] = int(self.table[idx, slot]), cur
            idx = self._alt(idx, cur)
            row = self.table[idx]
            empty = np.where(row == 0)[0]
            if empty.size:
                row[empty[0]] = cur
                return True
        return False  # full — caller falls back to exact join

    def add_many(self, keys) -> int:
        return sum(self.add(int(k)) for k in np.asarray(keys, dtype=np.int64))

    def contains_many(self, keys) -> np.ndarray:
        u = _as_u64(keys)
        if u.size == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._fp_and_idx(u)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2

    def delete(self, key: int) -> bool:
        fp, i1, i2 = self._fp_and_idx(_as_u64([key]))
        fp = fp[0]
        for idx in (int(i1[0]), int(i2[0])):
            row = self.table[idx]
            hit = np.where(row == fp)[0]
            if hit.size:
                row[hit[0]] = 0
                return True
        return False

    def to_bytes(self) -> bytes:
        return np.array([self.n_buckets], dtype=np.uint64).tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        nb = int(np.frombuffer(blob[:8], dtype=np.uint64)[0])
        cf = cls.__new__(cls)
        cf.n_buckets = nb
        cf.table = np.frombuffer(blob[8:], dtype=np.uint16).reshape(nb, cls.SLOTS).copy()
        return cf


class SeenFilterState:
    """The persistent bloom+cuckoo URL-seen prefilter state of the crawl loop.

    Division of labor (the amortization the north rule's 'bloom/cuckoo'
    pairing buys):
    * per-bucket BLOOMS cover the bulk frontier — rebuilt from the frontier
      table only every `rebuild_every` rounds (an executor-side pass);
    * the CUCKOO filter covers the DELTA — URLs admitted since the last
      bloom rebuild, added incrementally per round (and deletable, which a
      bloom can't do — e.g. rolling back a round on resume).

    A URL is 'maybe seen' iff bloom(bucket(h)) OR cuckoo says so; the exact
    anti-join downstream remains the correctness authority, so filter
    staleness or saturation can only cost extra join probes.

    Persistence: one pickle per frontier snapshot version next to the
    checkpoint, so resume reuses filters instead of rebuilding (and a
    missing/corrupt file just degrades to rebuild).

    The delta is PER-BUCKET (same url_hash % n_buckets layout as the
    blooms). The crawl loop updates it on the executors
    (operators.frontier.update_bucket_cuckoos: applyInPandas per bucket,
    only the finished blobs reach the driver) — the driver never collects
    admitted url_hash rows, so the per-round driver traffic is O(n_buckets
    x blob) regardless of how many URLs a round admits. add_delta /
    remove_delta below are the driver-side small-path equivalents (tests,
    rollback).
    """

    def __init__(self, n_buckets: int = 16, rebuild_every: int = 4,
                 cuckoo_capacity: int = 1 << 17):
        self.n_buckets = n_buckets
        self.rebuild_every = rebuild_every
        self.cuckoo_capacity = cuckoo_capacity
        self.blooms: dict[int, bytes] = {}
        self.cuckoos: dict[int, bytes] = {}  # bucket -> cuckoo blob (delta)
        self.rounds_since_rebuild: int | None = None  # None = never built

    # -- per-bucket delta helpers ---------------------------------------------

    def _bucket_of(self, keys) -> np.ndarray:
        return _as_u64(keys).astype(np.int64) % self.n_buckets

    def _bucket_filter(self, b: int) -> CuckooFilter:
        blob = self.cuckoos.get(int(b))
        return CuckooFilter.from_bytes(blob) if blob else CuckooFilter(
            self.cuckoo_capacity
        )

    def contains_delta(self, keys) -> np.ndarray:
        """Per-bucket delta membership probe (tests / driver small path).
        A saturated (degraded) bucket answers True for every key."""
        keys = list(keys)
        buckets = self._bucket_of(keys)
        out = np.zeros(len(keys), dtype=bool)
        for b in set(buckets.tolist()):
            mask = buckets == b
            if self.cuckoos.get(int(b)) == CUCKOO_SATURATED:
                out[mask] = True
                continue
            ck = self._bucket_filter(b)
            out[mask] = ck.contains_many([k for k, m in zip(keys, mask) if m])
        return out

    def needs_rebuild(self) -> bool:
        return (
            self.rounds_since_rebuild is None
            or self.rounds_since_rebuild >= self.rebuild_every
            # a degraded bucket forces every candidate in it through the
            # exact join — rebuild early to restore the fast path
            or any(v == CUCKOO_SATURATED for v in self.cuckoos.values())
        )

    def rebuilt(self, blooms: dict[int, bytes]) -> None:
        """Install freshly built blooms; the delta cuckoos reset (their keys
        are now covered by the blooms)."""
        self.blooms = blooms
        self.cuckoos = {}
        self.rounds_since_rebuild = 0

    def absorb_bucket_blobs(self, blobs: dict[int, bytes]) -> None:
        """Install executor-updated per-bucket delta blobs (the output of
        operators.frontier.update_bucket_cuckoos) and count the round."""
        self.cuckoos.update({int(b): bytes(v) for b, v in blobs.items()})
        self.rounds_since_rebuild = (self.rounds_since_rebuild or 0) + 1

    def add_delta(self, url_hashes) -> int:
        """Driver-side small path: insert keys into their buckets' cuckoos.
        Returns the number actually inserted. A bucket that cannot absorb
        ALL its keys is marked CUCKOO_SATURATED: a key missing from both
        filters is a false NEGATIVE (the bloom fast path would re-admit it
        without the exact join), so the degraded bucket must answer
        maybe_seen=True for everything until the next bloom rebuild."""
        url_hashes = list(url_hashes)
        buckets = self._bucket_of(url_hashes)
        ok = 0
        for b in set(buckets.tolist()):
            if self.cuckoos.get(int(b)) == CUCKOO_SATURATED:
                continue  # already degraded; stays degraded until rebuild
            keys = [k for k, m in zip(url_hashes, buckets == b) if m]
            ck = self._bucket_filter(b)
            inserted = ck.add_many(keys)
            ok += inserted
            self.cuckoos[int(b)] = (
                ck.to_bytes() if inserted == len(keys) else CUCKOO_SATURATED
            )
        self.rounds_since_rebuild = (self.rounds_since_rebuild or 0) + 1
        return ok

    def remove_delta(self, url_hashes) -> int:
        """Roll back keys (e.g. a round being replayed after resume).
        Saturated buckets stay degraded (their contents are unknown)."""
        url_hashes = list(url_hashes)
        buckets = self._bucket_of(url_hashes)
        removed = 0
        for b in set(buckets.tolist()):
            if self.cuckoos.get(int(b)) == CUCKOO_SATURATED:
                continue
            ck = self._bucket_filter(b)
            removed += sum(
                ck.delete(int(k)) for k, m in zip(url_hashes, buckets == b) if m
            )
            self.cuckoos[int(b)] = ck.to_bytes()
        return removed

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        import os
        import pickle

        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(
                {
                    "n_buckets": self.n_buckets,
                    "rebuild_every": self.rebuild_every,
                    "cuckoo_capacity": self.cuckoo_capacity,
                    "blooms": self.blooms,
                    "cuckoos": self.cuckoos,
                    "rounds_since_rebuild": self.rounds_since_rebuild,
                },
                f,
            )
        os.rename(tmp, path)

    @classmethod
    def load(cls, path: str) -> "SeenFilterState | None":
        import os
        import pickle

        if not os.path.exists(path):
            return None
        try:
            with open(path, "rb") as f:
                d = pickle.load(f)
        except Exception:
            return None  # degrade to rebuild
        try:
            st = cls(d["n_buckets"], d["rebuild_every"], d["cuckoo_capacity"])
            st.blooms = d["blooms"]
            st.cuckoos = d["cuckoos"]
            st.rounds_since_rebuild = d["rounds_since_rebuild"]
        except KeyError:
            return None  # older layout -> degrade to rebuild
        return st
