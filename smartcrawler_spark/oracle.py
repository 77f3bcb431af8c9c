"""Pure-Python oracle crawler — the deterministic re-specification of the
reference's crawl loop that the Spark engine must match EXACTLY.

Why a re-specification: the reference's emitted order beyond root-first is
HashSet iteration order — nondeterministic (/root/reference/src/main.rs:75,118).
Its own integration tests only assert structural properties
(/root/reference/tests/real_world_tests.rs:90-105: initial URL, then root,
then discovered). We therefore pin a total order that PRESERVES the
reference's contract (root-first; seen-set insert-if-absent semantics of
/root/reference/src/storage.rs:78-89; per-domain URL cap of /root/reference/src/main.rs:60,82-89)
and makes everything else deterministic:

* admission order:   is_root desc, score desc, url_canon asc  (per host,
  capped — root-first here too, so a seed root can never be cap-evicted by
  higher-scoring sitemap URLs)
* scheduling order:  is_root desc, score desc, url_canon asc
  (per host, politeness-budget top-k; same keys for the global per-round
  crawl_log sequence)

The oracle shares the URL canonicalizer, href resolver, same-domain
predicate and relevance scorer SPECS with the engine (same pure-Python
kernels the engine's Arrow UDFs use), so "engine matches oracle" is a real
equivalence over independent implementations of the dataflow, not a
tautology.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow.parquet as pq

from .functions.relevance import score_url
from .functions.urls import _canon_one

# ---------------------------------------------------------------------------
# spec kernels shared with the engine's column expressions
# ---------------------------------------------------------------------------


def canon(url: str) -> str:
    return _canon_one(url)


def host_of(url_canon: str) -> str:
    rest = url_canon.split("://", 1)[-1]
    authority = rest.split("/", 1)[0].split("?", 1)[0].split("#", 1)[0]
    return authority.split(":", 1)[0].lower()


def path_of(url_canon: str) -> str:
    rest = url_canon.split("://", 1)[-1]
    idx = rest.find("/")
    if idx < 0:
        return ""
    path = rest[idx:]
    for stop in "?#":
        j = path.find(stop)
        if j >= 0:
            path = path[:j]
    return path


def is_root(url_canon: str) -> bool:
    return path_of(url_canon) in ("", "/") and "?" not in url_canon and "#" not in url_canon


def resolve_href(href: str, base_host: str) -> str:
    """Reference branch order: http(s) passthrough, then '/' (which also
    captures '//'), else relative (/root/reference/src/html_parser.rs:249-259)."""
    if href.startswith("http://") or href.startswith("https://"):
        return href
    if href.startswith("/"):
        return f"https://{base_host}{href}"
    return f"https://{base_host}/{href}"


def same_domain(url: str, base_host: str) -> bool:
    h = host_of(canon(url))
    return h == base_host or h.endswith("." + base_host)


# ---------------------------------------------------------------------------
# oracle crawl
# ---------------------------------------------------------------------------


@dataclass
class CrawlConfig:
    keywords: dict[str, float] = field(default_factory=dict)
    max_urls_per_host: int = 10      # reference cap: 3 normal / 10 prep
    max_rounds: int = 50
    default_budget: int = 4


@dataclass
class OracleResult:
    crawl_log: list[tuple[int, int, str]]            # (round, seq, url_canon)
    frontier: dict[str, dict]                        # url_canon -> row
    metrics: list[dict]                              # per-round counters


def load_corpus(corpus_dir: str):
    docs = {}
    t = pq.read_table(f"{corpus_dir}/documents.parquet")
    for row in t.to_pylist():
        docs[canon(row["doc_id"])] = row
    robots: dict[str, list[str]] = {}
    for row in pq.read_table(f"{corpus_dir}/robots.parquet").to_pylist():
        robots.setdefault(row["host"], []).append(row["disallow_prefix"])
    budgets = {
        row["host"]: row["budget"]
        for row in pq.read_table(f"{corpus_dir}/politeness.parquet").to_pylist()
    }
    sitemaps = {
        row["host"]: row["urls"]
        for row in pq.read_table(f"{corpus_dir}/sitemaps.parquet").to_pylist()
    }
    return docs, robots, budgets, sitemaps


def reference_crawl(corpus_dir: str, initial_url: str, prep: bool = False,
                    keywords: dict[str, float] | None = None) -> OracleResult:
    """Oracle for the reference's EXACT two-phase main() flow
    (/root/reference/src/main.rs:57-177, ordering contract strengthened per
    tests/real_world_tests.rs:90-105):

    phase 1 (discovery): fetch the initial URL, extract its same-domain
    links, admit in (score desc, url_canon asc) order until the domain has
    max_urls (3 normal / 10 prep, main.rs:60) — the root URL is always
    pre-admitted (main.rs:30-35).
    phase 2 (fetch): initial URL first, then the domain root, then the rest
    by (score desc, url_canon asc); already-SUCCESS URLs skipped
    (main.rs:124-129).

    crawl_log rounds: 1 = discovery fetch, 2 = phase-2 fetches."""
    keywords = keywords or {}
    docs, robots, budgets, sitemaps = load_corpus(corpus_dir)
    max_urls = 10 if prep else 3

    initial = canon(initial_url)
    domain = host_of(initial)
    root = canon(f"https://{domain}/")

    frontier: dict[str, dict] = {}

    def add(u: str, rnd: int) -> bool:
        if u in frontier:
            return False
        frontier[u] = {
            "url_canon": u, "host": host_of(u), "status": "PENDING",
            "score": score_url(u, keywords), "is_root": is_root(u),
            "round_added": rnd, "round_fetched": None, "title": None,
        }
        return True

    add(root, 0)
    add(initial, 0)

    crawl_log: list[tuple[int, int, str]] = []
    metrics: list[dict] = []

    def fetch(u: str, rnd: int, seq: int) -> list[str]:
        crawl_log.append((rnd, seq, u))
        row = frontier[u]
        page = docs.get(u)
        row["round_fetched"] = rnd
        if page is None:
            row["status"] = "FAILED"
            return []
        row["status"] = "SUCCESS"
        row["title"] = next(
            (s["text"] for s in page["spans"] if s["kind"] == "title" and s["text"]),
            None,
        )
        links = []
        for s in page["spans"]:
            if s["kind"] == "a" and s["media_ref"]:
                url = resolve_href(s["media_ref"], domain)
                if same_domain(url, domain):
                    links.append(canon(url))
        return links

    # phase 1: discovery from the initial URL
    links = fetch(initial, 1, 1)
    added = 0
    for u in sorted(set(links), key=lambda u: (-score_url(u, keywords), u)):
        if len(frontier) >= max_urls:
            break
        if add(u, 1):
            added += 1
    metrics.append({"round": 1, "scheduled": 1, "fetched": 1, "admitted": added})

    # phase 2: initial first, then root, then the rest
    order = sorted(
        frontier.values(),
        key=lambda r: (
            r["url_canon"] != initial,      # initial first
            not r["is_root"],               # then root
            -r["score"], r["url_canon"],    # then the pinned order
        ),
    )
    seq = 0
    fetched = 0
    for row in order:
        if row["status"] == "SUCCESS":
            continue  # skip-already-fetched (P14)
        seq += 1
        fetch(row["url_canon"], 2, seq)
        fetched += 1
    metrics.append({"round": 2, "scheduled": seq, "fetched": fetched, "admitted": 0})

    return OracleResult(crawl_log=crawl_log, frontier=frontier, metrics=metrics)


def crawl(corpus_dir: str, seeds: list[str], cfg: CrawlConfig) -> OracleResult:
    docs, robots, budgets, sitemaps = load_corpus(corpus_dir)

    frontier: dict[str, dict] = {}
    host_count: dict[str, int] = {}
    crawl_log: list[tuple[int, int, str]] = []
    metrics: list[dict] = []

    def robots_blocked(url_canon: str) -> bool:
        h = host_of(url_canon)
        return any(path_of(url_canon).startswith(p) for p in robots.get(h, []))

    def admit(raw_urls: list[str], rnd: int) -> dict[str, int]:
        counters = {"candidates": len(raw_urls), "robots_blocked": 0,
                    "dedup_rejected": 0, "cap_rejected": 0, "admitted": 0}
        canon_urls = sorted({canon(u) for u in raw_urls if u})
        by_host: dict[str, list[str]] = {}
        for u in canon_urls:
            if robots_blocked(u):
                counters["robots_blocked"] += 1
                continue
            if u in frontier:
                counters["dedup_rejected"] += 1
                continue
            by_host.setdefault(host_of(u), []).append(u)
        for h in sorted(by_host):
            cand = by_host[h]
            cand.sort(key=lambda u: (-int(is_root(u)), -score_url(u, cfg.keywords), u))
            room = cfg.max_urls_per_host - host_count.get(h, 0)
            for u in cand[: max(0, room)]:
                frontier[u] = {
                    "url_canon": u,
                    "host": h,
                    "status": "PENDING",
                    "score": score_url(u, cfg.keywords),
                    "is_root": is_root(u),
                    "round_added": rnd,
                    "round_fetched": None,
                    "title": None,
                }
                host_count[h] = host_count.get(h, 0) + 1
                counters["admitted"] += 1
            counters["cap_rejected"] += max(0, len(cand) - max(0, room))
        return counters

    # round 0: seeds + sitemap URLs of the seed hosts
    seed_hosts = {host_of(canon(s)) for s in seeds}
    round0 = list(seeds)
    for h in sorted(seed_hosts):
        round0.extend(sitemaps.get(h, []))
    admit_counters = admit(round0, 0)
    metrics.append({"round": 0, "scheduled": 0, "fetched": 0, "failed": 0,
                    **admit_counters})

    for rnd in range(1, cfg.max_rounds + 1):
        # politeness-budgeted per-host top-k of PENDING urls
        pending_by_host: dict[str, list[dict]] = {}
        for row in frontier.values():
            if row["status"] == "PENDING":
                pending_by_host.setdefault(row["host"], []).append(row)
        scheduled: list[dict] = []
        for h, rows in pending_by_host.items():
            rows.sort(key=lambda r: (-int(r["is_root"]), -r["score"], r["url_canon"]))
            scheduled.extend(rows[: budgets.get(h, cfg.default_budget)])
        if not scheduled:
            break

        scheduled.sort(key=lambda r: (-int(r["is_root"]), -r["score"], r["url_canon"]))
        discovered: list[str] = []
        fetched = failed = 0
        for seq, row in enumerate(scheduled, start=1):
            crawl_log.append((rnd, seq, row["url_canon"]))
            page = docs.get(row["url_canon"])
            if page is None:
                row["status"] = "FAILED"
                failed += 1
            else:
                row["status"] = "SUCCESS"
                fetched += 1
                row["title"] = next(
                    (s["text"] for s in page["spans"]
                     if s["kind"] == "title" and s["text"]), None)
                base = row["host"]
                for s in page["spans"]:
                    if s["kind"] == "a" and s["media_ref"]:
                        url = resolve_href(s["media_ref"], base)
                        if same_domain(url, base):
                            discovered.append(url)
            row["round_fetched"] = rnd

        admit_counters = admit(discovered, rnd)
        metrics.append({"round": rnd, "scheduled": len(scheduled),
                        "fetched": fetched, "failed": failed, **admit_counters})

    return OracleResult(crawl_log=crawl_log, frontier=frontier, metrics=metrics)
