"""Reference-mode (two-phase main()) parity: engine == oracle on crawl
order, frontier, statuses, titles; cap 3 vs 10; duplicate/template phase 3."""

from __future__ import annotations

import pytest

from smartcrawler_spark.oracle import reference_crawl as oracle_ref
from smartcrawler_spark.plans.reference_mode import reference_crawl as engine_ref
from smartcrawler_spark.sources.corpus import CorpusConfig, generate_corpus

KEYWORDS = {"news": 2.0, "docs": 1.0}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("refcorpus"))
    m = generate_corpus(d, CorpusConfig(n_hosts=3, pages_per_host=10, hot_host_pages=10))
    return d, m


def _check(spark, corpus_dir, initial, prep):
    want = oracle_ref(corpus_dir, initial, prep=prep, keywords=KEYWORDS)
    got = engine_ref(spark, corpus_dir, initial, prep=prep, keywords=KEYWORDS)

    glog = [(r["round"], r["seq"], r["url_canon"])
            for r in got.crawl_log.orderBy("round", "seq").collect()]
    assert glog == want.crawl_log

    gfr = {r["url_canon"]: (r["status"], r["title"]) for r in got.frontier.collect()}
    wfr = {u: (r["status"], r["title"]) for u, r in want.frontier.items()}
    assert gfr == wfr
    assert len(gfr) <= (10 if prep else 3)
    return got, want


def test_normal_mode_cap3(spark, corpus):
    d, m = corpus
    got, want = _check(spark, d, "https://site001.example.com/news/item3?page=3", prep=False)
    # phase 3 = duplicate analysis; with <=3 pages the shared nav/footer
    # must appear as duplicate signatures when >=2 pages succeeded
    n_success = sum(1 for r in want.frontier.values() if r["status"] == "SUCCESS")
    dups = got.analysis.collect()
    if n_success >= 2:
        assert len(dups) > 0
    assert all(r["n"] >= 2 for r in dups)


def test_prep_mode_cap10_templates(spark, corpus):
    d, m = corpus
    got, want = _check(spark, d, "https://site002.example.com/", prep=True)
    # prep cap (10) admits more than the normal cap (3) would; bounded by
    # the root page's distinct same-domain links + the root itself
    assert 3 < len(want.frontier) <= 10
    tpl = got.analysis.collect()
    assert len(tpl) > 0
    assert all("{" in r["pattern"] for r in tpl)


def test_initial_equals_root(spark, corpus):
    d, m = corpus
    got, want = _check(spark, d, "https://site000.example.com/", prep=False)
    # exactly one seed (root==initial); crawl_log round 1 fetches it
    assert want.crawl_log[0] == (1, 1, "https://site000.example.com/")


def test_failed_initial_refetched_in_phase2(spark, corpus):
    d, m = corpus
    # nonexistent page on a real host: phase 1 fails, phase 2 retries it
    got, want = _check(spark, d, "https://site000.example.com/news/item9999", prep=False)
    rounds = [r for r, _, u in want.crawl_log
              if u == "https://site000.example.com/news/item9999"]
    assert rounds == [1, 2]
