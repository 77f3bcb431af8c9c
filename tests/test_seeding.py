"""S1 CLI domain validation (cli.rs:68-133 golden ports) and S8 --links
seeding, including a --links crawl through the full engine."""

from __future__ import annotations

import pytest

from smartcrawler_spark.functions.urls import extract_seed_domain, seeds_from_links


def test_extract_domain_reference_goldens():
    assert extract_seed_domain("https://example.com") == "example.com"
    assert extract_seed_domain("http://example.com/path") == "example.com"
    assert extract_seed_domain("example.com") == "example.com"
    assert extract_seed_domain("  example.com  ") == "example.com"
    assert extract_seed_domain("invalid..domain") == "invalid..domain"


def test_extract_domain_error():
    with pytest.raises(ValueError, match="Invalid domain or URL"):
        extract_seed_domain("://invalid")


def test_seeds_from_links():
    links = ["https://a.example.com/deep/page", "b.example.com/x"]
    plain = seeds_from_links(links)
    assert plain == [
        "https://a.example.com/deep/page",
        "https://b.example.com/x",
    ]
    expanded = seeds_from_links(links, expand_domains=True)
    assert "https://a.example.com/" in expanded
    assert "https://b.example.com/" in expanded
    assert len(expanded) == 4


def test_links_seeded_crawl_matches_oracle(spark, tmp_path):
    """Seeding from deep links (not roots) flows through the whole engine
    and still ties out against the oracle."""
    from smartcrawler_spark.oracle import CrawlConfig, crawl
    from smartcrawler_spark.plans.crawl import CrawlJob, EngineConfig
    from smartcrawler_spark.sources.corpus import CorpusConfig, generate_corpus

    d = str(tmp_path / "c")
    generate_corpus(d, CorpusConfig(n_hosts=2, pages_per_host=8, hot_host_pages=8))
    seeds = seeds_from_links(
        ["https://site000.example.com/news/item3?page=3"], expand_domains=True
    )
    cfg_kw = {"docs": 1.5}
    job = CrawlJob(spark, d, str(tmp_path / "ck"),
                   EngineConfig(keywords=cfg_kw, max_urls_per_host=6, default_budget=3),
                   seeds)
    job.run()
    want = crawl(d, seeds, CrawlConfig(keywords=cfg_kw, max_urls_per_host=6,
                                       default_budget=3))
    got = [(r["round"], r["seq"], r["url_canon"])
           for r in job.crawl_log().orderBy("round", "seq").collect()]
    assert got == want.crawl_log
