"""smartcrawler_spark — a from-scratch PySpark-native crawl-frontier engine.

Re-expresses the capabilities of brainless/SmartCrawler (reference checkout at
/root/reference, Rust v0.4.1) as declarative Spark DataFrame stages:

* URL canonicalization + hashing            (functions.urls)
* frontier URL-seen dedup w/ bloom+cuckoo   (operators.frontier)
* per-host politeness-budgeted priority queue with skew salting
* robots.txt prefix gating
* interleaved text/media span documents     (sources.corpus, operators.spans)
* cross-page duplicate detection/marking    (operators.spans)
* template detection                        (functions.templates)
* training-data ops: dedup / similarity / text quality (operators.*)

Everything is DataFrame-native; Python appears only inside Arrow-vectorized
pandas UDFs (no per-row Python UDFs anywhere).
"""

__version__ = "0.1.0"
