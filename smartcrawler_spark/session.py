"""SparkSession factory with scale-oriented defaults.

Settings chosen for the 100 TB design point (they are also correct on
local[32]):

* AQE on (runtime re-plan, skew-join splitting, partition coalescing)
* Arrow on (all our Python is vectorized pandas UDFs)
* shuffle partitions sized by env (32 in sandbox; thousands on a cluster)
* driver memory 20 GiB by default (SPARK_GRAFT_DRIVER_MEM overrides): in
  local mode the driver JVM hosts every executor thread, and the r6
  measurement showed the 30M-URL frontier round spending ~25% of its wall
  in GC at 8 GiB (40s -> 27-29s at 16-28 GiB, flat beyond 20)
* broadcast threshold left default — small dims (robots rules, dup sets)
  are broadcast explicitly with F.broadcast where we *know* they are small.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

# application ids whose python workers were already pre-warmed (getOrCreate
# returns the same context repeatedly; warm once per JVM, not per call)
_PREWARMED: set[str] = set()


def _prewarm_python_workers(spark: SparkSession) -> None:
    """Fork one executor Python worker per core and pay the pandas/pyarrow
    import inside each, at session-build time.

    With spark.python.worker.reuse (default on) the warmed workers survive
    and every later vectorized-UDF stage starts at steady state. Before r6
    the first frontier round's Arrow scoring UDF did this implicitly; once
    relevance scoring moved to the JVM the ~2-5 s one-time worker
    fork+import cost fell on whatever pandas-UDF query happened to run
    first. This is engine setup over constant literals — it reads no input
    data. SPARK_GRAFT_PREWARM=0 disables."""
    if os.environ.get("SPARK_GRAFT_PREWARM", "1") == "0":
        return
    app_id = spark.sparkContext.applicationId
    if app_id in _PREWARMED:
        return
    _PREWARMED.add(app_id)
    from pyspark.sql import functions as F  # noqa: PLC0415

    # lambda form: type-hint inference can't see a function-local `pd`
    # binding under `from __future__ import annotations`
    _ident = F.pandas_udf(lambda s: s, "long")

    n = max(spark.sparkContext.defaultParallelism, 1)
    (
        spark.range(n, numPartitions=n)
        .select(_ident("id").alias("id"))
        .write.format("noop").mode("overwrite").save()
    )


def get_spark(
    app_name: str = "smartcrawler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the frontier engine."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    # make the package importable by executor python workers when executors
    # are separate processes (local-cluster / real cluster). On a real
    # cluster this is `spark-submit --py-files smartcrawler_spark.zip`.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exec_pythonpath = os.environ.get("PYTHONPATH", "")
    exec_pythonpath = f"{repo_root}:{exec_pythonpath}" if exec_pythonpath else repo_root
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # prefer shuffled-hash over sort-merge when a build side fits its
        # partition (guide §3.1): the frontier's (url_hash, url_canon) joins
        # pay two big string sorts under SMJ for nothing; r6 A/B at a 30M-URL
        # round: 27-29s -> 24.5-25.3s.  The AQE threshold converts SMJ to
        # SHJ at runtime when every post-shuffle partition is < 64 MB —
        # partition-local sizing, valid at any cluster scale.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "20g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.executorEnv.PYTHONPATH", exec_pythonpath)
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    _prewarm_python_workers(spark)
    return spark
