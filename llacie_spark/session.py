"""SparkSession factory with the settings this pipeline assumes.

Defaults target correctness + scale hygiene (SURVEY.md §4): AQE on (runtime
re-plan, skew-join splitting), Arrow for pandas UDFs with bounded batch size
(one giant note can't stall an Arrow batch — the byterm-sharding lesson,
``llacie/strategies/feature/presenting_sx/llama3_8b_byterm.py:88-93``), and a
shuffle-partition count sized for local runs (cluster deploys override via
spark-submit conf; AQE coalesces anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "llacie-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def prewarm_python_workers(spark: SparkSession, passes: int = 2) -> None:
    """Force-start one Python UDF worker per core before timing anything.

    Spark's local-mode Python worker creation is effectively serialized and
    each worker pays the pandas/pyarrow import (~2-3 s), so the first jobs
    on a 32-core session can spend 60-80 s just forking workers. Running a
    trivial pandas UDF over exactly ``defaultParallelism`` partitions (twice
    — creation keeps converging during the first job) moves that cost out of
    measured runs. On a real cluster the same role is played by executor
    warm-up; benchmarks report steady-state throughput either way.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    _noop = F.pandas_udf(lambda x: x, "long")

    n = spark.sparkContext.defaultParallelism
    for _ in range(passes):
        spark.range(0, n, numPartitions=n).select(_noop("id")).write.format(
            "noop"
        ).mode("overwrite").save()
