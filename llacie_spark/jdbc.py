"""JDBC metadata source (S3/F5): the EDW scan as a pushed-predicate read.

The reference pulls episode/note metadata from an enterprise warehouse with
hand-chunked ``IN``-lists over a driver-side DBAPI cursor
(``/root/reference/llacie/edw.py:46-83``: ``fetch_metadata`` batches key
lists into ``IN (...)`` clauses of a few thousand ids). Spark-first, the
same access pattern is a ``spark.read.jdbc`` scan:

- column pruning and filter predicates push into the warehouse's SQL (the
  scan node shows ``PushedFilters`` — asserted by tests/test_jdbc.py), so
  the F5 quality predicates run warehouse-side, not post-transfer;
- the chunked-IN-list fan-out becomes ``predicates=[...]``: one Spark
  partition per chunk, all chunks fetched in parallel by executors instead
  of sequentially by the driver;
- for dense numeric keys, ``partitionColumn/lowerBound/upperBound`` range
  partitioning replaces explicit chunks entirely.

Tested against the Derby engine embedded in the Spark distribution — the
same wrapper points at Postgres/Oracle/Teradata in production by swapping
``url`` + ``driver``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def in_list_predicates(key_col: str, keys: Sequence, chunk: int = 1000) -> list[str]:
    """The reference's IN-list chunking as JDBC partition predicates: each
    chunk becomes one parallel partition's WHERE clause."""
    if not keys:
        return []

    def lit(k):
        # bool is an int subclass: check it FIRST or True/False render as the
        # bare words 'True'/'False' (invalid SQL in Derby/Oracle/Teradata);
        # None would render as the string 'None' — reject both (ADVICE r2).
        if k is None or isinstance(k, bool):
            raise ValueError(
                f"unsupported IN-list key {k!r}: use int/float/str keys "
                "(booleans and NULLs don't belong in an IN-list predicate)"
            )
        return str(k) if isinstance(k, (int, float)) else "'" + str(k).replace("'", "''") + "'"

    ks = list(keys)
    return [
        f"{key_col} IN ({', '.join(lit(k) for k in ks[i:i + chunk])})"
        for i in range(0, len(ks), chunk)
    ]


def read_table(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    predicates: list[str] | None = None,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Parallel JDBC scan. Exactly one parallelism mode may be used:
    ``predicates`` (one partition per WHERE clause — the IN-list analog) or
    ``partition_column`` + bounds (range split). Neither = single partition
    (metadata-sized reads). Filters/projections applied to the returned
    DataFrame push down into the source SQL."""
    props = {"fetchsize": str(fetchsize)}
    if driver:
        props["driver"] = driver
    if predicates is not None and partition_column is not None:
        raise ValueError("use either predicates or partition_column, not both")
    if predicates is not None:
        return spark.read.jdbc(url, table, predicates=list(predicates), properties=props)
    if partition_column is not None:
        return spark.read.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions or spark.sparkContext.defaultParallelism,
            properties=props,
        )
    return spark.read.jdbc(url, table, properties=props)


def fetch_metadata(
    spark: SparkSession,
    url: str,
    table: str,
    key_col: str,
    keys: Sequence,
    chunk: int = 1000,
    driver: str | None = None,
) -> DataFrame:
    """The edw.fetch_metadata shape: metadata rows for an explicit key set,
    fetched as ``ceil(len(keys)/chunk)`` parallel IN-list partitions."""
    return read_table(
        spark, url, table, driver=driver,
        predicates=in_list_predicates(key_col, keys, chunk),
    )
