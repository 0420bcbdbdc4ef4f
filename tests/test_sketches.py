"""Approximate aggregates: the A5/A6 scale path.

Exact COUNT(DISTINCT) over 10^12 keys is a full shuffle of every key; the
sketch forms (HyperLogLog++ `approx_count_distinct`, KLL-style
`percentile_approx`) are single-pass, mergeable, fixed-memory — the only
viable form at 100 TB. These tests pin their error against the exact
answers on the test tables so the accuracy tradeoff is a measured fact,
not folklore. (No DuckDB oracle: sketch estimates are algorithm-specific,
so cross-engine hashes can't match by design — exact twins `distinct_counts`
/ `percentiles` remain the oracle-checked queries.)
"""

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_rsd(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    exact = orders.select(F.countDistinct("o_custkey")).first()[0]
    est = orders.select(F.approx_count_distinct("o_custkey", rsd=0.02)).first()[0]
    assert abs(est - exact) / exact < 0.06  # 3 sigma of the requested rsd


def test_hll_grouped_and_mergeable(spark):
    """Per-group sketches: the shape that replaces exact distinct at scale."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    both = (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("exact"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("est"),
        )
        .collect()
    )
    assert len(both) > 1
    for r in both:
        assert abs(r.est - r.exact) / r.exact < 0.06


def test_percentile_approx_bounds(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    row = li.select(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("est"),
    ).first()
    assert abs(row.est - row.exact) / row.exact < 0.01
