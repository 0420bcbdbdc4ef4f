"""As-of join semantics: latest-at-or-before, ties, tolerance, no-match."""

from pyspark.sql import functions as F

from llacie_spark.operators.asof import asof_join


def _mk(spark):
    left = spark.createDataFrame(
        [("k1", "2020-01-01 10:00:00", "e1"),
         ("k1", "2020-01-01 12:00:00", "e2"),
         ("k2", "2020-01-01 09:00:00", "e3")],
        "k string, ts string, eid string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("k1", "2020-01-01 09:30:00", 1.0),
         ("k1", "2020-01-01 10:00:00", 2.0),   # tie with e1: right wins
         ("k1", "2020-01-01 11:00:00", 3.0),
         ("k3", "2020-01-01 08:00:00", 9.0)],
        "k string, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    return left, right


def test_asof_latest_at_or_before(spark):
    left, right = _mk(spark)
    out = {r.eid: r.asof_v for r in asof_join(left, right, on="k").collect()}
    assert out == {"e1": 2.0, "e2": 3.0, "e3": None}  # tie matches; no right for k2


def test_asof_tolerance(spark):
    left, right = _mk(spark)
    out = {
        r.eid: r.asof_v
        for r in asof_join(left, right, on="k", tolerance_s=1800).collect()
    }
    # e2 at 12:00 vs match 11:00 = 3600s > 1800 -> nulled
    assert out == {"e1": 2.0, "e2": None, "e3": None}


def test_asof_single_shuffle(spark):
    left, right = _mk(spark)
    plan = asof_join(left, right, on="k")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1  # one shuffle on the key
