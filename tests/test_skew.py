"""Skew handling: AQE skew-join splitting + salted-join correctness under a
Zipfian hot key (the concept-frequency skew the north rule calls out)."""

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    """One key holds ~95% of the fact rows; with skew-join thresholds scaled
    to the test data, AQE's final plan marks the join skew=true (split into
    subpartitions) and results stay correct."""
    conf = spark.conf
    def _get(k):
        try:
            return conf.get(k)
        except Exception:
            return None

    saved = {
        k: _get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        hot = spark.range(0, 190_000).select(
            F.lit("fever").alias("key"), F.col("id").alias("payload")
        )
        cold = spark.range(0, 10_000).select(
            F.concat(F.lit("k"), (F.col("id") % 100)).alias("key"),
            F.col("id").alias("payload"),
        )
        facts = hot.unionByName(cold)
        dim = spark.createDataFrame(
            [("fever", 1)] + [(f"k{i}", i) for i in range(100)], "key string, attr int"
        )
        joined = facts.join(dim, "key")
        n = len(joined.collect())  # execute THIS plan (AQE finalizes in place)
        assert n == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:800]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_salted_linking_handles_hot_surface_form(spark, vocab):
    """Zipf-head concept ('fever' dominates mentions): salted candidate
    generation spreads the hot n-gram over B reducers with identical output."""
    from llacie_spark.operators.linking import link_mentions_relational

    rows = [(f"d{i}", ["fever", f"unique term {i}"]) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id string, mentions array<string>")
    concepts = spark.createDataFrame(vocab.to_rows())
    plain = link_mentions_relational(df, concepts)
    salted = link_mentions_relational(df, concepts, salt_buckets=8)
    a = {(r.doc_id, r.label_name, r.line_number) for r in plain.collect()}
    b = {(r.doc_id, r.label_name, r.line_number) for r in salted.collect()}
    assert a == b
    assert len(a) == 500  # every doc linked fever
