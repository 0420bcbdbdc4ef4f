"""Ad-hoc measurement experiments for the r07 optimization round.

Each experiment times alternative formulations with the noop sink and
verifies EXACT result equality (collected and compared) before any
formulation is promoted into the operators. Not part of the bench contract.

Run: python scripts/r07_experiments.py <exp> [--sf DIR]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402


def timed(spark, df, label, runs=3):
    spark.sparkContext.setJobDescription(label)
    df.write.format("noop").mode("overwrite").save()  # warm
    best = None
    for _ in range(runs):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: best {best:.3f}s")
    return best


def assert_equal(df_a, df_b, label):
    a = sorted(map(tuple, df_a.collect()))
    b = sorted(map(tuple, df_b.collect()))
    assert a == b, f"{label}: MISMATCH ({len(a)} vs {len(b)} rows)"
    print(f"{label}: identical ({len(a)} rows)")


def exp_lang(spark, sf):
    """Current HOF-based lang_guess/quality vs regexp_count formulation."""
    from llacie_spark.operators import textstats

    d = spark.read.parquet(f"{sf}/documents.parquet")

    def rc_hits(c, words):
        pat = "(^|\\s)(" + "|".join(words) + ")(?=$|\\s)"
        return F.regexp_count(c, F.lit(pat))

    def rc_lang(c):
        hits = {
            lang: rc_hits(c, ws)
            for lang, ws in textstats.LANG_MARKERS.items()
            if ws
        }
        best = F.greatest(*hits.values())
        expr = F.when(c.rlike("[一-鿿]"), F.lit("zh"))
        for lang in ["en", "de", "es", "fr"]:
            expr = expr.when((best > 0) & (hits[lang] == best), F.lit(lang))
        return expr.otherwise(F.lit("und"))

    cur = d.select("doc_id", textstats.lang_guess("text").alias("lang"))
    new = d.select("doc_id", rc_lang(F.col("text")).alias("lang"))
    assert_equal(cur, new, "lang_guess rc")
    timed(spark, cur, "lang_guess current")
    timed(spark, new, "lang_guess regexp_count")

    # token_count equivalence: size(split(trim)) == greatest(regexp_count(\S+),1)
    tc_cur = d.select("doc_id", textstats.token_count("text").alias("tc"))
    tc_new = d.select(
        "doc_id",
        F.greatest(F.regexp_count("text", F.lit("\\S+")), F.lit(1)).alias("tc"),
    )
    assert_equal(tc_cur, tc_new, "token_count rc")
    # punct_ratio equivalence
    pr_cur = d.select("doc_id", F.round(textstats.punct_ratio("text"), 4).alias("pr"))
    pr_new = d.select(
        "doc_id",
        F.round(
            F.regexp_count("text", F.lit("[^A-Za-z0-9\\s]"))
            / F.greatest(F.length("text"), F.lit(1)),
            4,
        ).alias("pr"),
    )
    assert_equal(pr_cur, pr_new, "punct_ratio rc")


def exp_jaccard(spark, sf):
    """Stage decomposition of jaccard_pairs at this sf."""
    from llacie_spark.operators import dedup

    d = spark.read.parquet(f"{sf}/documents.parquet")
    sh = dedup.shingles(d, "doc_id", "text", 3)
    sh = sh.persist()
    t0 = time.time()
    n = sh.count()
    print(f"shingle rows: {n} (materialize {time.time()-t0:.2f}s)")
    print("distinct shingles:", sh.select("shingle").distinct().count())
    counts = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    timed(spark, counts, "df-counts agg")
    hot = counts.where(F.col("df") > 1000)
    print("hot shingles:", hot.count())
    sh2 = sh.join(hot.select("shingle"), "shingle", "left_anti").persist()
    print("capped shingle rows:", sh2.count())
    sizes = sh2.groupBy("doc_id").agg(F.count("*").alias("sz"))
    timed(spark, sizes, "sizes agg")
    a, b = sh2.alias("a"), sh2.alias("b")
    joined = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    common = joined.groupBy(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    ).agg(F.count("*").alias("common"))
    t0 = time.time()
    nc = common.count()
    print(f"common pairs: {nc} ({time.time()-t0:.2f}s first)")
    timed(spark, common, "self-join + pair agg", runs=2)
    # candidate volume for prefix filtering at t=0.8
    from pyspark.sql.window import Window

    t = 0.8
    sh3 = sh2.join(counts, "shingle")
    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("shingle").asc())
    ranked = sh3.select(
        "doc_id", "shingle",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("sz"),
    )
    prefix = ranked.where(
        F.col("rn") <= F.col("sz") - F.ceil(F.col("sz") * t - 1e-9) + 1
    ).select("doc_id", "shingle").persist()
    print("prefix rows:", prefix.count())
    pa, pb = prefix.alias("a"), prefix.alias("b")
    cands = (
        pa.join(pb, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    t0 = time.time()
    print("prefix-join rows:", cands.count(), f"({time.time()-t0:.2f}s)")
    t0 = time.time()
    print("distinct candidate pairs:", cands.distinct().count(), f"({time.time()-t0:.2f}s)")
    sh2.unpersist(); sh.unpersist(); prefix.unpersist()


def exp_simhash(spark, sf):
    """Stage decomposition of simhash_pairs."""
    from llacie_spark.operators import dedup
    from llacie_spark.operators.porthash import portable_hash60
    from llacie_spark.operators.textstats import normalized_text

    d = spark.read.parquet(f"{sf}/documents.parquet")
    toks = (
        d.select(F.col("doc_id"), F.explode(F.split(normalized_text("text"), " ")).alias("tok"))
        .where("tok != ''")
    )
    timed(spark, toks, "token explode only")
    hashed = toks.withColumn("h", portable_hash60(F.col("tok")))
    timed(spark, hashed, "explode + md5-hash")
    sigs = dedup.simhash(d, "doc_id", "text", bits=60, token_hash=portable_hash60)
    timed(spark, sigs, "full signatures (60 bit-sums)")
    pairs = dedup.simhash_pairs(d, "doc_id", "text", max_hamming=3, bits=60, token_hash=portable_hash60)
    timed(spark, pairs, "full simhash_pairs")


def exp_knn(spark, sf):
    """HOF cosine vs unrolled codegen cosine: bit-equality + timing."""
    from llacie_spark.operators import similarity

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    q = emb.where("vec_id < 10").select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv"))

    def unrolled_dot(a, b, n):
        expr = F.lit(0.0)
        for j in range(1, n + 1):
            expr = expr + F.element_at(a, j).cast("double") * F.element_at(b, j).cast("double")
        return expr

    def unrolled_norm(a, n):
        expr = F.lit(0.0)
        for j in range(1, n + 1):
            expr = expr + F.element_at(a, j).cast("double") * F.element_at(a, j).cast("double")
        return expr

    def unrolled_cos(a, b, n):
        return unrolled_dot(a, b, n) / (F.sqrt(unrolled_norm(a, n)) * F.sqrt(unrolled_norm(b, n)))

    base = F.broadcast(q).crossJoin(c).where(F.col("query_id") != F.col("neighbor_id"))
    cur = base.select("query_id", "neighbor_id", similarity.cosine(F.col("qv"), F.col("cv")).alias("cos"))
    new = base.select("query_id", "neighbor_id", unrolled_cos(F.col("qv"), F.col("cv"), dim).alias("cos"))
    assert_equal(cur, new, "cosine bit-equality")
    timed(spark, cur, "cosine HOF")
    timed(spark, new, "cosine unrolled")


EXPS = {"lang": exp_lang, "jaccard": exp_jaccard, "simhash": exp_simhash, "knn": exp_knn}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("exp", choices=sorted(EXPS))
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    spark = bench._make_spark(args.cpus, f"r07-exp-{args.exp}", prewarm=False)
    EXPS[args.exp](spark, args.sf)
    spark.stop()
