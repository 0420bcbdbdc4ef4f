"""Measure ann_lsh_topk recall@k vs brute_force_topk (VERDICT round-1 item 7).

Two regimes, because hyperplane LSH's usefulness depends on the target
cosine (see ann_lsh_topk docstring):

1. near-dup retrieval (planted perturbations, cos >= ~0.95) — the regime
   ANN is FOR; recall should be high at modest (n_planes, n_tables).
2. mid-cosine top-k over the sf0.01 embeddings (random-ish vectors) — the
   regime where LSH is documented NOT to pay off; the measured numbers
   quantify that honestly.

Prints a markdown table for COVERAGE.md plus the candidate-scan fraction
(mean candidates per query / corpus size) — recall without cost is
meaningless.

Usage: python scripts/ann_recall.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
SF_DIR = _pos[0] if _pos else "/root/testdata/sf0.01"
K = 10
N_QUERIES = 50
SETTINGS = [(8, 1), (8, 4), (8, 8), (12, 8), (16, 16)]


def planted_corpus(spark, n_base=400, n_queries=N_QUERIES, dim=64, dups_per_query=12, noise=0.12):
    """Base vectors + per-query planted near-duplicates (cos ~ 0.95-0.99)."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(n_base, dim))
    rows = []
    vid = 0
    queries = []
    for i in range(n_base):
        rows.append((vid, [float(x) for x in base[i]]))
        if i < n_queries:
            queries.append(vid)
        vid += 1
    for qi in range(n_queries):
        for _ in range(dups_per_query):
            v = base[qi] + noise * rng.normal(size=dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, df.where(df.vec_id.isin(queries))


def measure(spark, queries, corpus, dim, regime):
    from pyspark.sql import functions as F

    from llacie_spark.operators.similarity import ann_lsh_topk, brute_force_topk, hyperplanes, lsh_bucket

    corpus = corpus.cache()
    n_corpus = corpus.count()
    truth = brute_force_topk(queries, corpus, k=K, vec_col="embedding").select(
        "query_id", "neighbor_id"
    )
    truth_set = {(r.query_id, r.neighbor_id) for r in truth.collect()}
    out = []
    for n_planes, n_tables in SETTINGS:
        got = ann_lsh_topk(
            queries, corpus, k=K, n_planes=n_planes, n_tables=n_tables, dim=dim
        ).select("query_id", "neighbor_id")
        got_set = {(r.query_id, r.neighbor_id) for r in got.collect()}
        recall = len(got_set & truth_set) / len(truth_set)
        # candidate fraction: distinct candidate pairs / (n_queries * corpus)
        tables = [hyperplanes(dim, n_planes, 42 + 7919 * t) for t in range(n_tables)]

        def bucketed(df, out_id):
            return df.select(
                F.col("vec_id").alias(out_id),
                F.posexplode(
                    F.array(*[lsh_bucket(F.col("embedding"), pl) for pl in tables])
                ).alias("table", "bucket"),
            )

        n_cand = (
            bucketed(queries, "query_id")
            .join(bucketed(corpus, "neighbor_id"), ["table", "bucket"])
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
            .distinct()
            .count()
        )
        frac = n_cand / (queries.count() * n_corpus)
        out.append((n_planes, n_tables, recall, frac))
        print(
            f"[{regime}] planes={n_planes:>2} tables={n_tables:>2} "
            f"recall@{K}={recall:.3f} scanned={frac:.3%}",
            flush=True,
        )
    corpus.unpersist()
    return out


# (n_centroids, n_probe): the 32-centroid column is the r3 baseline; the
# 128-centroid rows measure the deployable knob — scale the centroid count
# with the corpus (the sqrt(N) rule) and keep probe moderate, comparing
# recall at MATCHED scan fractions (32/2 vs 128/8 both scan ~6%, etc.)
IVF_SETTINGS = [(32, 2), (32, 4), (32, 8), (32, 16), (128, 8), (128, 16), (128, 32)]


def measure_ivf(spark, queries, corpus, dim, regime):
    from llacie_spark.operators.similarity import brute_force_topk, ivf_topk, train_centroids

    corpus = corpus.cache()
    truth = brute_force_topk(queries, corpus, k=K).select("query_id", "neighbor_id")
    truth_set = {(r.query_id, r.neighbor_id) for r in truth.collect()}
    out = []
    for n_centroids, n_probe in IVF_SETTINGS:
        cents = train_centroids(corpus, n_centroids=n_centroids, dim=dim)
        got = ivf_topk(
            queries, corpus, k=K, centroids=cents, n_probe=n_probe, dim=dim
        ).select("query_id", "neighbor_id")
        got_set = {(r.query_id, r.neighbor_id) for r in got.collect()}
        recall = len(got_set & truth_set) / len(truth_set)
        frac = n_probe / n_centroids  # cell sizes ~balanced after k-means
        out.append((n_centroids, n_probe, recall, frac))
        print(
            f"[ivf/{regime}] centroids={n_centroids} probe={n_probe} "
            f"recall@{K}={recall:.3f} scanned~{frac:.1%}",
            flush=True,
        )
    corpus.unpersist()
    return out


# (n_probe, refine) at a fixed 128-centroid grid: the PQ question is how
# much the code-only first pass costs in recall when the exact re-rank is
# capped at `refine` candidates — compared against plain IVF at the SAME
# scan fraction, where every candidate gets the exact-cosine treatment.
IVF_PQ_SETTINGS = [(8, 32), (8, 128), (16, 32), (16, 128), (32, 128)]


def measure_ivf_pq(spark, queries, corpus, dim, regime):
    from llacie_spark.operators.similarity import (
        brute_force_topk,
        ivf_pq_topk,
        ivf_topk,
        train_centroids,
        train_pq,
    )

    corpus = corpus.cache()
    truth = brute_force_topk(queries, corpus, k=K).select("query_id", "neighbor_id")
    truth_set = {(r.query_id, r.neighbor_id) for r in truth.collect()}
    cents = train_centroids(corpus, n_centroids=128, dim=dim)
    books = train_pq(corpus, m=8, n_codes=16, dim=dim)
    out = []
    for n_probe, refine in IVF_PQ_SETTINGS:
        got = ivf_pq_topk(
            queries, corpus, k=K, centroids=cents, codebooks=books,
            n_probe=n_probe, refine=refine, dim=dim,
        ).select("query_id", "neighbor_id")
        got_set = {(r.query_id, r.neighbor_id) for r in got.collect()}
        recall = len(got_set & truth_set) / len(truth_set)
        plain = ivf_topk(
            queries, corpus, k=K, centroids=cents, n_probe=n_probe, dim=dim
        ).select("query_id", "neighbor_id")
        plain_set = {(r.query_id, r.neighbor_id) for r in plain.collect()}
        plain_recall = len(plain_set & truth_set) / len(truth_set)
        frac = n_probe / 128
        out.append((n_probe, refine, recall, plain_recall, frac))
        print(
            f"[ivf-pq/{regime}] probe={n_probe} refine={refine} "
            f"recall@{K}={recall:.3f} (plain IVF {plain_recall:.3f}) "
            f"scanned~{frac:.1%} (codes-only; floats only for {refine}/query)",
            flush=True,
        )
    corpus.unpersist()
    return out


def main():
    from llacie_spark.session import get_spark

    spark = get_spark(app_name="ann-recall", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    ivf_only = "--ivf-only" in sys.argv
    pq_only = "--ivf-pq-only" in sys.argv
    if not ivf_only and not pq_only:
        planted, pq_queries = planted_corpus(spark)
        near = measure(spark, pq_queries, planted, dim=64, regime="near-dup")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.orderBy("vec_id").limit(N_QUERIES)
    if not ivf_only and not pq_only:
        mid = measure(spark, queries, emb, dim=dim, regime="mid-cos")
    if not pq_only:
        mid_ivf = measure_ivf(spark, queries, emb, dim=dim, regime="mid-cos")
    # --ivf-only keeps its historical meaning (plain IVF grid only); the PQ
    # sweep runs in the default full pass or under --ivf-pq-only
    mid_pq = None if ivf_only else measure_ivf_pq(
        spark, queries, emb, dim=dim, regime="mid-cos"
    )

    if not ivf_only and not pq_only:
        print("\n| regime | n_planes | n_tables | recall@10 | corpus scanned/query |")
        print("|---|---|---|---|---|")
        for regime, rows in (("near-dup (planted, cos>=0.95)", near), ("mid-cosine (sf0.01)", mid)):
            for p, t, r, f in rows:
                print(f"| {regime} | {p} | {t} | {r:.3f} | {f:.2%} |")
    if not pq_only:
        print("\n| regime | n_centroids | n_probe | recall@10 | corpus scanned/query |")
        print("|---|---|---|---|---|")
        for c, p, r, f in mid_ivf:
            print(f"| mid-cosine IVF (sf0.01) | {c} | {p} | {r:.3f} | ~{f:.1%} |")
    if mid_pq is not None:
        print("\n| regime | n_probe | refine | IVF-PQ recall@10 | plain-IVF recall@10 | scanned (codes) |")
        print("|---|---|---|---|---|---|")
        for p, rf, r, pr, f in mid_pq:
            print(f"| mid-cosine IVF-PQ m=8 (sf0.01) | {p} | {rf} | {r:.3f} | {pr:.3f} | ~{f:.1%} |")
    spark.stop()


if __name__ == "__main__":
    main()
