"""ANN recall floor: ann_lsh_topk must retrieve planted near-duplicates.

Hyperplane LSH's contract regime is high-cosine retrieval (near-dup search);
this pins a measured floor so a user can trust ANN before swapping it in for
brute force. The full measured recall/cost table (both regimes, more
settings) lives in COVERAGE.md and is produced by scripts/ann_recall.py.
"""

import numpy as np
import pytest

from llacie_spark.operators.similarity import ann_lsh_topk, brute_force_topk

DIM = 32


@pytest.fixture(scope="module")
def planted(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(120, DIM))
    rows, vid = [], 0
    query_ids = []
    for i in range(120):
        rows.append((vid, [float(x) for x in base[i]]))
        if i < 15:
            query_ids.append(vid)
        vid += 1
    for qi in range(15):  # 8 near-dups per query, cos ~ 0.95+
        for _ in range(8):
            v = base[qi] + 0.12 * rng.normal(size=DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    queries = corpus.where(corpus.vec_id.isin(query_ids))
    return queries, corpus


def _pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.select("query_id", "neighbor_id").collect()}


def test_ann_recall_floor_on_near_dups(spark, planted):
    queries, corpus = planted
    truth = _pairs(brute_force_topk(queries, corpus, k=8))
    got = _pairs(ann_lsh_topk(queries, corpus, k=8, n_planes=6, n_tables=6, dim=DIM))
    recall = len(got & truth) / len(truth)
    assert recall >= 0.85, f"recall@8 {recall:.3f} below floor"


def test_more_tables_monotonically_help(spark, planted):
    """L=1 vs L=6: multi-table probing must not reduce recall."""
    queries, corpus = planted
    truth = _pairs(brute_force_topk(queries, corpus, k=8))
    r1 = len(_pairs(ann_lsh_topk(queries, corpus, k=8, n_planes=6, n_tables=1, dim=DIM)) & truth)
    r6 = len(_pairs(ann_lsh_topk(queries, corpus, k=8, n_planes=6, n_tables=6, dim=DIM)) & truth)
    assert r6 >= r1


def test_ivf_beats_lsh_on_mid_cosine(spark):
    """IVF is the mid-cosine scale path: on quasi-random vectors (the regime
    where hyperplane LSH recall collapses — see COVERAGE.md), IVF probing
    25% of cells must clear 0.5 recall@10."""
    from llacie_spark.operators.similarity import ivf_topk, train_centroids

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=DIM)]) for i in range(500)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()
    queries = corpus.where(corpus.vec_id < 20)
    truth = _pairs(brute_force_topk(queries, corpus, k=10))
    cents = train_centroids(corpus, n_centroids=32, dim=DIM, seed=5)
    got = _pairs(ivf_topk(queries, corpus, k=10, centroids=cents, n_probe=8, dim=DIM))
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5, f"IVF recall@10 {recall:.3f} below floor"


def test_ivf_full_probe_is_exact(spark, planted):
    """Probing every cell must reproduce brute force exactly (sanity: the
    index partitions the corpus, it never drops vectors)."""
    from llacie_spark.operators.similarity import ivf_topk, train_centroids

    queries, corpus = planted
    cents = train_centroids(corpus, n_centroids=8, dim=DIM, seed=5)
    truth = _pairs(brute_force_topk(queries, corpus, k=5))
    got = _pairs(ivf_topk(queries, corpus, k=5, centroids=cents, n_probe=8, dim=DIM))
    assert got == truth


def test_ivf_pq_full_probe_no_refine_is_exact(spark, planted):
    """IVF-PQ oracle gate: full probe + refine=None — the ADC code-scoring
    pass runs over every candidate but cannot drop anyone, so the exact
    re-rank must reproduce brute force EXACTLY (ranks and neighbors)."""
    from llacie_spark.operators.similarity import ivf_pq_topk, train_centroids, train_pq

    queries, corpus = planted
    cents = train_centroids(corpus, n_centroids=8, dim=DIM, seed=5)
    books = train_pq(corpus, m=4, n_codes=8, dim=DIM, seed=5)
    truth = brute_force_topk(queries, corpus, k=5)
    got = ivf_pq_topk(
        queries, corpus, k=5, centroids=cents, codebooks=books,
        n_probe=8, refine=None, dim=DIM,
    )
    t = {(r.query_id, r.neighbor_id, r.rank) for r in truth.collect()}
    g = {(r.query_id, r.neighbor_id, r.rank) for r in got.collect()}
    assert g == t


def test_ivf_pq_refine_bounds_rerank_but_keeps_neardups(spark, planted):
    """Finite refine: the PQ first pass keeps near-dup recall high (ADC
    ranks planted near-identical vectors near the top) while bounding the
    exact re-rank to `refine` candidates per query."""
    from llacie_spark.operators.similarity import ivf_pq_topk, train_centroids, train_pq

    queries, corpus = planted
    cents = train_centroids(corpus, n_centroids=8, dim=DIM, seed=5)
    books = train_pq(corpus, m=4, n_codes=8, dim=DIM, seed=5)
    truth = _pairs(brute_force_topk(queries, corpus, k=8))
    got = _pairs(
        ivf_pq_topk(
            queries, corpus, k=8, centroids=cents, codebooks=books,
            n_probe=8, refine=24, dim=DIM,
        )
    )
    recall = len(got & truth) / len(truth)
    assert recall >= 0.8, f"IVF-PQ recall@8 {recall:.3f} below floor"
