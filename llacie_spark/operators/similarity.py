"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine` / :func:`dot` / :func:`norm` — JVM-side column expressions
  (``zip_with`` + ``aggregate``), double accumulation in array order so the
  DuckDB oracle reproduces results bit-for-bit.
- :func:`brute_force_topk` — exact top-k neighbors for a (small) query set:
  broadcast the queries, cross-join against the corpus, rank-window per
  query. The baseline and the verifier for the approximate path.
- :func:`lsh_bucket` / :func:`ann_lsh_topk` — the scale path: random
  hyperplane signatures (planes are fixed literals, seeded) bucket the
  corpus; a query only compares against its own bucket. At 10^12 rows the
  cross-join is impossible; the bucket join shuffles O(rows), and multiple
  probe tables (sign-flip probing) trade recall for fan-out.
- :func:`embedding_cosine_pairs` — near-duplicate detection by embedding:
  all pairs above a cosine threshold within LSH buckets.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    # An unrolled element_at chain was tried in r07 and reverted: measured
    # bit-identical but no faster at sf1.0 (2.85 vs 2.91 s) and slower at
    # sf0.1 (0.40 vs 0.59 s) — the 128-term expression tree loses codegen
    # and evaluates interpreted, worse than the HOF loop. Scan parallelism
    # (the _t widen), not the cosine form, was knn's actual bottleneck.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query row.

    (query_id, neighbor_id, cos) — queries are broadcast (small by contract);
    ranking uses (cos desc, neighbor_id asc) for determinism. Self-matches
    excluded."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit-free; only the sign matters)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit p set iff dot(vec, plane_p) >= 0.
    Planes are embedded as literals — pure JVM arithmetic, oracle-friendly."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        d = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(w)) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(d >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return bucket


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 1,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH.

    Recall/cost dials (standard LSH tradeoff, measured in COVERAGE.md §recall):
    - ``n_planes`` (k): each table has 2^k buckets → each table scans
      ~1/2^k of the corpus per query; per-plane collision probability for a
      pair at angle θ is 1 − θ/π, so a table finds a neighbor with p^k.
    - ``n_tables`` (L): independent plane sets; recall = 1 − (1 − p^k)^L,
      shuffle volume O(rows × L).

    Hyperplane LSH pays off when target neighbors are high-cosine (near-dup
    retrieval: cos ≥ 0.95 → p ≈ 0.9 → k=8, L=8 reaches ~99 % recall while
    scanning ~3 % of the corpus per query). For mid-cosine top-k
    (cos ≈ 0.3, p ≈ 0.6) no setting beats scanning most of the corpus —
    use brute force or an IVF/graph index instead; the measured table in
    COVERAGE.md quantifies exactly that.

    Plan shape at 10^12 rows: corpus explodes to L bucket entries, candidate
    generation is an equi-join on (table, bucket), pairs are deduplicated
    BEFORE vectors are re-gathered and scored — no cross-join anywhere."""
    tables = [hyperplanes(dim, n_planes, seed + 7919 * t) for t in range(n_tables)]

    def bucketed(df, out_id):
        return df.select(
            F.col(id_col).alias(out_id),
            F.posexplode(
                F.array(*[lsh_bucket(F.col(vec_col), pl) for pl in tables])
            ).alias("table", "bucket"),
        )

    cands = (
        bucketed(queries, "query_id")
        .join(bucketed(corpus, "neighbor_id"), ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()  # a pair may collide in several tables; score it once
    )
    scored = (
        cands.join(
            corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
            "neighbor_id",
        )
        .join(
            F.broadcast(queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))),
            "query_id",
        )
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def embedding_cosine_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs (cos >= threshold), LSH-bucketed:
    near-identical vectors land in the same sign bucket with high
    probability, so the self-join is per-bucket, not global."""
    planes = hyperplanes(dim, n_planes, seed)
    b = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.vid") < F.col("r.vid")))
        .select(
            F.col("l.vid").alias("vec_a"),
            F.col("r.vid").alias("vec_b"),
            cosine(F.col("l.v"), F.col("r.v")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


# ---------------------------------------------------------------------- IVF


def train_centroids(
    corpus: DataFrame,
    n_centroids: int = 64,
    dim: int = 64,
    sample_size: int = 20_000,
    iterations: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
):
    """Spherical k-means on a driver-side sample -> unit centroid matrix.

    Training on a bounded sample is the standard IVF recipe (FAISS trains
    on ~max(10k, 40*k) vectors regardless of corpus size): centroid quality
    converges long before the sample does, so the driver never sees more
    than ``sample_size`` rows no matter how big the corpus is. Assignment —
    the O(corpus) part — stays distributed (:func:`ivf_topk`)."""
    n_rows = corpus.count()
    frac = min(1.0, sample_size / max(n_rows, 1))
    sample = np.array(
        [r[0] for r in corpus.select(vec_col).sample(fraction=frac, seed=seed).collect()],
        dtype=np.float64,
    )
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    sample = sample / np.maximum(norms, 1e-12)

    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iterations):
        assign = np.argmax(sample @ cents.T, axis=1)  # cosine on unit vectors
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents


def _nearest_centroids_udf(centroids, n_probe: int, vec_col: str):
    """Vectorized assignment: top-``n_probe`` centroid ids per vector.
    The centroid matrix rides the UDF closure (broadcast once per executor)."""
    cents = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_udf(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cents.T
        top = np.argsort(-sims, axis=1)[:, :n_probe]
        return pd.Series([row.astype("int32").tolist() for row in top])

    return probe_udf(vec_col)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    centroids=None,
    n_centroids: int = 64,
    n_probe: int = 8,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index — the scale path
    for MID-COSINE top-k, where hyperplane LSH measurably fails (see the
    recall table in COVERAGE.md: LSH recall <= 0.09 there, IVF ~0.9 probing
    a quarter of the cells).

    Shape at 10^12 rows: one vectorized-UDF pass assigns every corpus row
    to its nearest centroid (narrow, no shuffle); queries explode to
    ``n_probe`` probe cells; candidates come from an equi-join on cell id —
    per-query cost = n_probe/n_centroids of the corpus, tunable at read
    time. Pass a pre-trained ``centroids`` matrix to reuse an index across
    query batches (train once with :func:`train_centroids`, persist the
    assigned corpus)."""
    if centroids is None:
        centroids = train_centroids(
            corpus, n_centroids=n_centroids, dim=dim, seed=seed, vec_col=vec_col
        )

    c_assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.element_at(_nearest_centroids_udf(centroids, 1, vec_col), 1).alias("cell"),
    )
    q_probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(_nearest_centroids_udf(centroids, n_probe, vec_col)).alias("cell"),
    )
    scored = (
        q_probes.join(c_assigned, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# ------------------------------------------------------------------- IVF-PQ
# The production candidate-scan compression from docs/ANN_PRODUCTION.md,
# implemented: per-block product quantization (FAISS ``IVF{K},PQ{M}``).
# Candidates are first scored from their PQ codes via asymmetric distance
# (table lookups against the query — the scan reads M small ints per row,
# never the float vectors), then ONLY the top ``refine`` survivors per
# query are joined back to full-precision vectors for the exact-cosine
# re-rank. PQ error affects which candidates reach the re-rank, never the
# final ordering — same containment property the cell-probe has.


def train_pq(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    sample_size: int = 20_000,
    iterations: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
):
    """Product-quantization codebooks: independent k-means per subvector
    block, trained on the same bounded driver sample recipe as
    :func:`train_centroids` (the O(corpus) work — encoding — stays
    distributed). Vectors are unit-normalized before blocking so the ADC
    dot-sum approximates cosine. Returns an (m, n_codes, dim//m) matrix."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    n_rows = corpus.count()
    frac = min(1.0, sample_size / max(n_rows, 1))
    sample = np.array(
        [r[0] for r in corpus.select(vec_col).sample(fraction=frac, seed=seed).collect()],
        dtype=np.float64,
    )
    sample = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12
    )
    rng = np.random.default_rng(seed)
    books = np.zeros((m, n_codes, sub))
    for bi in range(m):
        X = sample[:, bi * sub : (bi + 1) * sub]
        cents = X[rng.choice(len(X), size=min(n_codes, len(X)), replace=False)]
        for _ in range(iterations):
            d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                members = X[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[bi, : len(cents)] = cents
    return books


def _pq_encode_udf(codebooks, vec_col: str):
    """Vectorized PQ encoder: per block, nearest-codeword id (L2 on the
    unit-normalized vector). The codebook matrix rides the UDF closure."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, _n_codes, sub = books.shape

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(vecs: pd.Series) -> pd.Series:
        X = np.array(vecs.tolist(), dtype=np.float64)
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(X), m), dtype=np.int32)
        for bi in range(m):
            blk = X[:, bi * sub : (bi + 1) * sub]
            d2 = ((blk[:, None, :] - books[bi][None, :, :]) ** 2).sum(-1)
            codes[:, bi] = np.argmin(d2, axis=1)
        return pd.Series([c.tolist() for c in codes])

    return enc(vec_col)


def _adc_score_udf(codebooks, qv_col, codes_col):
    """Asymmetric-distance scoring: per distinct query IN THE ARROW BATCH,
    one (m × n_codes) lookup table of query-subvector · codeword dots; each
    candidate's approximate cosine is then m table lookups summed —
    vectorized per query group, no per-row Python."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, _n_codes, sub = books.shape

    @F.pandas_udf(T.DoubleType())
    def adc(qvs: pd.Series, codes: pd.Series) -> pd.Series:
        out = np.empty(len(qvs))
        codes_m = np.array(codes.tolist(), dtype=np.int64)
        keys = qvs.map(lambda v: np.asarray(v, np.float32).tobytes())
        for _key, idx in keys.groupby(keys).groups.items():
            rows = np.asarray(idx)
            q = np.asarray(qvs.iloc[rows[0]], dtype=np.float64)
            q = q / max(np.linalg.norm(q), 1e-12)
            lut = np.stack(
                [books[bi] @ q[bi * sub : (bi + 1) * sub] for bi in range(m)]
            )  # (m, n_codes)
            out[rows] = lut[np.arange(m)[None, :], codes_m[rows]].sum(axis=1)
        return pd.Series(out)

    return adc(qv_col, codes_col)


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    centroids=None,
    codebooks=None,
    n_centroids: int = 64,
    n_probe: int = 8,
    m: int = 8,
    n_codes: int = 16,
    refine: int | None = 64,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ with exact re-rank — the 10^12-row layout from
    docs/ANN_PRODUCTION.md as a runnable operator.

    Plan: corpus rows index once into (cell, PQ codes) — one vectorized-UDF
    pass, narrow; queries explode to ``n_probe`` probe cells; the candidate
    scan joins on cell and scores CODES ONLY (``_adc_score_udf`` — M ints
    per candidate instead of the float vector, the ~40× IO cut the doc
    describes); the top ``refine`` per query re-join their full vectors for
    exact cosine; the final rank-window takes top-k.

    ``refine=None`` keeps every candidate (the ADC pass still executes but
    cannot drop anyone): with full probe the result is then EXACTLY brute
    force — the oracle gate, same containment argument as
    ``ivf_fullprobe``. Production dials: ``n_probe`` trades scan fraction,
    ``refine`` bounds re-rank IO."""
    if centroids is None:
        centroids = train_centroids(
            corpus, n_centroids=n_centroids, dim=dim, seed=seed, vec_col=vec_col
        )
    if codebooks is None:
        codebooks = train_pq(
            corpus, m=m, n_codes=n_codes, dim=dim, seed=seed, vec_col=vec_col
        )
    c_idx = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.element_at(_nearest_centroids_udf(centroids, 1, vec_col), 1).alias("cell"),
        _pq_encode_udf(codebooks, vec_col).alias("codes"),
    )
    q_probes = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(_nearest_centroids_udf(centroids, n_probe, vec_col)).alias("cell"),
    )
    approx = (
        q_probes.join(c_idx, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "qv",
            "neighbor_id",
            _adc_score_udf(codebooks, F.col("qv"), F.col("codes")).alias("ascore"),
        )
    )
    cut = (1 << 31) if refine is None else refine
    wa = Window.partitionBy("query_id").orderBy(
        F.col("ascore").desc(), F.col("neighbor_id").asc()
    )
    survivors = (
        approx.withColumn("arank", F.row_number().over(wa))
        .where(F.col("arank") <= cut)
        .drop("arank", "ascore")
    )
    reranked = survivors.join(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        "neighbor_id",
    ).select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        reranked.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )
