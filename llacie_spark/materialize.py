"""Stage 4: graph materialization — partitioned nodes/edges tables.

Turns the triple stream into the final KG tables with per-partition lineage
and metrics (north rule stage 4). Layout choices that matter at 10^12 docs:

- **edges** partitioned by ``pred`` (few, stable values → partition pruning
  for per-relation queries) and bucketed by ``subj_bucket = hash(subj) % B``
  inside each partition, so edge scans for one entity touch one bucket and
  entity-keyed joins can co-locate without a shuffle (Iceberg: ``PARTITIONED
  BY (pred, bucket(B, subj))``; parquet rendering: directory partition on
  both columns).
- **nodes** deduplicated by id with kind discriminators.
- per-partition **metrics rows** (the A9 fail-count analog): rows, distinct
  subjects, min/max line_number per (pred, bucket) — written alongside so
  data-quality drift is queryable without scanning edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .schemas import PRED_HAS_SYMPTOM

DEFAULT_BUCKETS = 64


def build_nodes(triples: DataFrame) -> DataFrame:
    """Node table: episode subjects + concept objects, deduplicated."""
    subjects = triples.select(
        F.concat(F.lit("episode:"), F.col("episode_id")).alias("node_id"),
        F.lit("episode").alias("kind"),
        F.col("episode_id").cast("string").alias("name"),
    )
    objects = triples.select(
        F.concat(F.lit("concept:"), F.col("label_name")).alias("node_id"),
        F.lit("concept").alias("kind"),
        F.col("label_name").alias("name"),
    )
    return subjects.unionByName(objects).dropDuplicates(["node_id"])


def build_edges(triples: DataFrame, n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """Edge table with partition columns + lineage carried through."""
    return triples.select(
        F.concat(F.lit("episode:"), F.col("episode_id")).alias("subj"),
        F.col("pred"),
        F.concat(F.lit("concept:"), F.col("label_name")).alias("obj"),
        F.col("label_value").alias("weight"),
        F.col("line_number"),
        F.col("doc_id").alias("provenance_doc"),
        "stage",
        "strategy",
        "strategy_version",
        "updated_at",
        F.pmod(F.xxhash64(F.concat(F.lit("episode:"), F.col("episode_id"))), F.lit(n_buckets))
        .cast("int")
        .alias("subj_bucket"),
    )


def edge_partition_metrics(edges: DataFrame) -> DataFrame:
    """Per-(pred, bucket) quality metrics — the queryable runtime footprint.

    ``objs`` (the bucket's distinct object ids, vocab-bounded so ≤ a few
    hundred strings per row) makes global concept liveness derivable from
    this TINY table instead of a full edges scan — what lets incremental
    derivation retract a concept node whose last referencing edge
    disappeared without reading the whole edges table."""
    return edges.groupBy("pred", "subj_bucket").agg(
        F.count("*").alias("n_edges"),
        F.countDistinct("subj").alias("n_subjects"),
        F.min("line_number").alias("min_line"),
        F.max("line_number").alias("max_line"),
        F.max("updated_at").alias("last_updated"),
        F.sort_array(F.collect_set("obj")).alias("objs"),
    )


def materialize_graph(
    triples: DataFrame,
    out_dir: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> dict:
    """Write nodes/, edges/ (partitioned by pred, subj_bucket), metrics/.
    Returns row counts. With an Iceberg catalog these become three
    ``writeTo(...).partitionedBy(...)`` commits."""
    spark = triples.sparkSession
    # persist: nodes and edges both consume triples — without this the full
    # upstream plan (including the Python extraction UDF) would execute once
    # per write; metrics + counts then come from the *written* parquet so the
    # pipeline runs exactly once and lineage stays consistent.
    #
    # Persist ONLY the slim projection nodes/edges read. Triples deliberately
    # carry the full `spans` payload (the per-row span-sequence invariant
    # rides through every stage), but neither output table stores it —
    # caching it too meant ~6 KB/row of dead weight (measured at 60k docs:
    # ~2.3 GB cached, 8-18 s of GC-thrashed persist swinging 3x run-to-run,
    # and an OOM'd executor at 1M docs). Column-pruning the cache is the
    # same rule as pruning a scan: never materialize columns the consumer
    # doesn't read.
    slim = [
        "episode_id", "pred", "label_name", "label_value", "line_number",
        "doc_id", "stage", "strategy", "strategy_version", "updated_at",
    ]
    triples = triples.select(*[c for c in slim if c in triples.columns]).persist()
    try:
        build_nodes(triples).write.mode("overwrite").parquet(f"{out_dir}/nodes")
        # repartition ON the partition columns first: without it every input
        # task opens a writer for every (pred, bucket) it sees — tasks × B
        # files (measured: 32 tasks × 64 buckets = 2048 tiny files, ~60 s of
        # writer open/close at 60k docs, and the downstream metrics/count
        # reads pay the listing again). With it, one task = one leaf = one
        # file — the same one-file-per-bucket rule io._write_buckets applies,
        # and the layout Iceberg's hash write-distribution produces.
        build_edges(triples, n_buckets).repartition(
            "pred", "subj_bucket"
        ).write.mode("overwrite").partitionBy("pred", "subj_bucket").parquet(
            f"{out_dir}/edges"
        )
    finally:
        triples.unpersist()
    edges_written = spark.read.parquet(f"{out_dir}/edges")
    edge_partition_metrics(edges_written).write.mode("overwrite").parquet(
        f"{out_dir}/metrics"
    )
    return {
        "nodes": spark.read.parquet(f"{out_dir}/nodes").count(),
        "edges": edges_written.count(),
        "partitions": spark.read.parquet(f"{out_dir}/metrics").count(),
        "preds": [PRED_HAS_SYMPTOM],
    }
