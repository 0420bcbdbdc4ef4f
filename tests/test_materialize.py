"""Graph materialization: partitioned nodes/edges + per-partition metrics."""

from llacie_spark.corpus import reference_doc_meta, reference_documents
from llacie_spark.materialize import (
    build_edges,
    build_nodes,
    edge_partition_metrics,
    materialize_graph,
)
from llacie_spark.pipeline import run_pipeline


def test_materialize_graph(spark, vocab, tmp_path):
    triples = run_pipeline(
        reference_documents(spark), reference_doc_meta(spark), vocab
    ).cache()
    out = str(tmp_path / "graph")
    stats = materialize_graph(triples, out, n_buckets=8)
    assert stats["edges"] == triples.count()
    assert stats["nodes"] > 0 and stats["partitions"] <= 8

    edges = spark.read.parquet(f"{out}/edges")
    # partition columns restored from directory layout
    assert {"pred", "subj_bucket"} <= set(edges.columns)
    assert edges.count() == stats["edges"]
    # partition pruning works: one bucket's scan reads one directory
    one = edges.where("subj_bucket = 3")
    assert 0 < one.count() < stats["edges"]

    nodes = spark.read.parquet(f"{out}/nodes")
    kinds = {r.kind for r in nodes.select("kind").distinct().collect()}
    assert kinds == {"episode", "concept"}
    assert nodes.groupBy("node_id").count().where("count > 1").count() == 0

    metrics = spark.read.parquet(f"{out}/metrics")
    total = metrics.agg({"n_edges": "sum"}).first()[0]
    assert total == stats["edges"]


def test_edges_lineage_carried(spark, vocab):
    triples = run_pipeline(reference_documents(spark), reference_doc_meta(spark), vocab)
    edges = build_edges(triples, n_buckets=4)
    row = edges.first()
    assert row.strategy and row.strategy_version and row.provenance_doc.startswith("doc-")
    assert 0 <= row.subj_bucket < 4
    m = edge_partition_metrics(edges)
    assert m.where("n_edges <= 0").count() == 0


def test_nodes_shapes(spark, vocab):
    triples = run_pipeline(reference_documents(spark), reference_doc_meta(spark), vocab)
    nodes = build_nodes(triples)
    eps = nodes.where("kind = 'episode'").count()
    cons = nodes.where("kind = 'concept'").count()
    assert eps > 0 and cons > 0
    assert nodes.count() == eps + cons
