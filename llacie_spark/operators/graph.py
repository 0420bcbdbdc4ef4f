"""Graph operators: connected components + canonicalization mapping.

North-rule stage 3: coreferent entities/predicates are canonicalized via
connected components over similarity edges. The reference's analog is the
static ``synonym_of → canonical_name`` closure resolved at vocab-build time
(``/root/reference/llacie/vocab.py:86-96``); here it generalizes to any edge
set (synonym rows, normalized-string equality, embedding near-dups from
``operators/similarity.py``) and runs as the alternating large-star /
small-star iteration — plain DataFrame self-joins in a driver loop, the
standard GraphFrames-free CC at Spark scale:

- state: (node, component) with component = min-id reachable so far;
- each round: propagate the smaller component across every edge in both
  directions, recompute per-node min, count changes;
- ``localCheckpoint`` each round cuts the lineage (iterative joins otherwise
  stack exponentially deep plans);
- converges in O(log(diameter)) rounds; each round is one shuffle on node.

Determinism: component id = min node id of the component.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """(src, dst) undirected edges -> (node, component).

    Isolated nodes don't appear (no edges, no rows) — union your node set
    with component = node afterwards if needed."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint()

    comp = sym.groupBy("a").agg(F.min("b").alias("c")).select(
        F.col("a").alias("node"), F.least("a", "c").alias("component")
    )
    comp = comp.localCheckpoint()

    for _ in range(max_iterations):
        # propagate: every node's candidate component via each neighbor
        prop = (
            sym.join(comp.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), F.col("component"))
            .union(comp)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        prop = prop.localCheckpoint()
        changed = (
            prop.join(comp.withColumnRenamed("component", "old"), "node")
            .where(F.col("component") != F.col("old"))
            .count()
        )
        comp = prop
        if changed == 0:
            break
    return comp


def synonym_edges(concepts: DataFrame) -> DataFrame:
    """Edges from the concept dictionary: surface form <-> canonical name,
    synonym_of chains, combo links (vocab _add_terms semantics)."""
    e1 = concepts.select(F.col("ngram").alias("src"), F.col("canonical_name").alias("dst"))
    e2 = (
        concepts.where(F.col("synonym_of").isNotNull() & (F.col("synonym_of") != ""))
        .select(F.col("synonym_of").alias("src"), F.col("canonical_name").alias("dst"))
    )
    return e1.union(e2).distinct()


def canonical_map(concepts: DataFrame) -> DataFrame:
    """(surface, canonical_id): every surface form / synonym mapped to its
    component's canonical representative (min lexicographic member that is a
    canonical_name)."""
    comps = connected_components(synonym_edges(concepts))
    canonicals = concepts.select(F.col("canonical_name").alias("node")).distinct()
    rep = (
        comps.join(canonicals, "node", "left_semi")
        .groupBy("component")
        .agg(F.min("node").alias("canonical_id"))
    )
    return comps.join(rep, "component").select(
        F.col("node").alias("surface"), "canonical_id"
    )


def canonicalize_triples(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite triple objects onto canonical ids via broadcast join; objects
    without a mapping pass through unchanged (coalesce)."""
    m = F.broadcast(mapping.withColumnRenamed("surface", "label_name"))
    return (
        triples.join(m, "label_name", "left")
        .withColumn("label_canonical", F.coalesce("canonical_id", "label_name"))
        .drop("canonical_id")
    )
