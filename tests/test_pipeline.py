"""End-to-end Spark pipeline: documents -> triples, span invariant, P/R gate.

Mirrors the reference quickstart chain (tests/integration/test_quickstart.py):
100 notes -> 100 sections -> features -> episode labels -> evaluate, minus the
live LLM (deterministic gazetteer scorer instead, like the SKIPTO fixture).
"""

import pytest

from llacie_spark.corpus import assemble_text, reference_doc_meta, reference_documents
from llacie_spark.evaluate import confusion_counts, first_annotator_labels
from llacie_spark.pipeline import (
    episode_triples,
    extract_mentions,
    extract_sections,
    link_mentions,
    run_pipeline,
    spans_fingerprint,
)


@pytest.fixture(scope="module")
def docs(spark):
    return reference_documents(spark).cache()


@pytest.fixture(scope="module")
def meta(spark):
    return reference_doc_meta(spark).cache()


@pytest.fixture(scope="module")
def triples(spark, docs, meta, vocab):
    return run_pipeline(docs, meta, vocab).cache()


@pytest.fixture(scope="module")
def gold_df(spark, gold_rows):
    rows = [
        (g["episode_id"], lbl, "annotator1") for g in gold_rows for lbl in g["labels"]
    ]
    return spark.createDataFrame(rows, "episode_id long, label_name string, annotator string")


def test_documents_shape(docs):
    assert docs.count() == 100
    row = docs.first()
    kinds = {s["kind"] for s in row["spans"]}
    assert kinds <= {"text", "media"}
    offsets = [s["offset"] for s in sorted(row["spans"], key=lambda s: s["offset"])]
    assert offsets == list(range(len(offsets)))  # strictly increasing from 0


def test_sections_extracted_for_all_docs(docs, vocab):
    sec = extract_sections(assemble_text(docs))
    assert sec.where("section_text is not null").count() == 100


def test_triples_emitted(triples):
    assert triples.count() > 0
    cols = set(triples.columns)
    assert {"episode_id", "doc_id", "pred", "label_name", "label_value",
            "line_number", "spans", "stage", "strategy", "strategy_version",
            "partition_id", "updated_at"} <= cols
    assert triples.where("pred != 'has_presenting_symptom'").count() == 0
    assert triples.where("label_value != 1.0").count() == 0


def test_span_sequence_invariant(docs, triples):
    """Per-row span-sequence equality (kind, text, media_ref, order) is
    preserved through every stage (BASELINE.json input_hint)."""
    fin = docs.select("doc_id", spans_fingerprint().alias("fp_in"))
    fout = triples.select("doc_id", spans_fingerprint().alias("fp_out")).distinct()
    joined = fin.join(fout, "doc_id")
    assert joined.count() > 0
    assert joined.where("fp_in != fp_out").count() == 0


def test_precision_recall_gate_spark(triples, gold_df, vocab):
    cc = confusion_counts(triples, gold_df, n_terms=len(vocab), max_line_num=10)
    assert cc.precision >= 0.95, cc.report()
    assert cc.recall >= 0.95, cc.report()
    # unlimited threshold matches (mention budget <= 10 lines)
    cc_all = confusion_counts(triples, gold_df, n_terms=len(vocab), max_line_num=None)
    assert (cc_all.tp, cc_all.fp, cc_all.fn) == (cc.tp, cc.fp, cc.fn)


def test_first_annotator_filter(spark):
    df = spark.createDataFrame(
        [(1, "fever", "b"), (1, "chills", "a"), (2, "cough", "c")],
        "episode_id long, label_name string, annotator string",
    )
    out = first_annotator_labels(df).collect()
    assert {(r.episode_id, r.label_name) for r in out} == {(1, "chills"), (2, "cough")}


def test_cohort_and_time_filters(spark, docs, vocab):
    """F1/F2/F4 predicates drop non-H&P, excluded-cohort, and >24h notes."""
    from pyspark.sql import functions as F

    meta = reference_doc_meta(spark)
    meta = meta.withColumn(
        "note_type", F.when(F.col("episode_id") == 1, "Progress").otherwise(F.col("note_type"))
    ).withColumn(
        "infection_criteria", F.when(F.col("episode_id") == 2, False).otherwise(True)
    ).withColumn(
        "date_of_service_ts",
        F.when(
            F.col("episode_id") == 3, F.to_timestamp(F.lit("3000-01-03 00:00:00"))
        ).otherwise(F.col("date_of_service_ts")),
    )
    triples = run_pipeline(docs, meta, vocab)
    eps = {r.episode_id for r in triples.select("episode_id").distinct().collect()}
    assert 1 not in eps and 2 not in eps and 3 not in eps
    assert 4 in eps


def test_argmin_join_picks_earliest_note(spark, vocab):
    """Two qualifying notes in one episode -> labels come from the earlier."""
    from pyspark.sql import functions as F

    from llacie_spark.schemas import DOC_META, DOCUMENTS

    def doc(doc_id, text):
        return (doc_id, [{"kind": "text", "text": text, "media_ref": "", "offset": 0}])

    docs = spark.createDataFrame(
        [
            doc("d1", "HPI: patient reports fever.\nROS: negative"),
            doc("d2", "HPI: patient reports chills.\nROS: negative"),
        ],
        DOCUMENTS,
    )
    meta = spark.createDataFrame(
        [
            ("d1", 1, "p1", "H&P", None, None, True, False),
            ("d2", 1, "p1", "H&P", None, None, True, False),
        ],
        DOC_META,
    )
    meta = meta.withColumn(
        "episode_start_ts", F.to_timestamp(F.lit("3000-01-01 00:00:00"))
    ).withColumn(
        "date_of_service_ts",
        F.when(F.col("doc_id") == "d2", F.to_timestamp(F.lit("3000-01-01 01:00:00"))).otherwise(
            F.to_timestamp(F.lit("3000-01-01 05:00:00"))
        ),
    )
    triples = run_pipeline(docs, meta, vocab)
    rows = triples.select("doc_id", "label_name").collect()
    assert {r.doc_id for r in rows} == {"d2"}  # earlier note wins
    assert {r.label_name for r in rows} == {"chills"}


def test_argmin_strategies_identical(spark, docs, meta, vocab, triples):
    """The min_by slim-agg form and the rank-1 window form are physical
    alternatives for the same operator (scripts/argmin_ab.py measures the
    crossover); their semantic output must be row-identical."""
    semantic = [
        "episode_id", "doc_id", "pred", "label_name",
        "label_value", "line_number", "spans",
    ]
    a = triples.select(semantic)
    b = run_pipeline(docs, meta, vocab, argmin_strategy="window_fat").select(semantic)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    with pytest.raises(ValueError, match="argmin_strategy"):
        run_pipeline(docs, meta, vocab, argmin_strategy="nope")


def test_repartition_by_cost(spark, docs, vocab):
    from llacie_spark.corpus import assemble_text
    from llacie_spark.pipeline import repartition_by_cost, run_pipeline
    from llacie_spark.corpus import reference_doc_meta

    wt = assemble_text(docs)
    rep = repartition_by_cost(wt, chars_per_task=20_000, min_partitions=2)
    assert rep.rdd.getNumPartitions() >= 10  # ~350KB corpus / 20KB per task
    assert rep.count() == 100  # no rows lost


def test_fused_udf_batches_scorer_calls(spark, docs, vocab):
    """The batched-scorer contract (U1): the fused UDF must call
    score_batch once per Arrow batch, never per document. A per-row call is
    invisible with the in-process gazetteer but costs a subprocess backend
    one process spawn per row — measured 191 vs ~8,000 docs/sec at 40k docs
    (BENCH/SUBPROCESS_SCORER.md). Counted via accumulator; the scorer class
    is function-local so cloudpickle ships it by value."""
    from llacie_spark.pipeline import fused_extract
    from llacie_spark.scorer import GazetteerScorer

    calls = spark.sparkContext.accumulator(0)
    find_terms = vocab.find_terms

    class CountingScorer:
        name = "feature.presenting_sx.counting"
        version = "0.0.0"

        def __init__(self):
            self.inner = GazetteerScorer(canonicalize=find_terms)

        def score_batch(self, texts):
            calls.add(1)
            return self.inner.score_batch(texts)

    two_parts = assemble_text(docs).repartition(2)
    n_docs = two_parts.count()
    out = fused_extract(two_parts, vocab, scorer=CountingScorer())
    extracted = out.select("doc_id", "mentions").collect()
    assert len(extracted) == n_docs
    # 100 docs in 2 partitions, Arrow batch cap >= 2048: one UDF batch per
    # partition => one score_batch call each. Per-row calls would be ~100.
    assert calls.value <= 2, f"score_batch called {calls.value} times"
    # and the batched path still extracts (non-degenerate output)
    assert any(r.mentions for r in extracted)


def test_fused_udf_rejects_length_mismatched_scorer(spark, docs, vocab):
    """A backend returning the wrong number of results (truncated subprocess
    stdout, LLM batch drop) must fail loudly — pre-r6 the zip silently gave
    trailing documents empty mentions (ADVICE r5)."""
    from llacie_spark.pipeline import fused_extract

    class TruncatingScorer:
        name = "feature.presenting_sx.truncating"
        version = "0.0.0"

        def score_batch(self, texts):
            return [["fever"] for _ in texts[:-1]]  # drops the last result

    out = fused_extract(assemble_text(docs).coalesce(1), vocab, scorer=TruncatingScorer())
    with pytest.raises(Exception, match="batched-scorer contract"):
        out.select("mentions").collect()
