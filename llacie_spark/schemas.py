"""Canonical schemas for every table the pipeline reads or writes.

The input shape is the interleaved text+media document table (BASELINE.json
input_hint): ``documents(doc_id string, spans array<struct<kind, text,
media_ref, offset>>)``. Downstream tables mirror the reference's relational
model (``/root/reference/llacie/sql/schema.sql``) re-expressed columnar:

- ``doc_meta``       ≅ episodes+cohorts+notes metadata (schema.sql:1-43)
- ``sections``       ≅ note_sections                    (schema.sql:78-85)
- ``mentions``       ≅ note_features                    (schema.sql:101-115)
- ``triples``        ≅ episode_labels                   (schema.sql:148-168)
- ``concepts``       ≅ the vocab XLSX                   (llacie/vocab.py:86-97)
- ``gold_labels``    ≅ human episode_labels             (llacie/db.py:720-766)

Every derived table carries lineage + metrics columns (stage, strategy,
strategy_version, batch runtime, updated-at) — the Spark analog of
``FK_strategy_id`` / ``strategy_runtime`` / ``feature_updated``.
"""

from __future__ import annotations

from pyspark.sql import types as T

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'text' | 'media'
        T.StructField("text", T.StringType(), True),  # '' for media spans
        T.StructField("media_ref", T.StringType(), True),  # '' for text spans
        T.StructField("offset", T.IntegerType(), False),  # strictly increasing
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

DOC_META = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("episode_id", T.LongType(), False),
        T.StructField("patient_id", T.StringType(), True),
        T.StructField("note_type", T.StringType(), True),  # filter F1: 'H&P'
        T.StructField("date_of_service_ts", T.TimestampType(), True),
        T.StructField("episode_start_ts", T.TimestampType(), True),
        T.StructField("infection_criteria", T.BooleanType(), True),  # filter F2
        T.StructField("excl_st0_combined", T.BooleanType(), True),  # filter F2
    ]
)

CONCEPTS = T.StructType(
    [
        T.StructField("ngram", T.StringType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("count", T.LongType(), True),  # Zipfian corpus frequency
        T.StructField("canonical_name", T.StringType(), False),
        T.StructField("combo_symptom", T.StringType(), True),
        T.StructField("synonym_of", T.StringType(), True),  # canonicalization edge
    ]
)

GOLD_LABELS = T.StructType(
    [
        T.StructField("episode_id", T.LongType(), False),
        T.StructField("label_name", T.StringType(), False),
        T.StructField("annotator", T.StringType(), False),
    ]
)

# lineage + metrics columns appended to every stage output
LINEAGE_FIELDS = [
    T.StructField("stage", T.StringType(), False),
    T.StructField("strategy", T.StringType(), False),
    T.StructField("strategy_version", T.StringType(), False),
    T.StructField("partition_id", T.IntegerType(), True),
    T.StructField("batch_runtime_s", T.DoubleType(), True),  # per-row share
    T.StructField("updated_at", T.TimestampType(), True),
]

TRIPLES = T.StructType(
    [
        T.StructField("episode_id", T.LongType(), False),  # subj
        T.StructField("doc_id", T.StringType(), False),  # provenance
        T.StructField("pred", T.StringType(), False),  # 'has_presenting_symptom'
        T.StructField("label_name", T.StringType(), False),  # obj (canonical)
        T.StructField("label_value", T.DoubleType(), False),  # 1.0 (db.py:747)
        T.StructField("line_number", T.LongType(), False),  # earliest mention line
    ]
    + LINEAGE_FIELDS
)

PRED_HAS_SYMPTOM = "has_presenting_symptom"
