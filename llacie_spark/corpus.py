"""Deterministic corpus builders: the interleaved ``documents`` table.

Two sources, both seeded and reproducible:

- :func:`reference_documents` — the reference's 100-note demo corpus
  (``examples/admission-100.txt``, notes separated by ``#{10,}`` lines, split
  semantics of ``llacie/app.py:100``) re-shaped into the interleaved
  ``(doc_id, spans)`` schema. Used by the gold-fixture quality gate.
- :func:`synthetic_documents` — a scale-factor amplification of the same
  corpus for benchmarks: note texts are recombined deterministically
  (seeded per doc_id via xxhash-style mixing done in Spark, no Python RNG in
  the hot path) so content statistics match while row count scales.

Interleaving model (FIXTURES.md §1): each document's text is split into 1-5
text spans at paragraph boundaries with 0-3 opaque media spans interleaved;
``offset`` is the strictly-increasing span position. The per-row invariant
every stage must preserve is span-sequence equality on
(kind, text, media_ref, order).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import DOCUMENTS, DOC_META

NOTE_SEPARATOR = re.compile(r"\n#{10,}\n")


def split_corpus(text: str) -> list[str]:
    """Split a notes corpus file into individual notes (llacie/app.py:100)."""
    return [n.strip() for n in NOTE_SEPARATOR.split(text) if n.strip()]


def _interleave_spans(doc_id: str, note_text: str) -> list[dict]:
    """Deterministically split a note into 1-5 text spans (paragraph
    boundaries) and interleave 0-3 media spans, keyed on a hash of doc_id."""
    paragraphs = note_text.split("\n\n")
    h = hash_str(doc_id)
    n_text = min(len(paragraphs), 1 + h % 5)
    # group paragraphs into n_text contiguous chunks
    per = max(1, len(paragraphs) // n_text)
    chunks = ["\n\n".join(paragraphs[i : i + per]) for i in range(0, len(paragraphs), per)]
    n_media = (h >> 8) % 4
    spans: list[dict] = []
    offset = 0
    media_emitted = 0
    for i, chunk in enumerate(chunks):
        spans.append({"kind": "text", "text": chunk, "media_ref": "", "offset": offset})
        offset += 1
        if media_emitted < n_media and ((h >> (16 + 4 * i)) & 1):
            spans.append(
                {
                    "kind": "media",
                    "text": "",
                    "media_ref": f"media://{doc_id}/{media_emitted}",
                    "offset": offset,
                }
            )
            offset += 1
            media_emitted += 1
    while media_emitted < n_media:
        spans.append(
            {
                "kind": "media",
                "text": "",
                "media_ref": f"media://{doc_id}/{media_emitted}",
                "offset": offset,
            }
        )
        offset += 1
        media_emitted += 1
    return spans


def hash_str(s: str) -> int:
    """Deterministic 64-bit string hash (FNV-1a); Python's hash() is salted."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def reference_documents(
    spark: SparkSession, corpus_path: str = "fixtures/admission-100.txt"
) -> DataFrame:
    """The 100-note demo corpus as an interleaved documents DataFrame."""
    with open(corpus_path) as f:
        notes = split_corpus(f.read())
    rows = [
        (f"doc-{i + 1:06d}", _interleave_spans(f"doc-{i + 1:06d}", note))
        for i, note in enumerate(notes)
    ]
    return spark.createDataFrame(rows, DOCUMENTS)


def reference_doc_meta(spark: SparkSession, n_docs: int = 100) -> DataFrame:
    """1:1 doc→episode metadata mirroring the demo import (llacie/db.py:311-340):
    every note is an 'H&P' at episode start, all cohort flags pass."""
    rows = [
        (
            f"doc-{i + 1:06d}",
            i + 1,
            f"patient-{i + 1:04d}",
            "H&P",
            None,
            None,
            True,
            False,
        )
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(rows, DOC_META)
    return df.withColumn(
        "episode_start_ts", F.to_timestamp(F.lit("3000-01-01 00:00:00"))
    ).withColumn(
        "date_of_service_ts",
        F.to_timestamp(F.lit("3000-01-01 01:00:00")),  # within the 24 h window (F4)
    )


def synthetic_documents(spark: SparkSession, n_docs: int, corpus_path: str = "fixtures/admission-100.txt", partitions: int | None = None) -> DataFrame:
    """Scale the demo corpus to ``n_docs`` rows, fully distributed.

    The 100 base notes are broadcast (tiny); each output row picks a base
    note by ``doc_no % 100`` and rewrites identifying tokens with its own
    doc number, so text statistics (length/skew/sections) match the demo
    while IDs stay unique. Generation is a ``range`` scan → narrow
    transforms: no shuffle, scales linearly with cores.
    """
    with open(corpus_path) as f:
        notes = split_corpus(f.read())
    base = spark.createDataFrame(
        [(i, n) for i, n in enumerate(notes)], ["base_id", "base_text"]
    )
    rng = spark.range(0, n_docs, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    docs = (
        rng.withColumn("base_id", (F.col("id") % len(notes)).cast("long"))
        .join(F.broadcast(base), "base_id")
        .withColumn("doc_id", F.format_string("doc-%06d", F.col("id") + 1))
        # per-doc salt line keeps rows distinct without changing clinical text
        .withColumn(
            "note_text",
            F.concat(F.col("base_text"), F.lit("\n\nDocument ref: "), F.col("doc_id")),
        )
    )
    return docs.select(
        "doc_id",
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("note_text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            ),
            F.struct(
                F.lit("media").alias("kind"),
                F.lit("").alias("text"),
                F.concat(F.lit("media://"), F.col("doc_id"), F.lit("/0")).alias("media_ref"),
                F.lit(1).alias("offset"),
            ),
        ).alias("spans"),
    )


def synthetic_doc_meta(spark: SparkSession, n_docs: int) -> DataFrame:
    """Metadata for the synthetic corpus: 1:1 doc→episode, all filters pass."""
    return (
        spark.range(0, n_docs)
        .select(
            F.format_string("doc-%06d", F.col("id") + 1).alias("doc_id"),
            (F.col("id") + 1).alias("episode_id"),
            F.format_string("patient-%04d", (F.col("id") % 9999) + 1).alias("patient_id"),
            F.lit("H&P").alias("note_type"),
            F.to_timestamp(F.lit("3000-01-01 01:00:00")).alias("date_of_service_ts"),
            F.to_timestamp(F.lit("3000-01-01 00:00:00")).alias("episode_start_ts"),
            F.lit(True).alias("infection_criteria"),
            F.lit(False).alias("excl_st0_combined"),
        )
    )


def assemble_text(documents: DataFrame) -> DataFrame:
    """documents -> (doc_id, spans, note_text): concatenate text spans in
    offset order, JVM-side (no Python). The spans column rides along so the
    span-sequence invariant is checkable on every downstream table."""
    ordered = F.array_sort(
        F.filter("spans", lambda s: s["kind"] == F.lit("text")),
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )
    return documents.withColumn(
        "note_text",
        F.array_join(F.transform(ordered, lambda s: s["text"]), "\n\n"),
    )
