"""Structured Streaming face of the pipeline: continuous document ingest.

The reference has no streaming — its incremental unit is the idempotent
batch re-run (SURVEY.md §2.9). At web scale the same pipeline also needs a
continuous mode: new documents land in the input table/stream and triples
appear downstream without a full re-run. This module provides:

- :func:`stream_documents` — read a documents directory as a file stream
  (schema-pinned; in production this is ``readStream.format("iceberg")`` or
  Kafka);
- :func:`stream_triples` — the same fused extraction applied on the stream
  (stateless per-document transforms apply verbatim to streams; the
  episode-level argmin is replaced by a dedup-on-key upsert into the sink,
  the streaming rendering of delete-then-insert);
- :func:`windowed_mention_counts` — watermarked sliding-window aggregation
  over mention events (late data handled by the watermark), the standard
  monitoring stream: mention volume per concept per window;
- everything runs with ``availableNow`` triggers in tests (bounded, exactly
  the files present) — the same code runs unbounded in production.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import DOCUMENTS
from .vocab import Vocab


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of interleaved documents (one parquet dir)."""
    return spark.readStream.schema(DOCUMENTS).parquet(path)


def stream_extracted(stream_docs: DataFrame, vocab: Vocab) -> DataFrame:
    """Apply the fused extraction to a document stream. Stateless — the
    pandas UDF works identically on micro-batches."""
    from .corpus import assemble_text
    from .pipeline import fused_extract

    return fused_extract(assemble_text(stream_docs), vocab)


def stream_triples(extracted: DataFrame) -> DataFrame:
    """Per-document triples from a stream (doc-level; the per-episode argmin
    collapse is a keyed upsert at the sink, not a stream aggregation)."""
    return extracted.select(
        "doc_id",
        F.explode("matches").alias("m"),
    ).select(
        "doc_id",
        F.lit("has_presenting_symptom").alias("pred"),
        F.col("m.label_name").alias("label_name"),
        F.col("m.line_number").alias("line_number"),
    )


def windowed_mention_counts(
    extracted: DataFrame,
    event_time_col: str = "event_ts",
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "20 minutes",
) -> DataFrame:
    """Watermarked windowed counts of matched concepts — the monitoring
    aggregation (late events beyond the watermark are dropped, state is
    bounded)."""
    ev = extracted.select(
        F.col(event_time_col).alias("ts"), F.explode("matches").alias("m")
    ).select("ts", F.col("m.label_name").alias("label_name"))
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "label_name")
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "label_name",
            "n_mentions",
        )
    )


def first_seen_dedup(
    triples_stream: DataFrame,
    key_cols: tuple[str, str] = ("doc_id", "label_name"),
    timeout_minutes: int | None = None,
) -> DataFrame:
    """Custom stateful operator: emit each (doc, label) only the FIRST time
    it is ever seen across the whole stream, via ``applyInPandasWithState``.

    This is the streaming rendering of the reference's upsert-keyed
    idempotency (``ON CONFLICT DO UPDATE`` — a re-extracted document must
    not duplicate downstream triples, ``llacie/db.py:650-665``). State per
    group = the set of labels already emitted; an optional processing-time
    timeout bounds state for abandoned keys (production would set one sized
    to the reprocess window).

    Grouping is by the first key column (doc), so state size per group is
    the label count of one document — small and bounded.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    group_col, label_col = key_cols
    out_schema = f"{group_col} string, {label_col} string, line_number long"
    state_schema = "seen array<string>"

    def fn(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        rows = []
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                label = getattr(r, label_col)
                if label not in seen:
                    seen.add(label)
                    rows.append((key[0], label, getattr(r, "line_number")))
        state.update((list(seen),))
        if timeout_minutes:
            state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        if rows:
            yield pd.DataFrame(rows, columns=[group_col, label_col, "line_number"])

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_minutes
        else GroupStateTimeout.NoTimeout
    )
    return triples_stream.groupBy(group_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def run_stream_once(stream_df: DataFrame, out_path: str, checkpoint: str) -> None:
    """Drain everything currently available into a parquet sink and stop —
    bounded streaming execution (trigger availableNow) with a durable
    checkpoint, so a rerun resumes after the last committed batch."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_upsert(
    stream_df: DataFrame,
    catalog,
    name: str,
    key: str | list[str],
    checkpoint: str,
    allow_new_columns: bool = False,
    merge_on_read: bool = False,
) -> None:
    """Drain the stream into the snapshot catalog via per-batch keyed upsert
    — the streaming form of the S6 keyed sink.

    ``foreachBatch`` + delete-then-insert by key gives effective
    exactly-once: a batch replayed after a crash (same epoch id, same keys)
    replaces its own rows instead of duplicating them — the same
    idempotency contract the reference's ON CONFLICT DO UPDATE sink
    provides per polling sweep (``llacie/db.py:650-665``). With an Iceberg
    catalog this becomes MERGE INTO per epoch (docs/ICEBERG.md).

    ``allow_new_columns`` composes the sink with additive schema evolution:
    a stream whose source grew a column (a NEW readStream over the widened
    source — a running stream's schema is fixed at creation) evolves the
    table on its first drained batch, and rows from pre-evolution
    micro-batches read the new column as NULL (VERDICT r5 #7).

    ``merge_on_read`` lands each micro-batch as per-bucket delta files
    instead of rewriting touched buckets — the streaming sink is the
    archetypal uniform-small-batch writer for which CoW rewrite
    amplification is worst (BENCH/MOR_SCALING.md); deltas fold back in the
    table's normal maintenance slot (``compact``/``maybe_split``)."""

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        catalog.upsert(
            batch_df.sparkSession, batch_df, name, key,
            allow_new_columns=allow_new_columns,
            merge_on_read=merge_on_read,
        )

    q = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
