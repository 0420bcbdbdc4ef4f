"""Streaming ingest: file-source stream -> fused extraction -> triples sink,
with checkpoint resume; watermarked window aggregation."""

import pytest
from pyspark.sql import functions as F


def test_stream_documents_to_triples(spark, vocab, tmp_path):
    from llacie_spark.corpus import reference_documents
    from llacie_spark.streaming import (
        run_stream_once,
        stream_documents,
        stream_extracted,
        stream_triples,
    )

    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = reference_documents(spark)
    docs.where(F.col("doc_id") <= "doc-000050").write.parquet(src)

    stream = stream_triples(stream_extracted(stream_documents(spark, src), vocab))
    run_stream_once(stream, out, ckpt)
    first = spark.read.parquet(out)
    n1 = first.count()
    assert n1 > 0
    docs1 = first.select("doc_id").distinct().count()

    # late-arriving files: resume from checkpoint processes only the new ones
    docs.where(F.col("doc_id") > "doc-000050").write.mode("append").parquet(src)
    stream = stream_triples(stream_extracted(stream_documents(spark, src), vocab))
    run_stream_once(stream, out, ckpt)
    final = spark.read.parquet(out)
    assert final.select("doc_id").distinct().count() > docs1
    # no duplicates: each doc processed exactly once across the two drains
    dup = final.groupBy("doc_id", "label_name").count().where("count > 1").count()
    assert dup == 0


def test_windowed_mention_counts(spark, vocab, tmp_path):
    from llacie_spark.corpus import reference_documents
    from llacie_spark.streaming import (
        run_stream_once,
        stream_documents,
        stream_extracted,
        windowed_mention_counts,
    )

    src = str(tmp_path / "in2")
    reference_documents(spark).limit(20).write.parquet(src)
    extracted = stream_extracted(stream_documents(spark, src), vocab)
    # synthesize an event time from the doc id (deterministic minutes offset)
    extracted = extracted.withColumn(
        "event_ts",
        F.to_timestamp(F.lit("3000-01-01 00:00:00"))
        + F.make_interval(mins=F.pmod(F.xxhash64("doc_id"), F.lit(60)).cast("int")),
    )
    agg = windowed_mention_counts(extracted, "event_ts", window="15 minutes")
    out, ckpt = str(tmp_path / "aggout"), str(tmp_path / "aggckpt")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    res = spark.read.parquet(out)
    rows = res.collect()
    assert len(rows) > 0
    assert all(r.n_mentions >= 1 for r in rows)
    assert all(r.window_end > r.window_start for r in rows)


def test_stateful_first_seen_dedup(spark, vocab, tmp_path):
    """applyInPandasWithState: duplicates across micro-batches are dropped by
    keyed state persisted in the checkpoint."""
    from pyspark.sql import functions as F

    from llacie_spark.corpus import reference_documents
    from llacie_spark.streaming import (
        first_seen_dedup,
        run_stream_once,
        stream_documents,
        stream_extracted,
        stream_triples,
    )

    src = str(tmp_path / "sin")
    out = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")
    docs = reference_documents(spark).limit(10)
    docs.write.parquet(src)

    def drain():
        stream = first_seen_dedup(
            stream_triples(stream_extracted(stream_documents(spark, src), vocab))
        )
        run_stream_once(stream, out, ckpt)

    drain()
    n1 = spark.read.parquet(out).count()
    assert n1 > 0
    # append THE SAME documents again (duplicate content, new files)
    docs.write.mode("append").parquet(src)
    drain()
    final = spark.read.parquet(out)
    assert final.count() == n1  # every re-seen (doc,label) suppressed by state
    dups = final.groupBy("doc_id", "label_name").count().where("count > 1")
    assert dups.count() == 0


def test_stream_upsert_idempotent_sink(spark, vocab, tmp_path):
    """S6 as a stream: two incremental drains land in the snapshot catalog
    without duplicates; re-draining the same input is a no-op (keyed
    replace, not append)."""
    from llacie_spark.corpus import reference_documents
    from llacie_spark.io import SnapshotCatalog
    from llacie_spark.streaming import stream_documents, stream_extracted, stream_upsert

    src = tmp_path / "in"
    chk = str(tmp_path / "chk")
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    docs = reference_documents(spark).cache()

    docs.where("doc_id <= 'doc-000050'").write.mode("append").parquet(str(src))
    extracted = stream_extracted(stream_documents(spark, str(src)), vocab)
    stream_upsert(extracted, cat, "extracted", "doc_id", chk)
    n1 = cat.read_stage(spark, "extracted").count()
    assert n1 == 50

    docs.where("doc_id > 'doc-000050'").write.mode("append").parquet(str(src))
    stream_upsert(extracted, cat, "extracted", "doc_id", chk)
    out = cat.read_stage(spark, "extracted")
    assert out.count() == docs.count()
    assert out.groupBy("doc_id").count().where("count > 1").count() == 0

    # same checkpoint, no new input: nothing re-lands, snapshot unchanged
    snap_before = cat.current_snapshot("extracted")["snapshot"]
    stream_upsert(extracted, cat, "extracted", "doc_id", chk)
    assert cat.read_stage(spark, "extracted").count() == docs.count()
    assert cat.current_snapshot("extracted")["snapshot"] == snap_before


def test_stream_upsert_across_bucket_split(spark, vocab, tmp_path):
    """The streaming sink and the layout migration compose: a split between
    two drains must leave subsequent foreachBatch upserts incremental and
    the merged table exact (no dupes, no loss)."""
    from llacie_spark.corpus import reference_documents
    from llacie_spark.io import SnapshotCatalog
    from llacie_spark.streaming import stream_documents, stream_extracted, stream_upsert

    src = tmp_path / "in"
    chk = str(tmp_path / "chk")
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    docs = reference_documents(spark).cache()

    docs.where("doc_id <= 'doc-000050'").write.mode("append").parquet(str(src))
    extracted = stream_extracted(stream_documents(spark, str(src)), vocab)
    stream_upsert(extracted, cat, "extracted", "doc_id", chk)
    assert cat.read_stage(spark, "extracted").count() == 50

    cat.split_buckets(spark, "extracted", [0, 1])  # migrate mid-stream

    docs.where("doc_id > 'doc-000050'").write.mode("append").parquet(str(src))
    stream_upsert(extracted, cat, "extracted", "doc_id", chk)
    out = cat.read_stage(spark, "extracted")
    assert out.count() == docs.count()
    assert out.groupBy("doc_id").count().where("count > 1").count() == 0
    snap = cat.current_snapshot("extracted")
    assert snap["bucket_mods"] == {"0": 64, "1": 64}  # split layout persisted
