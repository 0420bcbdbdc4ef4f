"""Streaming ingest: file-source stream -> fused extraction -> triples sink,
with checkpoint resume; watermarked window aggregation."""

import glob
import os

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


def test_stream_upsert_schema_evolution_composes(spark, vocab, tmp_path):
    """Streaming sink × additive schema evolution (VERDICT r5 #7): the
    source grows a column mid-stream (a new readStream over the widened
    source — a running stream's schema is pinned at creation); the first
    drained batch evolves the table, and every row from pre-evolution
    micro-batches reads the new column as NULL (Iceberg add-column
    semantics through foreachBatch)."""
    from pyspark.sql import functions as F

    from llacie_spark.corpus import reference_documents
    from llacie_spark.io import SnapshotCatalog
    from llacie_spark.streaming import stream_documents, stream_extracted, stream_upsert

    src = tmp_path / "in"
    chk = str(tmp_path / "chk")
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    docs = reference_documents(spark).cache()

    # epoch 1: original schema
    docs.where("doc_id <= 'doc-000050'").write.mode("append").parquet(str(src))
    ext1 = stream_extracted(stream_documents(spark, str(src)), vocab)
    stream_upsert(ext1, cat, "extracted", "doc_id", chk)
    assert "model_tag" not in cat.read_stage(spark, "extracted").columns

    # the pipeline evolves: extraction now stamps a model tag; without the
    # opt-in the sink rejects the widened batch (contract unchanged)
    docs.where("doc_id > 'doc-000050'").write.mode("append").parquet(str(src))
    ext2 = stream_extracted(stream_documents(spark, str(src)), vocab).withColumn(
        "model_tag", F.lit("gaz-2.0")
    )
    with pytest.raises(Exception, match="allow_new_columns"):
        stream_upsert(ext2, cat, "extracted", "doc_id", chk)

    stream_upsert(ext2, cat, "extracted", "doc_id", chk, allow_new_columns=True)
    out = cat.read_stage(spark, "extracted")
    assert "model_tag" in out.columns
    assert out.count() == docs.count()
    # pre-evolution micro-batch rows null-fill; post-evolution rows carry it
    tags = {r.doc_id: r.model_tag for r in out.select("doc_id", "model_tag").collect()}
    assert all(v is None for d, v in tags.items() if d <= "doc-000050")
    assert all(v == "gaz-2.0" for d, v in tags.items() if d > "doc-000050")


def test_stream_upsert_merge_on_read_composes(spark, vocab, tmp_path):
    """Streaming sink × merge-on-read: micro-batches are the archetypal
    uniform-small-batch writer CoW punishes (BENCH/MOR_SCALING.md), so the
    sink can land each drained batch as per-bucket deltas. The contract:
    post-drain reads are exact (keyed replace, no dupes), base files are
    untouched by the delta drain, and maintenance compaction folds the
    accumulated generations without changing the answer."""
    from llacie_spark.corpus import reference_documents
    from llacie_spark.io import SnapshotCatalog
    from llacie_spark.streaming import stream_documents, stream_extracted, stream_upsert

    src = tmp_path / "in"
    chk = str(tmp_path / "chk")
    cat = SnapshotCatalog(str(tmp_path / "cat"))
    docs = reference_documents(spark).cache()

    # epoch 1 creates the table (first touch writes base, MoR or not)
    docs.where("doc_id <= 'doc-000050'").write.mode("append").parquet(str(src))
    extracted = stream_extracted(stream_documents(spark, str(src)), vocab)
    stream_upsert(extracted, cat, "extracted", "doc_id", chk, merge_on_read=True)
    assert cat.read_stage(spark, "extracted").count() == 50
    base_files = {
        p: os.path.getmtime(p)
        for p in glob.glob(str(tmp_path / "cat" / "extracted" / "snap-*" / "**" / "*.parquet"), recursive=True)
    }

    # epoch 2 drains as deltas: base files byte-untouched, read exact
    docs.where("doc_id > 'doc-000050'").write.mode("append").parquet(str(src))
    stream_upsert(extracted, cat, "extracted", "doc_id", chk, merge_on_read=True)
    cur = cat.current_snapshot("extracted")
    assert cat._delta_map(cur), "second drain should have landed as deltas"
    for p, mtime in base_files.items():
        assert os.path.getmtime(p) == mtime, f"base file rewritten: {p}"
    out = cat.read_stage(spark, "extracted")
    assert out.count() == docs.count()
    assert out.groupBy("doc_id").count().where("count > 1").count() == 0

    # maintenance folds the generations; the answer is unchanged
    cat.compact(spark, "extracted")
    assert not cat._delta_map(cat.current_snapshot("extracted"))
    assert cat.read_stage(spark, "extracted").count() == docs.count()
