"""Multimodal column plumbing: opaque media payloads with typed metadata.

Interleaved documents carry media spans as references; at pipeline scale the
binary payloads live in their own table (``media(doc_id, media_ref, content
binary, media_type)``) so text stages never shuffle bytes they don't read.
Operators here implement the Spark-side plumbing — schemas, batch iteration,
partition-friendly UDF signatures — with the actual codec work behind a
pluggable decoder:

- the image/audio libraries are not in this container, so the default
  decoder is a clearly-marked deterministic fake (size/hash/dimension
  metadata derived from the bytes) and a ``NotImplementedError`` guard for
  real decode — the plumbing is real and tested, the codec is a stub;
- decode runs in ``mapInPandas`` (iterator of batches) so a real decoder
  (PIL/ffmpeg/torchvision) initializes once per task and streams batches,
  the same shape as the batched LLM scorer.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),  # opaque payload
    ]
)

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("decoder", T.StringType(), False),
    ]
)


class FakeDecoder:
    """Deterministic stand-in codec: metadata derived purely from the bytes.

    Real decoders (PIL for images, ffmpeg for av) are not installed in this
    environment; swap in :class:`RealDecoder` in production."""

    name = "fake-deterministic"

    def decode_batch(self, payloads: list[bytes | None], media_types: list[str]) -> list[dict]:
        out = []
        for b, mt in zip(payloads, media_types):
            if b is None:
                out.append({"n_bytes": None, "content_sha256": None, "width": None,
                            "height": None, "duration_s": None})
                continue
            # sha256 (not sha1) so the DuckDB oracle can recompute the digest
            h = hashlib.sha256(b).hexdigest()
            seed = int(h[:8], 16)
            meta = {"n_bytes": len(b), "content_sha256": h, "width": None,
                    "height": None, "duration_s": None}
            if mt == "image":
                meta["width"] = 64 + seed % 1920
                meta["height"] = 64 + (seed >> 8) % 1080
            else:
                meta["duration_s"] = round(0.5 + (seed % 6000) / 10.0, 1)
            out.append(meta)
        return out


class RealDecoder:
    """Production codec adapter; requires PIL/ffmpeg which this container
    deliberately lacks."""

    name = "real"

    def __init__(self):
        try:
            import PIL  # noqa: F401
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "real media decoding needs PIL/ffmpeg; not available in this "
                "environment — use FakeDecoder"
            ) from e

    def decode_batch(self, payloads, media_types):  # pragma: no cover
        raise NotImplementedError("wire PIL/ffmpeg decode here")


def synthetic_media(spark: SparkSession, documents: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents' media spans:
    payload bytes are a hash-expanded function of the media_ref (no files
    needed, same bytes every run)."""
    from .porthash import portable_hash60

    # portable_hash60 is non-negative by construction, so % 3 lands uniformly
    # in {0,1,2} (a signed xxhash64 % 3 would leak remainders -1/-2 into the
    # otherwise-branch) — and the DuckDB oracle can recompute it exactly.
    mt = F.pmod(portable_hash60(F.col("s.media_ref")), F.lit(3))
    refs = documents.select(
        "doc_id", F.explode("spans").alias("s")
    ).where(F.col("s.kind") == "media").select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.when(mt == 0, "image").when(mt == 1, "audio").otherwise("video").alias("media_type"),
    )
    # payload = sha2 hex of the ref repeated — opaque, deterministic, binary
    return refs.withColumn(
        "content",
        F.to_binary(F.repeat(F.sha2(F.col("media_ref"), 256), 8), F.lit("utf-8")),
    )


def extract_media_features(media: DataFrame, decoder=None) -> DataFrame:
    """media -> MEDIA_FEATURES via mapInPandas: decoder constructed once per
    task, batches streamed (the multimodal twin of the batched scorer)."""
    dec = decoder or FakeDecoder()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = dec.decode_batch(list(pdf["content"]), list(pdf["media_type"]))
            out = pd.DataFrame(metas)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_ref", pdf["media_ref"].values)
            out.insert(2, "media_type", pdf["media_type"].values)
            out["decoder"] = dec.name
            yield out[[f.name for f in MEDIA_FEATURES.fields]]

    return media.mapInPandas(gen, MEDIA_FEATURES)
