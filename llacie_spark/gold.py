"""Gold-label import: explode pipe-delimited human annotations + validate.

Reference behavior (``/root/reference/llacie/db.py:720-766``, S8 in the
operator inventory): the annotation sheet carries one row per episode with a
pipe-delimited ``human_labels`` cell; the importer splits on ``\\s*[|]\\s*``,
explodes to one row per (episode, label), and rejects the whole import when
any label is not a canonical vocabulary term (db.py:739-742). The Spark
rendering is split+explode plus a left-anti validation join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class UnknownLabelError(ValueError):
    pass


def load_gold_csv(spark: SparkSession, path: str, annotator: str = "annotator1") -> DataFrame:
    """Read the extracted gold CSV (FK_episode_id, section_value,
    human_labels) into raw (episode_id, human_labels, annotator) rows."""
    raw = spark.read.option("header", True).option("multiLine", True).option("escape", '"').csv(path)
    return raw.select(
        F.col("FK_episode_id").cast("long").alias("episode_id"),
        F.col("human_labels"),
        F.lit(annotator).alias("annotator"),
    )


def load_gold_xlsx(
    spark: SparkSession, path: str, annotator: str = "annotator1", sheet: str | None = None
) -> DataFrame:
    """Read the reference's annotation WORKBOOK directly (``llacie/db.py:
    720-766`` imports the same sheet with read_excel) — stdlib zip+XML
    reader, no openpyxl needed. Driver-side parse of a ~100-row artifact,
    then a Spark DataFrame in the same shape as :func:`load_gold_csv`."""
    from llacie_spark.xlsx import read_rows

    rows = [
        (
            int(r["FK_episode_id"]),
            None if r.get("human_labels") is None else str(r["human_labels"]),
            annotator,
        )
        for r in read_rows(path, sheet=sheet)
        if r.get("FK_episode_id") not in (None, "")
    ]
    return spark.createDataFrame(
        rows, "episode_id long, human_labels string, annotator string"
    )


def explode_labels(gold_raw: DataFrame) -> DataFrame:
    """Pipe-delimited label cell -> one row per (episode, label, annotator)."""
    return (
        gold_raw.select(
            "episode_id",
            "annotator",
            F.explode(F.split(F.trim("human_labels"), r"\s*[|]\s*")).alias("label_name"),
        )
        .where(F.length("label_name") > 0)
    )


def validate_against_vocab(labels: DataFrame, concepts: DataFrame) -> DataFrame:
    """Reject imports containing labels outside the canonical term set —
    the reference raises on the first unknown term; here the check is one
    anti-join so it's a single pass at any scale."""
    canon = concepts.select(F.col("canonical_name").alias("label_name")).distinct()
    unknown = labels.join(F.broadcast(canon), "label_name", "left_anti")
    bad = [r.label_name for r in unknown.select("label_name").distinct().limit(10).collect()]
    if bad:
        raise UnknownLabelError(f"labels not in vocabulary: {bad}")
    return labels


def import_gold(
    spark: SparkSession, path: str, concepts: DataFrame, annotator: str = "annotator1"
) -> DataFrame:
    loader = load_gold_xlsx if path.lower().endswith(".xlsx") else load_gold_csv
    return validate_against_vocab(explode_labels(loader(spark, path, annotator)), concepts)
