"""As-of join: for each left row, the most recent right row at or before it.

The classic time-series join (trades→quotes, events→latest state). The naive
rendering is a range join (left.ts >= right.ts, rank 1) — O(n·m) per key and
a planner trap at scale. This implementation uses the union-window form:

1. tag both sides and union them on (key, ts) — one dataset;
2. within each key, order by (ts, side) and carry the last non-null right
   payload forward with an ``ignore nulls`` running window;
3. keep the left rows — each now paired with its as-of right payload.

Cost: exactly one shuffle on the key, regardless of how many right rows
precede each left row. Ties (equal ts) resolve right-before-left, i.e. a
right row AT the left timestamp matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_value_cols: list[str] | None = None,
    tolerance_s: int | None = None,
) -> DataFrame:
    """left + most-recent right-at-or-before, per ``on`` key.

    Output = all left columns + ``asof_<col>`` for each right value column +
    ``asof_ts`` (the matched right timestamp; all null when no right row
    precedes). ``tolerance_s`` nulls matches older than the bound."""
    value_cols = right_value_cols or [c for c in right.columns if c not in (on, right_ts)]
    left_types = {f.name: f.dataType for f in left.schema.fields}
    carry_cols = [c for c in left.columns if c != on]

    payload = F.struct(F.col(right_ts).alias("_rts"), *[F.col(c) for c in value_cols])
    r_union = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        payload.alias("_payload"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in carry_cols],
    )
    payload_type = r_union.schema["_payload"].dataType
    l_union = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(payload_type).alias("_payload"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in carry_cols],
    )
    unioned = l_union.unionByName(r_union)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())  # right wins ties
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1)
    if tolerance_s is not None:
        out = out.withColumn(
            "_asof",
            F.when(
                F.unix_timestamp("_ts") - F.unix_timestamp("_asof._rts") <= tolerance_s,
                F.col("_asof"),
            ),
        )
    for c in value_cols:
        out = out.withColumn(f"asof_{c}", F.col(f"_asof.{c}"))
    return out.withColumn("asof_ts", F.col("_asof._rts")).drop(
        "_asof", "_payload", "_side", "_ts"
    )
