"""As-of (point-in-time) join — a custom operator Spark lacks as a
builtin (SURVEY §2.2 'general joins' row): for every left row, attach
the LATEST right row whose timestamp is <= the left timestamp, per key.

Implemented as a composition of existing DataFrame ops (the preferred
tier of the custom-operator ladder): tag and UNION both sides, then one
window `last(value, ignorenulls=True)` over (key, time) — a SINGLE
shuffle on the key, no range join, no per-key quadratic blow-up.  At
100 TB the window frame is running-state only (rowsBetween unbounded
preceding to current), so Spark streams each partition once; skewed
keys are bounded by the window's sequential scan, the same cost any
point-in-time semantics must pay per key.

Tie policy: right rows sort BEFORE left rows at equal timestamps (an
order placed exactly at the event time counts), and right-side
duplicates per (key, ts) are pre-reduced with max(value) so the result
is deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_latest(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    left_ts: str,
    right_key: str,
    right_ts: str,
    right_val: str,
    out_val: str = "asof_val",
    keep: list[str] | None = None,
) -> DataFrame:
    """Left rows + ``out_val`` = max(right_val) of the latest right ts
    <= left ts for the same key.  Left rows with no prior right row are
    DROPPED (inner as-of semantics).  ``keep`` = left columns carried
    through (default: left_key, left_ts).  ``out_val`` keeps the input
    column's type (a general-purpose operator must not truncate, e.g.,
    fractional prices to long)."""
    keep = keep if keep is not None else []
    val_type = right.schema[right_val].dataType
    l_tagged = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(val_type).alias("_v"),
        *keep,
    )
    r_tagged = (
        right.groupBy(
            F.col(right_key).alias("_k"), F.col(right_ts).alias("_t")
        )
        .agg(F.max(right_val).alias("_v"))
        .withColumn("_is_left", F.lit(0))
        .select("_k", "_t", "_is_left", "_v", *[F.lit(None).alias(c) for c in keep])
    )
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("_last", F.last("_v", ignorenulls=True).over(w))
        .filter((F.col("_is_left") == 1) & F.col("_last").isNotNull())
        .select(
            F.col("_k").alias(left_key),
            F.col("_t").alias(left_ts),
            *keep,
            F.col("_last").alias(out_val),
        )
    )
