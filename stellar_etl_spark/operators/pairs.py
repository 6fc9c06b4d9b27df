"""J2: user→response pairing — the as-of / latest-prior-state join analog
(``internal/transform/trade.go:281-304 findLatestOperationChange``: scan a
key's changes for the closest prior match; re-oriented here as "closest
following response", the stream-stream-join north star).

Batch implementation: a single window pass — for each turn, the first
following assistant/tool turn in the same conversation via
``first(..., ignorenulls)`` over ``rowsBetween(1, unboundedFollowing)``; then
keep only user rows. One shuffle on ``conv_id``, no self-join, no skew
amplification (the window sort reuses the partitioning).

The streaming variant (watermark-bounded stream-stream join) lives in
:mod:`stellar_etl_spark.streaming.pipeline`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

RESPONSE_ROLES = ("assistant", "tool")


def extract_pairs(df: DataFrame, max_lag_sec: int | None = None) -> DataFrame:
    """Pair every user turn with its first following assistant/tool turn.

    ``max_lag_sec`` optionally voids pairs whose response arrived more than
    that many seconds after the user turn (the watermark-bound analog —
    batch and streaming then agree on which pairs exist).
    """
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    resp = F.when(
        F.col("role").isin(*RESPONSE_ROLES),
        F.struct(
            F.col("turn_idx").alias("turn_idx"),
            F.col("role").alias("role"),
            F.col("ts").alias("ts"),
            F.col("text").alias("text"),
        ),
    )
    paired = df.withColumn("resp", F.first(resp, ignorenulls=True).over(w))

    out = paired.where(F.col("role") == "user")
    if max_lag_sec is not None:
        in_bound = (
            F.col("resp").isNotNull()
            & (F.unix_timestamp("resp.ts") - F.unix_timestamp("ts") <= max_lag_sec)
        )
        out = out.withColumn("resp", F.when(in_bound, F.col("resp")))

    return out.select(
        "conv_id",
        F.col("turn_idx").alias("user_turn_idx"),
        F.col("ts").alias("user_ts"),
        F.col("text").alias("user_text"),
        F.col("resp.turn_idx").alias("resp_turn_idx"),
        F.col("resp.role").alias("resp_role"),
        F.col("resp.ts").alias("resp_ts"),
        F.col("resp.text").alias("resp_text"),
        (F.unix_timestamp("resp.ts") - F.unix_timestamp("ts"))
        .cast("double")
        .alias("latency_sec"),
    )
