"""Hot-key salting — the skew weapon the reference never needs (single
process) but a 10^12-turn table does (SURVEY §4 "skew handling"): one
mega-conversation can dominate a `groupBy(conv_id)` task.

Two tools:

- :func:`salted` — deterministic salt column (hash of a secondary column, not
  ``rand()`` — replays must be byte-identical) for repartitioning stateless
  stages.
- :func:`extract_conversations_salted` — the T1/A1 conversation summary as a
  **two-phase aggregation**: partial aggregate on (conv_id, salt) spreads a
  hot conversation over ``buckets`` reducers, then a cheap final aggregate on
  conv_id combines the partials (sums of counts, min of mins, max of maxs).
  Semantically identical to ``extract_conversations`` — the registry checks
  both against the *same* DuckDB oracle.

Note AQE's skew-join splitting handles join-side skew automatically; salting
is for aggregation/window skew, which AQE does not split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from stellar_etl_spark import toid as toid_mod
from stellar_etl_spark.functions import text as textfn
from stellar_etl_spark.functions.scalars import is_successful


def salted(df: DataFrame, salt_col: str = "turn_idx", buckets: int = 16) -> DataFrame:
    """Add a deterministic ``_salt`` in [0, buckets) derived from salt_col."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)).cast("int"))


def extract_conversations_salted(
    df: DataFrame, buckets: int = 16, conv_seq: Column | None = None
) -> DataFrame:
    """Two-phase (salted) conversation summary, output identical to
    :func:`stellar_etl_spark.operators.conversations.extract_conversations`."""
    seq = conv_seq if conv_seq is not None else toid_mod.conv_seq("conv_id")
    successful = is_successful(F.col("text"))

    partial = (
        salted(df, buckets=buckets)
        .withColumn("_conv_seq", seq)
        .groupBy("conv_id", "_conv_seq", "_salt")
        .agg(
            F.count(F.lit(1)).alias("p_turns"),
            F.count_if(F.col("role") == "user").alias("p_user"),
            F.count_if(F.col("role") == "assistant").alias("p_assistant"),
            F.count_if(F.col("role") == "tool").alias("p_tool"),
            F.count_if(F.col("role") == "system").alias("p_system"),
            F.count_if(successful).alias("p_successful"),
            F.count_if(~successful).alias("p_failed"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("p_chars"),
            F.sum(textfn.token_count(F.col("text"))).alias("p_tokens"),
            F.min("ts").alias("p_opened"),
            F.max("ts").alias("p_closed"),
        )
    )
    final = partial.groupBy("conv_id", "_conv_seq").agg(
        F.sum("p_turns").alias("n_turns"),
        F.sum("p_user").alias("n_user"),
        F.sum("p_assistant").alias("n_assistant"),
        F.sum("p_tool").alias("n_tool"),
        F.sum("p_system").alias("n_system"),
        F.sum("p_successful").alias("n_successful"),
        F.sum("p_failed").alias("n_failed"),
        F.sum("p_chars").cast("long").alias("total_chars"),
        F.sum("p_tokens").cast("long").alias("total_tokens"),
        F.min("p_opened").alias("opened_at"),
        F.max("p_closed").alias("closed_at"),
    )
    return final.select(
        "conv_id",
        F.col("_conv_seq").alias("conv_seq"),
        "n_turns",
        "n_user",
        "n_assistant",
        "n_tool",
        "n_system",
        "n_successful",
        "n_failed",
        "total_chars",
        "total_tokens",
        "opened_at",
        "closed_at",
        (F.unix_timestamp("closed_at") - F.unix_timestamp("opened_at"))
        .cast("double")
        .alias("duration_sec"),
    )
