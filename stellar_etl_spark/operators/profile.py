"""T17-analog: the wide per-entity typed projection — one row per
conversation with 50+ columns spanning counts, per-tool histograms, token
and timing statistics, boundary texts, flags, and JSON-serialized nested
arrays (the reference's ~70-field config-setting projection,
``internal/transform/config_setting.go:13-260``, re-imagined for transcripts).

Plan shape: one ``lag`` window and one groupBy, both keyed on ``conv_id`` —
the window's partitioning is reused by the aggregation, so the whole
projection costs exactly one Exchange (pinned in tests/test_plans.py). Every
aggregate is a built-in Column function (map-side partial where Spark can);
arrays are sorted then JSON-serialized so value-hashing is engine-portable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from stellar_etl_spark import toid as toid_mod
from stellar_etl_spark.functions import text as textfn
from stellar_etl_spark.functions.scalars import is_successful

_TOOLS = ["browse", "calc", "code", "fetch", "search"]


def extract_conversation_profile(df: DataFrame, conv_seq: Column | None = None) -> DataFrame:
    """Wide conversation profile: 50+ typed columns per conv_id."""
    seq = conv_seq if conv_seq is not None else toid_mod.conv_seq("conv_id")
    s = F.coalesce(F.col("text"), F.lit(""))
    n_tokens = textfn.token_count(F.col("text"))
    successful = is_successful(F.col("text"))
    multibyte = F.octet_length(s) != F.length(s)
    epoch = F.floor(F.unix_timestamp("ts")).cast("long")

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    base = df.select(
        "conv_id",
        seq.alias("conv_seq"),
        "turn_idx",
        "role",
        "tool",
        "text",
        "ts",
        n_tokens.alias("ntok"),
        F.length(s).alias("nchar"),
        F.octet_length(s).alias("nbytes"),
        successful.alias("ok"),
        multibyte.alias("mb"),
        (epoch - F.floor(F.unix_timestamp(F.lag("ts").over(w))).cast("long")).alias("gap_sec"),
    )

    cnt = lambda cond: F.count(F.when(cond, 1))  # noqa: E731
    first_by_turn = lambda cond, col: F.min(  # noqa: E731
        F.when(cond, F.struct(F.col("turn_idx").alias("i"), col.alias("v")))
    )["v"]
    last_by_turn = lambda cond, col: F.max(  # noqa: E731
        F.when(cond, F.struct(F.col("turn_idx").alias("i"), col.alias("v")))
    )["v"]
    dbl = lambda c: c.cast("double")  # noqa: E731
    t = F.lit(True)

    per_tool = [
        cnt(F.col("tool") == name).alias(f"n_tool_{name}") for name in _TOOLS
    ]

    agg = base.groupBy("conv_id", "conv_seq").agg(
        # -- counts ---------------------------------------------------------
        F.count(F.lit(1)).alias("n_turns"),
        cnt(F.col("role") == "user").alias("n_user"),
        cnt(F.col("role") == "assistant").alias("n_assistant"),
        cnt(F.col("role") == "tool").alias("n_tool"),
        cnt(F.col("role") == "system").alias("n_system"),
        cnt(F.col("ok")).alias("n_successful"),
        cnt(~F.col("ok")).alias("n_failed"),
        cnt(F.col("text").isNull() | (F.col("text") == "")).alias("n_empty"),
        cnt(F.col("mb")).alias("n_unicode"),
        cnt((F.col("ntok") >= 1) & (F.col("ntok") <= 3)).alias("n_short"),
        cnt(F.col("ntok") > 30).alias("n_long"),
        F.size(F.collect_set("role")).cast("long").alias("n_distinct_roles"),
        F.size(F.collect_set("tool")).cast("long").alias("n_distinct_tools"),
        *per_tool,
        # -- token / char / byte stats ---------------------------------------
        F.sum("ntok").alias("total_tokens"),
        F.min("ntok").alias("min_tokens"),
        F.max("ntok").alias("max_tokens"),
        F.sum("nchar").alias("total_chars"),
        F.min("nchar").alias("min_chars"),
        F.max("nchar").alias("max_chars"),
        F.sum("nbytes").alias("total_bytes"),
        # -- time -------------------------------------------------------------
        F.min("ts").alias("opened_at"),
        F.max("ts").alias("closed_at"),
        (
            F.floor(F.unix_timestamp(F.max("ts"))) - F.floor(F.unix_timestamp(F.min("ts")))
        ).cast("double").alias("duration_sec"),
        F.min(F.when(F.col("role") == "user", F.col("ts"))).alias("first_user_ts"),
        F.max(F.when(F.col("role") == "assistant", F.col("ts"))).alias("last_assistant_ts"),
        F.max("gap_sec").alias("max_gap_sec"),
        F.min("gap_sec").alias("min_gap_sec"),
        F.sum("gap_sec").alias("total_gap_sec"),
        F.count("gap_sec").alias("n_gaps"),
        cnt(F.col("gap_sec") > 1800).alias("n_session_breaks"),
        # -- boundary values ---------------------------------------------------
        first_by_turn(t, F.col("role")).alias("first_role"),
        last_by_turn(t, F.col("role")).alias("last_role"),
        first_by_turn(F.col("role") == "user", s).alias("first_user_text"),
        last_by_turn(t, s).alias("last_text"),
        first_by_turn(F.col("tool").isNotNull(), F.col("tool")).alias("first_tool"),
        last_by_turn(F.col("tool").isNotNull(), F.col("tool")).alias("last_tool"),
        F.min("turn_idx").alias("min_turn_idx"),
        F.max("turn_idx").alias("max_turn_idx"),
        last_by_turn(t, F.col("ntok")).alias("last_turn_tokens"),
        # -- nested arrays (JSON-serialized for portable hashing) -------------
        F.to_json(F.sort_array(F.collect_set("tool"))).alias("tools_used"),
        F.to_json(F.sort_array(F.collect_set("role"))).alias("roles_seen"),
        F.to_json(
            F.transform(
                F.slice(
                    F.sort_array(
                        F.collect_list(F.struct(F.col("turn_idx").alias("i"), s.alias("v")))
                    ),
                    1,
                    3,
                ),
                lambda x: x["v"],
            )
        ).alias("first_3_texts"),
    )

    # -- derived ratios / flags (post-agg, pure projection) -------------------
    nt = F.col("n_turns")
    return agg.select(
        "*",
        (dbl(F.col("total_tokens")) / dbl(nt)).alias("avg_tokens"),
        (dbl(F.col("total_chars")) / dbl(nt)).alias("avg_chars"),
        (dbl(F.col("n_user")) / dbl(nt)).alias("pct_user"),
        (dbl(F.col("n_failed")) / dbl(nt)).alias("pct_failed"),
        (dbl(F.col("n_unicode")) / dbl(nt)).alias("pct_unicode"),
        F.when(
            F.col("total_tokens") > 0, dbl(F.col("total_chars")) / dbl(F.col("total_tokens"))
        ).otherwise(F.lit(0.0)).alias("chars_per_token"),
        F.when(F.col("n_gaps") > 0, dbl(F.col("total_gap_sec")) / dbl(F.col("n_gaps")))
        .otherwise(F.lit(0.0)).alias("avg_gap_sec"),
        (F.col("first_role") == "system").alias("has_system_start"),
        (F.col("n_failed") > 0).alias("has_failures"),
        (nt == 1).alias("single_turn"),
        (nt >= 256).alias("is_hot"),
        (F.col("last_role") == "user").alias("ended_by_user"),
        (F.col("n_session_breaks") > 0).alias("multi_session"),
    )
