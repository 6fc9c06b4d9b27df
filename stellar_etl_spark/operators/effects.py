"""T5: effect fan-out — the TransformEffect analog
(``internal/transform/effects.go:23-169`` + ~40 emitters).

The reference flatMaps each *successful* transaction into 0..N typed effect
rows (failed txs emit nothing, ``effects.go:55-57``), assigns a dense per-op
effect index and an ``"{opID}-{idx}"`` string id (``effects.go:161-166``).

Spark-first shape: build a per-turn array of conditional effect structs,
``filter`` out the null (non-firing) slots, ``posexplode`` — the dense index
falls out of the post-filter position, and the whole emitter chain stays in
whole-stage codegen (no UDTF, no Python).

Effect rules (the emitter-table analog). Codes 0-11 are row-local
(:func:`extract_effects`, shuffle-free); codes 12-24 need per-conversation
lag context and live in :func:`extract_effects_contextual` (one conv_id
window pass — the CEP-flavored half of the emitter table):

| code | type                | fires when (successful turns only)    |
|------|---------------------|---------------------------------------|
| 0    | turn_added          | every turn                            |
| 1    | tool_invoked        | tool turn                             |
| 2    | empty_text          | empty text                            |
| 3    | long_turn           | > 30 tokens                           |
| 4    | conversation_opened | turn_idx == 0                         |
| 5    | unicode_text        | multibyte text (bytes != chars)       |
| 6    | short_turn          | 1..3 tokens                           |
| 7    | mixed_script        | ascii letters AND multibyte together  |
| 8    | long_chars          | > 150 chars                           |
| 9    | repeat_heavy        | >= 4 tokens, < half distinct          |
| 10   | single_token        | exactly 1 token                       |
| 11   | emoji_text          | contains an emoji vocab mark          |
| 12   | first_assistant     | first assistant turn of the conv      |
| 13   | first_tool_use      | first tool turn of the conv           |
| 14   | long_silence        | > 300 s since previous turn           |
| 15   | session_resumed     | > 1800 s since previous turn          |
| 16   | turn_burst          | <= 5 s since previous turn            |
| 17   | tool_changed        | tool turn, differs from last tool     |
| 18   | repeated_speaker    | same role as previous turn            |
| 19   | assistant_after_tool| assistant preceded by a tool turn     |
| 20   | conversation_closed | last turn of the conv                 |
| 21   | speaker_changed     | different role than previous turn     |
| 22   | first_user          | first user turn of the conv           |
| 23   | conv_midpoint       | 2 * turn_idx == max turn_idx          |
| 24   | second_half         | 2 * turn_idx > max turn_idx           |
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from stellar_etl_spark import toid as toid_mod
from stellar_etl_spark.functions import text as textfn
from stellar_etl_spark.functions.scalars import is_successful

EFFECT_TYPES = {
    0: "turn_added",
    1: "tool_invoked",
    2: "empty_text",
    3: "long_turn",
    4: "conversation_opened",
    5: "unicode_text",
    6: "short_turn",
    7: "mixed_script",
    8: "long_chars",
    9: "repeat_heavy",
    10: "single_token",
    11: "emoji_text",
    12: "first_assistant",
    13: "first_tool_use",
    14: "long_silence",
    15: "session_resumed",
    16: "turn_burst",
    17: "tool_changed",
    18: "repeated_speaker",
    19: "assistant_after_tool",
    20: "conversation_closed",
    21: "speaker_changed",
    22: "first_user",
    23: "conv_midpoint",
    24: "second_half",
}


def _effect(code: int, cond: Column, details: Column) -> Column:
    return F.when(
        cond,
        F.struct(
            F.lit(code).alias("effect_type"),
            F.lit(EFFECT_TYPES[code]).alias("effect_type_string"),
            details.alias("details"),
        ),
    )


def _prepare_row_signals(df: DataFrame) -> DataFrame:
    """Materialize the per-row signals the emitter table reads in ONE
    projection. Emitters reference these columns by name, so the text is
    split/scanned once per row no matter how many rules consume the result
    (each Column-expression rule re-deriving token_count was measured 2.4x
    slower at 12 rules — Catalyst does not CSE across the emitter array)."""
    s = F.coalesce(F.col("text"), F.lit(""))
    return df.select(
        "*",
        s.alias("_s"),
        textfn.token_count(F.col("text")).alias("_ntok"),
        F.size(F.array_distinct(textfn.tokens(F.col("text")))).alias("_ndistinct"),
        F.length(s).alias("_nchar"),
        (F.octet_length(s) != F.length(s)).alias("_mb"),
        s.rlike("[A-Za-z]").alias("_ascii_letter"),
        s.contains("🙂").alias("_emoji"),
    )


def _row_local_emitters(long_turn_tokens: int) -> list[Column]:
    """Emitters 0-11: deterministic on the row alone (shuffle-free). Reads
    the precomputed signal columns from :func:`_prepare_row_signals`."""
    n_tokens = F.col("_ntok")
    empty = F.col("_s") == ""
    s = F.col("_s")
    multibyte = F.col("_mb")
    has_ascii_letter = F.col("_ascii_letter")
    return [
        _effect(
            0,
            F.lit(True),
            F.create_map(F.lit("role"), F.col("role"), F.lit("n_tokens"), n_tokens.cast("string")),
        ),
        _effect(
            1,
            F.col("role") == "tool",
            F.create_map(F.lit("tool"), F.coalesce(F.col("tool"), F.lit(""))),
        ),
        _effect(2, empty, F.create_map(F.lit("role"), F.col("role"))),
        _effect(
            3,
            n_tokens > long_turn_tokens,
            F.create_map(F.lit("n_tokens"), n_tokens.cast("string")),
        ),
        _effect(4, F.col("turn_idx") == 0, F.create_map(F.lit("role"), F.col("role"))),
        _effect(5, multibyte, F.create_map(F.lit("role"), F.col("role"))),
        _effect(
            6,
            (n_tokens >= 1) & (n_tokens <= 3),
            F.create_map(F.lit("n_tokens"), n_tokens.cast("string")),
        ),
        _effect(7, multibyte & has_ascii_letter, F.create_map(F.lit("role"), F.col("role"))),
        _effect(
            8,
            F.col("_nchar") > 150,
            F.create_map(F.lit("n_chars"), F.col("_nchar").cast("string")),
        ),
        _effect(
            9,
            (n_tokens >= 4) & (F.col("_ndistinct") * 2 < n_tokens),
            F.create_map(F.lit("n_tokens"), n_tokens.cast("string")),
        ),
        _effect(
            10,
            n_tokens == 1,
            F.create_map(F.lit("n_tokens"), n_tokens.cast("string")),
        ),
        _effect(11, F.col("_emoji"), F.create_map(F.lit("role"), F.col("role"))),
    ]


def _explode_emitters(df: DataFrame, emitters: list[Column], seq: Column) -> DataFrame:
    fired = F.filter(F.array(*emitters), lambda x: x.isNotNull())
    base = df.select(
        "conv_id",
        "turn_idx",
        "ts",
        seq.alias("conv_seq"),
        F.posexplode(fired).alias("effect_index", "eff"),
    )
    turn_id = toid_mod.toid(F.col("conv_seq"), "turn_idx")
    return base.select(
        F.format_string("%d-%d", turn_id, F.col("effect_index")).alias("effect_id"),
        turn_id.alias("turn_id"),
        "conv_id",
        "turn_idx",
        F.col("effect_index").cast("int").alias("effect_index"),
        F.col("eff.effect_type").cast("int").alias("effect_type"),
        F.col("eff.effect_type_string").alias("effect_type_string"),
        F.col("eff.details").alias("details"),
        "ts",
    )


def extract_effects(
    df: DataFrame, long_turn_tokens: int = 30, conv_seq: Column | None = None
) -> DataFrame:
    """Fan transcripts out into the EFFECTS output schema (row-local rules
    0-7 — a narrow transform, no shuffle)."""
    seq = conv_seq if conv_seq is not None else toid_mod.conv_seq("conv_id")
    # Failed turns emit nothing (effects.go:55-57) — filter BEFORE the explode
    # so the excluded rows never materialize.
    return _explode_emitters(
        _prepare_row_signals(df.where(is_successful(F.col("text")))),
        _row_local_emitters(long_turn_tokens),
        seq,
    )


def extract_effects_contextual(
    df: DataFrame,
    long_turn_tokens: int = 30,
    silence_sec: int = 300,
    resume_sec: int = 1800,
    burst_sec: int = 5,
    conv_seq: Column | None = None,
) -> DataFrame:
    """The full emitter table (0-16): row-local rules plus per-conversation
    lag-context rules, over successful turns ordered by turn_idx.

    One conv_id window pass supplies all the context (lag ts/role, last prior
    tool, prior role counts, partition max) — the explode itself stays narrow,
    so the plan is exactly one Exchange (pinned in tests/test_plans.py)."""
    seq = conv_seq if conv_seq is not None else toid_mod.conv_seq("conv_id")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_prior = w.rowsBetween(Window.unboundedPreceding, -1)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    base = _prepare_row_signals(df.where(is_successful(F.col("text")))).select(
        "*",
        F.lag("ts").over(w).alias("_prev_ts"),
        F.lag("role").over(w).alias("_prev_role"),
        F.last("tool", ignorenulls=True).over(w_prior).alias("_prev_tool"),
        F.count(F.when(F.col("role") == "assistant", 1)).over(w_prior).alias("_n_prior_assistant"),
        F.count(F.when(F.col("role") == "tool", 1)).over(w_prior).alias("_n_prior_tool"),
        F.count(F.when(F.col("role") == "user", 1)).over(w_prior).alias("_n_prior_user"),
        F.max("turn_idx").over(w_all).alias("_max_turn_idx"),
    )
    gap = (
        F.floor(F.unix_timestamp("ts")) - F.floor(F.unix_timestamp("_prev_ts"))
    ).cast("long")
    gap_map = F.create_map(F.lit("gap_sec"), gap.cast("string"))
    has_prev = F.col("_prev_ts").isNotNull()

    contextual = [
        _effect(
            12,
            (F.col("role") == "assistant") & (F.col("_n_prior_assistant") == 0),
            F.create_map(F.lit("turn_idx"), F.col("turn_idx").cast("string")),
        ),
        _effect(
            13,
            (F.col("role") == "tool") & (F.col("_n_prior_tool") == 0),
            F.create_map(F.lit("tool"), F.coalesce(F.col("tool"), F.lit(""))),
        ),
        _effect(14, has_prev & (gap > silence_sec), gap_map),
        _effect(15, has_prev & (gap > resume_sec), gap_map),
        _effect(16, has_prev & (gap <= burst_sec), gap_map),
        _effect(
            17,
            (F.col("role") == "tool")
            & F.col("_prev_tool").isNotNull()
            & (F.col("_prev_tool") != F.coalesce(F.col("tool"), F.lit(""))),
            F.create_map(
                F.lit("from"), F.col("_prev_tool"),
                F.lit("to"), F.coalesce(F.col("tool"), F.lit("")),
            ),
        ),
        _effect(
            18,
            has_prev & (F.col("_prev_role") == F.col("role")),
            F.create_map(F.lit("role"), F.col("role")),
        ),
        _effect(
            19,
            (F.col("role") == "assistant") & (F.col("_prev_role") == "tool"),
            F.create_map(F.lit("role"), F.col("role")),
        ),
        _effect(
            20,
            F.col("turn_idx") == F.col("_max_turn_idx"),
            F.create_map(F.lit("turn_idx"), F.col("turn_idx").cast("string")),
        ),
        _effect(
            21,
            has_prev & (F.col("_prev_role") != F.col("role")),
            F.create_map(F.lit("from"), F.col("_prev_role"), F.lit("to"), F.col("role")),
        ),
        _effect(
            22,
            (F.col("role") == "user") & (F.col("_n_prior_user") == 0),
            F.create_map(F.lit("turn_idx"), F.col("turn_idx").cast("string")),
        ),
        _effect(
            23,
            F.col("turn_idx") * 2 == F.col("_max_turn_idx"),
            F.create_map(F.lit("turn_idx"), F.col("turn_idx").cast("string")),
        ),
        _effect(
            24,
            F.col("turn_idx") * 2 > F.col("_max_turn_idx"),
            F.create_map(F.lit("turn_idx"), F.col("turn_idx").cast("string")),
        ),
    ]
    return _explode_emitters(base, _row_local_emitters(long_turn_tokens) + contextual, seq)
