"""T5: effect fan-out — the TransformEffect analog
(``internal/transform/effects.go:23-169`` + its ~40 emitter functions,
dispatch ``effects.go:54-169``, enum ``schema.go:377-486``).

The reference flatMaps each *successful* transaction into 0..N typed effect
rows (failed txs emit nothing, ``effects.go:55-57``), assigns a dense per-op
effect index and an ``"{opID}-{idx}"`` string id (``effects.go:161-166``).

Spark-first shape: build a per-turn array of conditional effect structs,
``filter`` out the null (non-firing) slots, ``posexplode`` — the dense index
falls out of the post-filter position, and the whole emitter chain stays in
whole-stage codegen (no UDTF, no Python).

**One rule table, two engines.** Every emitter is an :class:`EffectRule`
carrying BOTH the Spark Column builders and the DuckDB SQL fragments; the
registry generates the oracle SQL from this same table, so an added rule is
automatically oracle-checked (condition, details values, dense index) with
zero drift risk.

Rule families (mirroring the reference's emitter shapes):

- codes 0-11 — row-local (``accountCreated``/``trustlineFlagsUpdated``-style
  single-entry emitters): deterministic on the row alone, shuffle-free
  (:func:`extract_effects`);
- codes 12-24 — lag-context over the conv_id window (the CEP half);
- codes 25-33 and 38-39 — state-diff flavored (``account_credited/debited``
  balance deltas → token growth/shrink, running balances → cumulative-token
  milestones and the running-vs-total half-point, flag set/clear → text
  resumed, last-of-group closures, rapid tool chaining);
- codes 34-37 — per-(conv_id, tool) window (``signer added/removed`` shape —
  the J3 within-group prior-op lookback): first/last use of each tool kind,
  args changed/repeated vs the prior call of the SAME tool. The second
  window partitioning rides the conv_id Exchange (hash(conv_id) already
  clusters (conv_id, tool)), so the whole contextual plan still has exactly
  ONE shuffle — pinned in tests/test_plans.py;
- codes 40-45 — the sponsorship-chain triple x2 entity kinds
  (``schema.go:377-486`` enum tail: sponsorship created/updated/removed per
  entity, emitters ``effects.go:~900-1100``): tool-kind entities sponsored
  by the most recent prior user turn (established on first call, updated
  when the requester changed between calls of the SAME kind, revoked at the
  kind's last call before the conversation ends), and the conversation
  entity sponsored by the most recent system directive.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from stellar_etl_spark import toid as toid_mod
from stellar_etl_spark.functions import text as textfn
from stellar_etl_spark.functions.scalars import is_successful

# default thresholds (the SQL side of the rule table is generated with these;
# Spark-side overrides exist for unit tests only)
LONG_TURN_TOKENS = 30
SILENCE_SEC = 300
RESUME_SEC = 1800
BURST_SEC = 5
MILESTONE_TOKENS = 256


class EffectRule(NamedTuple):
    """One emitter, expressed for both engines.

    ``cond``/``details`` build Spark Columns lazily (classic-mode ``F.col``
    needs an active session) from the signal columns prepared by
    :func:`_prepare_row_signals` / :func:`extract_effects_contextual`;
    ``sql_cond``/``sql_details`` are DuckDB expressions over the identically
    named signal aliases of the generated oracle CTE (plans/registry.py).
    ``cond`` receives the threshold params dict.
    """

    code: int
    name: str
    contextual: bool
    cond: Callable[[dict], Column]
    details: tuple[tuple[str, Callable[[], Column]], ...]
    sql_cond: str
    sql_details: tuple[tuple[str, str], ...]


def _gap() -> Column:
    return (
        F.floor(F.unix_timestamp("ts")) - F.floor(F.unix_timestamp("_prev_ts"))
    ).cast("long")


def _prev_gap() -> Column:
    return (
        F.floor(F.unix_timestamp("_prev_ts")) - F.floor(F.unix_timestamp("_prev2_ts"))
    ).cast("long")


def _s(name: str) -> Callable[[], Column]:
    return lambda: F.col(name).cast("string")


_ROLE = ("role", lambda: F.col("role"))
_NTOK = ("n_tokens", _s("_ntok"))
_TURN_IDX = ("turn_idx", _s("turn_idx"))
_TOOL = ("tool", lambda: F.coalesce(F.col("tool"), F.lit("")))
_GAP = ("gap_sec", lambda: _gap().cast("string"))

_SQL_ROLE = ("role", "role")
_SQL_NTOK = ("n_tokens", "CAST(ntok AS VARCHAR)")
_SQL_TURN_IDX = ("turn_idx", "CAST(turn_idx AS VARCHAR)")
_SQL_TOOL = ("tool", "coalesce(tool, '')")
# DuckDB floor(epoch()) is DOUBLE — go through BIGINT so the string matches
# Spark's long formatting ("50102", not "50102.0")
_SQL_GAP = ("gap_sec", "CAST(CAST(gap_sec AS BIGINT) AS VARCHAR)")


EFFECT_RULES: list[EffectRule] = [
    # -- row-local (0-11) ----------------------------------------------------
    EffectRule(
        0, "turn_added", False,
        lambda p: F.lit(True),
        (_ROLE, _NTOK),
        "TRUE", (_SQL_ROLE, _SQL_NTOK),
    ),
    EffectRule(
        1, "tool_invoked", False,
        lambda p: F.col("role") == "tool",
        (_TOOL,),
        "role = 'tool'", (_SQL_TOOL,),
    ),
    EffectRule(
        2, "empty_text", False,
        lambda p: F.col("_s") == "",
        (_ROLE,),
        "coalesce(text, '') = ''", (_SQL_ROLE,),
    ),
    EffectRule(
        3, "long_turn", False,
        lambda p: F.col("_ntok") > p["long_turn_tokens"],
        (_NTOK,),
        f"ntok > {LONG_TURN_TOKENS}", (_SQL_NTOK,),
    ),
    EffectRule(
        4, "conversation_opened", False,
        lambda p: F.col("turn_idx") == 0,
        (_ROLE,),
        "turn_idx = 0", (_SQL_ROLE,),
    ),
    EffectRule(
        5, "unicode_text", False,
        lambda p: F.col("_mb"),
        (_ROLE,),
        "is_mb", (_SQL_ROLE,),
    ),
    EffectRule(
        6, "short_turn", False,
        lambda p: (F.col("_ntok") >= 1) & (F.col("_ntok") <= 3),
        (_NTOK,),
        "ntok BETWEEN 1 AND 3", (_SQL_NTOK,),
    ),
    EffectRule(
        7, "mixed_script", False,
        lambda p: F.col("_mb") & F.col("_ascii_letter"),
        (_ROLE,),
        "is_mb AND regexp_matches(coalesce(text, ''), '[A-Za-z]')", (_SQL_ROLE,),
    ),
    EffectRule(
        8, "long_chars", False,
        lambda p: F.col("_nchar") > 150,
        (("n_chars", _s("_nchar")),),
        "length(coalesce(text, '')) > 150",
        (("n_chars", "CAST(length(coalesce(text, '')) AS VARCHAR)"),),
    ),
    EffectRule(
        9, "repeat_heavy", False,
        lambda p: (F.col("_ntok") >= 4) & (F.col("_ndistinct") * 2 < F.col("_ntok")),
        (_NTOK,),
        "ntok >= 4 AND len(list_distinct(toks)) * 2 < ntok", (_SQL_NTOK,),
    ),
    EffectRule(
        10, "single_token", False,
        lambda p: F.col("_ntok") == 1,
        (_NTOK,),
        "ntok = 1", (_SQL_NTOK,),
    ),
    EffectRule(
        11, "emoji_text", False,
        lambda p: F.col("_emoji"),
        (_ROLE,),
        "contains(coalesce(text, ''), '🙂')", (_SQL_ROLE,),
    ),
    # -- lag-context over the conv_id window (12-24) -------------------------
    EffectRule(
        12, "first_assistant", True,
        lambda p: (F.col("role") == "assistant") & (F.col("_n_prior_assistant") == 0),
        (_TURN_IDX,),
        "role = 'assistant' AND n_prior_assistant = 0", (_SQL_TURN_IDX,),
    ),
    EffectRule(
        13, "first_tool_use", True,
        lambda p: (F.col("role") == "tool") & (F.col("_n_prior_tool") == 0),
        (_TOOL,),
        "role = 'tool' AND n_prior_tool = 0", (_SQL_TOOL,),
    ),
    EffectRule(
        14, "long_silence", True,
        lambda p: F.col("_prev_ts").isNotNull() & (_gap() > p["silence_sec"]),
        (_GAP,),
        f"prev_ts IS NOT NULL AND gap_sec > {SILENCE_SEC}", (_SQL_GAP,),
    ),
    EffectRule(
        15, "session_resumed", True,
        lambda p: F.col("_prev_ts").isNotNull() & (_gap() > p["resume_sec"]),
        (_GAP,),
        f"prev_ts IS NOT NULL AND gap_sec > {RESUME_SEC}", (_SQL_GAP,),
    ),
    EffectRule(
        16, "turn_burst", True,
        lambda p: F.col("_prev_ts").isNotNull() & (_gap() <= p["burst_sec"]),
        (_GAP,),
        f"prev_ts IS NOT NULL AND gap_sec <= {BURST_SEC}", (_SQL_GAP,),
    ),
    EffectRule(
        17, "tool_changed", True,
        lambda p: (F.col("role") == "tool")
        & F.col("_prev_tool").isNotNull()
        & (F.col("_prev_tool") != F.coalesce(F.col("tool"), F.lit(""))),
        (("from", lambda: F.col("_prev_tool")), ("to", _TOOL[1])),
        "role = 'tool' AND prev_tool IS NOT NULL AND prev_tool <> coalesce(tool, '')",
        (("from", "prev_tool"), ("to", "coalesce(tool, '')")),
    ),
    EffectRule(
        18, "repeated_speaker", True,
        lambda p: F.col("_prev_ts").isNotNull() & (F.col("_prev_role") == F.col("role")),
        (_ROLE,),
        "prev_ts IS NOT NULL AND prev_role = role", (_SQL_ROLE,),
    ),
    EffectRule(
        19, "assistant_after_tool", True,
        lambda p: (F.col("role") == "assistant") & (F.col("_prev_role") == "tool"),
        (_ROLE,),
        "role = 'assistant' AND prev_role = 'tool'", (_SQL_ROLE,),
    ),
    EffectRule(
        20, "conversation_closed", True,
        lambda p: F.col("turn_idx") == F.col("_max_turn_idx"),
        (_TURN_IDX,),
        "turn_idx = max_turn_idx", (_SQL_TURN_IDX,),
    ),
    EffectRule(
        21, "speaker_changed", True,
        lambda p: F.col("_prev_ts").isNotNull() & (F.col("_prev_role") != F.col("role")),
        (("from", lambda: F.col("_prev_role")), ("to", lambda: F.col("role"))),
        "prev_ts IS NOT NULL AND prev_role <> role",
        (("from", "prev_role"), ("to", "role")),
    ),
    EffectRule(
        22, "first_user", True,
        lambda p: (F.col("role") == "user") & (F.col("_n_prior_user") == 0),
        (_TURN_IDX,),
        "role = 'user' AND n_prior_user = 0", (_SQL_TURN_IDX,),
    ),
    EffectRule(
        23, "conv_midpoint", True,
        lambda p: F.col("turn_idx") * 2 == F.col("_max_turn_idx"),
        (_TURN_IDX,),
        "turn_idx * 2 = max_turn_idx", (_SQL_TURN_IDX,),
    ),
    EffectRule(
        24, "second_half", True,
        lambda p: F.col("turn_idx") * 2 > F.col("_max_turn_idx"),
        (_TURN_IDX,),
        "turn_idx * 2 > max_turn_idx", (_SQL_TURN_IDX,),
    ),
    # -- state-diff shapes (25-33): balance-delta / running-balance /
    # flag-transition / group-closure emitter flavors -------------------------
    EffectRule(
        25, "turn_grew", True,
        lambda p: (F.col("_prev_ntok") > 0) & (F.col("_ntok") > F.col("_prev_ntok") * 2),
        (("from", _s("_prev_ntok")), ("to", _s("_ntok"))),
        "prev_ntok > 0 AND ntok > prev_ntok * 2",
        (("from", "CAST(prev_ntok AS VARCHAR)"), ("to", "CAST(ntok AS VARCHAR)")),
    ),
    EffectRule(
        26, "turn_shrank", True,
        lambda p: (F.col("_prev_ntok") > 0) & (F.col("_ntok") * 2 < F.col("_prev_ntok")),
        (("from", _s("_prev_ntok")), ("to", _s("_ntok"))),
        "prev_ntok > 0 AND ntok * 2 < prev_ntok",
        (("from", "CAST(prev_ntok AS VARCHAR)"), ("to", "CAST(ntok AS VARCHAR)")),
    ),
    EffectRule(
        27, "text_resumed", True,
        lambda p: F.col("_prev_ts").isNotNull()
        & (F.col("_prev_ntok") == 0)
        & (F.col("_ntok") > 0),
        (_TURN_IDX,),
        "prev_ts IS NOT NULL AND prev_ntok = 0 AND ntok > 0", (_SQL_TURN_IDX,),
    ),
    EffectRule(
        28, "token_milestone", True,
        lambda p: F.floor(F.col("_cum_tok") / p["milestone_tokens"])
        > F.floor((F.col("_cum_tok") - F.col("_ntok")) / p["milestone_tokens"]),
        (("cum_tokens", _s("_cum_tok")),),
        f"floor(cum_tok / {MILESTONE_TOKENS}) > floor((cum_tok - ntok) / {MILESTONE_TOKENS})",
        (("cum_tokens", "CAST(cum_tok AS VARCHAR)"),),
    ),
    EffectRule(
        29, "first_long_turn", True,
        lambda p: (F.col("_ntok") > p["long_turn_tokens"]) & (F.col("_n_prior_long") == 0),
        (_NTOK,),
        f"ntok > {LONG_TURN_TOKENS} AND n_prior_long = 0", (_SQL_NTOK,),
    ),
    EffectRule(
        30, "gap_doubled", True,
        lambda p: F.col("_prev2_ts").isNotNull()
        & (_prev_gap() >= 1)
        & (_gap() > _prev_gap() * 2),
        (_GAP,),
        "prev2_ts IS NOT NULL AND prev_gap >= 1 AND gap_sec > prev_gap * 2",
        (_SQL_GAP,),
    ),
    EffectRule(
        31, "role_cycle", True,
        lambda p: F.col("_prev2_ts").isNotNull()
        & (F.col("_prev2_role") == F.col("role"))
        & (F.col("_prev_role") != F.col("role")),
        (_ROLE,),
        "prev2_ts IS NOT NULL AND prev2_role = role AND prev_role <> role",
        (_SQL_ROLE,),
    ),
    EffectRule(
        32, "last_user_turn", True,
        lambda p: (F.col("role") == "user") & (F.col("turn_idx") == F.col("_max_user_idx")),
        (_TURN_IDX,),
        "role = 'user' AND turn_idx = max_user_idx", (_SQL_TURN_IDX,),
    ),
    EffectRule(
        33, "last_assistant_turn", True,
        lambda p: (F.col("role") == "assistant")
        & (F.col("turn_idx") == F.col("_max_assistant_idx")),
        (_TURN_IDX,),
        "role = 'assistant' AND turn_idx = max_assistant_idx", (_SQL_TURN_IDX,),
    ),
    # -- per-(conv_id, tool) window (34-37): the J3 within-group prior-op
    # lookback (signer add/remove + sponsorship-chain emitter shape) ----------
    EffectRule(
        34, "tool_first_of_kind", True,
        lambda p: (F.col("role") == "tool")
        & F.col("tool").isNotNull()
        & F.col("_tool_prev_idx").isNull(),
        (_TOOL,),
        "role = 'tool' AND tool IS NOT NULL AND tool_prev_idx IS NULL", (_SQL_TOOL,),
    ),
    EffectRule(
        35, "tool_last_of_kind", True,
        lambda p: (F.col("role") == "tool")
        & F.col("tool").isNotNull()
        & F.col("_tool_next_idx").isNull(),
        (_TOOL, ("n_uses", _s("_tool_n_uses"))),
        "role = 'tool' AND tool IS NOT NULL AND tool_next_idx IS NULL",
        (_SQL_TOOL, ("n_uses", "CAST(tool_n_uses AS VARCHAR)")),
    ),
    EffectRule(
        36, "tool_args_changed", True,
        lambda p: (F.col("role") == "tool")
        & F.col("_tool_prev_text").isNotNull()
        & (F.col("_tool_prev_text") != F.col("_s")),
        (_TOOL,),
        "role = 'tool' AND tool_prev_text IS NOT NULL AND tool_prev_text <> coalesce(text, '')",
        (_SQL_TOOL,),
    ),
    EffectRule(
        37, "tool_args_repeated", True,
        lambda p: (F.col("role") == "tool")
        & F.col("_tool_prev_text").isNotNull()
        & (F.col("_tool_prev_text") == F.col("_s")),
        (_TOOL,),
        "role = 'tool' AND tool_prev_text IS NOT NULL AND tool_prev_text = coalesce(text, '')",
        (_SQL_TOOL,),
    ),
    EffectRule(
        38, "tool_burst", True,
        lambda p: (F.col("role") == "tool")
        & (F.col("_prev_role") == "tool")
        & (_gap() <= p["burst_sec"]),
        (_GAP,),
        f"role = 'tool' AND prev_role = 'tool' AND gap_sec <= {BURST_SEC}",
        (_SQL_GAP,),
    ),
    EffectRule(
        39, "half_tokens_reached", True,
        lambda p: (F.col("_tot_tok") > 0)
        & (F.col("_cum_tok") * 2 >= F.col("_tot_tok"))
        & ((F.col("_cum_tok") - F.col("_ntok")) * 2 < F.col("_tot_tok")),
        (("cum_tokens", _s("_cum_tok")),),
        "tot_tok > 0 AND cum_tok * 2 >= tot_tok AND (cum_tok - ntok) * 2 < tot_tok",
        (("cum_tokens", "CAST(cum_tok AS VARCHAR)"),),
    ),
    # -- sponsorship-chain triple x2 entity kinds (40-45): the reference's
    # sponsorship created/updated/removed per-entity emitters
    # (schema.go:377-486 enum tail, effects.go:~900-1100). Entity kind 1:
    # each TOOL KIND, sponsored by the most recent prior user turn (the
    # requester). Entity kind 2: the CONVERSATION, sponsored by the most
    # recent system directive. ------------------------------------------------
    EffectRule(
        40, "tool_sponsor_established", True,
        lambda p: (F.col("role") == "tool")
        & F.col("tool").isNotNull()
        & F.col("_tool_prev_idx").isNull()
        & F.col("_sponsor_idx").isNotNull(),
        (_TOOL, ("sponsor", _s("_sponsor_idx"))),
        "role = 'tool' AND tool IS NOT NULL AND tool_prev_idx IS NULL AND sponsor_idx IS NOT NULL",
        (_SQL_TOOL, ("sponsor", "CAST(sponsor_idx AS VARCHAR)")),
    ),
    EffectRule(
        # tool IS NOT NULL like 40/42: a NULL-tool row would share the
        # (conv_id, tool=NULL) window with non-tool rows and read garbage
        # lag context from them
        41, "tool_sponsor_updated", True,
        lambda p: (F.col("role") == "tool")
        & F.col("tool").isNotNull()
        & F.col("_tool_prev_sponsor").isNotNull()
        & F.col("_sponsor_idx").isNotNull()
        & (F.col("_tool_prev_sponsor") != F.col("_sponsor_idx")),
        (_TOOL, ("from", _s("_tool_prev_sponsor")), ("to", _s("_sponsor_idx"))),
        "role = 'tool' AND tool IS NOT NULL AND tool_prev_sponsor IS NOT NULL "
        "AND sponsor_idx IS NOT NULL AND tool_prev_sponsor <> sponsor_idx",
        (
            _SQL_TOOL,
            ("from", "CAST(tool_prev_sponsor AS VARCHAR)"),
            ("to", "CAST(sponsor_idx AS VARCHAR)"),
        ),
    ),
    EffectRule(
        42, "tool_sponsor_revoked", True,
        lambda p: (F.col("role") == "tool")
        & F.col("tool").isNotNull()
        & F.col("_tool_next_idx").isNull()
        & (F.col("turn_idx") < F.col("_max_turn_idx"))
        & F.col("_sponsor_idx").isNotNull(),
        (_TOOL, ("sponsor", _s("_sponsor_idx"))),
        "role = 'tool' AND tool IS NOT NULL AND tool_next_idx IS NULL "
        "AND turn_idx < max_turn_idx AND sponsor_idx IS NOT NULL",
        (_SQL_TOOL, ("sponsor", "CAST(sponsor_idx AS VARCHAR)")),
    ),
    EffectRule(
        # "a prior system turn exists" ⟺ prev_system_idx IS NOT NULL — one
        # window signal serves both transitions (no separate prior-count)
        43, "conv_sponsor_established", True,
        lambda p: (F.col("role") == "system") & F.col("_prev_system_idx").isNull(),
        (_TURN_IDX,),
        "role = 'system' AND prev_system_idx IS NULL", (_SQL_TURN_IDX,),
    ),
    EffectRule(
        44, "conv_sponsor_updated", True,
        lambda p: (F.col("role") == "system") & F.col("_prev_system_idx").isNotNull(),
        (("from", _s("_prev_system_idx")), ("to", _s("turn_idx"))),
        "role = 'system' AND prev_system_idx IS NOT NULL",
        (("from", "CAST(prev_system_idx AS VARCHAR)"), ("to", "CAST(turn_idx AS VARCHAR)")),
    ),
    EffectRule(
        45, "conv_sponsor_revoked", True,
        lambda p: (F.col("turn_idx") == F.col("_max_turn_idx"))
        & F.col("_prev_system_idx").isNotNull()
        & (F.col("role") != "system"),
        (("sponsor", _s("_prev_system_idx")),),
        "turn_idx = max_turn_idx AND prev_system_idx IS NOT NULL AND role <> 'system'",
        (("sponsor", "CAST(prev_system_idx AS VARCHAR)"),),
    ),
]

EFFECT_TYPES = {r.code: r.name for r in EFFECT_RULES}

# every details key across the table, in first-appearance order — the
# `effects_details` oracle projects one typed column per key
DETAIL_KEYS: list[str] = []
for _r in EFFECT_RULES:
    for _k, _ in _r.details:
        if _k not in DETAIL_KEYS:
            DETAIL_KEYS.append(_k)


def _default_params(**overrides) -> dict:
    p = {
        "long_turn_tokens": LONG_TURN_TOKENS,
        "silence_sec": SILENCE_SEC,
        "resume_sec": RESUME_SEC,
        "burst_sec": BURST_SEC,
        "milestone_tokens": MILESTONE_TOKENS,
    }
    p.update({k: v for k, v in overrides.items() if v is not None})
    return p


def _emitter(rule: EffectRule, params: dict) -> Column:
    details = F.create_map(
        *[c for key, build in rule.details for c in (F.lit(key), build())]
    )
    return F.when(
        rule.cond(params),
        F.struct(
            F.lit(rule.code).alias("effect_type"),
            F.lit(rule.name).alias("effect_type_string"),
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
    df: DataFrame, long_turn_tokens: int = LONG_TURN_TOKENS, conv_seq: Column | None = None
) -> DataFrame:
    """Fan transcripts out into the EFFECTS output schema — the row-local
    half of the rule table (codes 0-11): a narrow transform, no shuffle."""
    seq = conv_seq if conv_seq is not None else toid_mod.conv_seq("conv_id")
    params = _default_params(long_turn_tokens=long_turn_tokens)
    # Failed turns emit nothing (effects.go:55-57) — filter BEFORE the explode
    # so the excluded rows never materialize.
    emitters = [_emitter(r, params) for r in EFFECT_RULES if not r.contextual]
    return _explode_emitters(
        _prepare_row_signals(df.where(is_successful(F.col("text")))),
        emitters,
        seq,
    )


def extract_effects_contextual(
    df: DataFrame,
    long_turn_tokens: int = LONG_TURN_TOKENS,
    silence_sec: int = SILENCE_SEC,
    resume_sec: int = RESUME_SEC,
    burst_sec: int = BURST_SEC,
    conv_seq: Column | None = None,
) -> DataFrame:
    """The full emitter table (codes 0-45): row-local rules plus
    per-conversation lag/state-diff rules plus per-(conv_id, tool) group
    rules, over successful turns ordered by turn_idx.

    Two window passes supply all context, but only ONE Exchange: the conv_id
    window shuffles; the (conv_id, tool) window above it is satisfied by the
    existing hash(conv_id) clustering and only adds a local sort (pinned in
    tests/test_plans.py). The explode itself stays narrow."""
    seq = conv_seq if conv_seq is not None else toid_mod.conv_seq("conv_id")
    params = _default_params(
        long_turn_tokens=long_turn_tokens,
        silence_sec=silence_sec,
        resume_sec=resume_sec,
        burst_sec=burst_sec,
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    w_prior = w.rowsBetween(Window.unboundedPreceding, -1)
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
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
        # state-diff signals (25-33)
        F.lag("_ntok").over(w).alias("_prev_ntok"),
        F.sum("_ntok").over(w_cum).alias("_cum_tok"),
        F.count(F.when(F.col("_ntok") > params["long_turn_tokens"], 1))
        .over(w_prior)
        .alias("_n_prior_long"),
        F.lag("ts", 2).over(w).alias("_prev2_ts"),
        F.lag("role", 2).over(w).alias("_prev2_role"),
        F.max(F.when(F.col("role") == "user", F.col("turn_idx"))).over(w_all).alias("_max_user_idx"),
        F.max(F.when(F.col("role") == "assistant", F.col("turn_idx")))
        .over(w_all)
        .alias("_max_assistant_idx"),
        F.sum("_ntok").over(w_all).alias("_tot_tok"),
        # sponsorship signals (40-45): prior-user requester, prior-system
        # directive — same conv_id window, no extra Exchange
        F.max(F.when(F.col("role") == "user", F.col("turn_idx")))
        .over(w_prior)
        .alias("_sponsor_idx"),
        F.max(F.when(F.col("role") == "system", F.col("turn_idx")))
        .over(w_prior)
        .alias("_prev_system_idx"),
    )
    # per-(conv_id, tool) group signals (34-37) — planned ABOVE the conv_id
    # window so hash(conv_id) already satisfies the clustered distribution
    # (subset rule): local sort only, no second Exchange
    wt = Window.partitionBy("conv_id", "tool").orderBy("turn_idx")
    wt_all = wt.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base = base.select(
        "*",
        F.lag("turn_idx").over(wt).alias("_tool_prev_idx"),
        F.lead("turn_idx").over(wt).alias("_tool_next_idx"),
        F.lag("_s").over(wt).alias("_tool_prev_text"),
        F.count(F.lit(1)).over(wt_all).alias("_tool_n_uses"),
        F.lag("_sponsor_idx").over(wt).alias("_tool_prev_sponsor"),
    )
    emitters = [_emitter(r, params) for r in EFFECT_RULES]
    return _explode_emitters(base, emitters, seq)
