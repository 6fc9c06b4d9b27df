"""T4: sub-turn unit extraction — the TransformOperation analog
(``internal/transform/operation.go:30-101`` + the 27-way details switch at
``operation.go:584-1184``).

A turn explodes into ordered sub-turn units (the reference's tx → operations):

- ``tool`` turns produce one ``tool_call`` unit carrying the tool name and an
  args fingerprint in its details map;
- all other roles produce one ``span`` unit per ``span_tokens`` whitespace
  tokens (an empty text still yields one empty unit, matching the reference's
  ≥1-op-per-tx shape).

The explode is pure Column work: ``sequence`` + ``posexplode`` + ``slice`` —
no Python, no shuffle (narrow transform), codegen throughout.

**One arm table, two engines** (same pattern as operators/effects.py): every
branch of the per-type details switch is a :class:`UnitArm` carrying BOTH the
Spark Column builders and the DuckDB SQL fragments; the registry generates
the ``units_details`` oracle columns from this table, so an added arm is
automatically hash-checked with zero SQL drift risk. Arm families mirror the
reference's 27-way switch: per-tool-kind arms (the payment/offer/invoke
op-type arms), per-emitting-role span arms (source-account-kind arms), and
payload-shape arms (asset/value-type sub-switches).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import NamedTuple

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from stellar_etl_spark import toid as toid_mod
from stellar_etl_spark.functions import text as textfn
from stellar_etl_spark.functions.scalars import sha256_hex

UNIT_TYPE_CODES = {"span": 0, "tool_call": 1}


class UnitArm(NamedTuple):
    """One branch of the details switch, expressed for both engines.

    ``unit`` scopes the arm to tool_call or span units; ``spark_cond`` /
    ``sql_cond`` add the arm-specific condition (None = whole unit type —
    conditions within a family must be mutually exclusive, mirroring the
    reference's switch). ``spark_val`` maps the payload Column to the string
    value; ``sql_val`` is the DuckDB expression over the oracle CTE's
    ``payload``/``tool``/``role`` columns.
    """

    key: str
    unit: str  # "tool" | "span"
    spark_cond: Callable[[], Column] | None
    spark_val: Callable[[Column], Column]
    sql_cond: str | None
    sql_val: str


def _tool_is(name: str) -> Callable[[], Column]:
    return lambda: F.col("tool") == name


_SQL_NTOK_PAYLOAD = (
    "CAST(CASE WHEN trim(payload) = '' THEN 0 "
    "ELSE len(regexp_split_to_array(trim(payload), '\\s+')) END AS VARCHAR)"
)

# shape arms are an exclusive chain (like a switch): each condition excludes
# the earlier shapes explicitly so both engines agree on first-match-wins
_IS_JSON = "starts_with(payload, '{')"
_IS_DIGITS = f"NOT {_IS_JSON} AND regexp_matches(payload, '^[0-9 ]+$')"
_HAS_URL = f"NOT {_IS_JSON} AND NOT regexp_matches(payload, '^[0-9 ]+$') AND contains(payload, 'http')"


UNIT_ARMS: list[UnitArm] = [
    # -- tool_call base map --------------------------------------------------
    UnitArm(
        "tool", "tool", None,
        lambda p: F.coalesce(F.col("tool"), F.lit("")),
        None, "coalesce(tool, '')",
    ),
    UnitArm(
        "args_sha256", "tool", None,
        lambda p: sha256_hex(p),
        None, "sha256(payload)",
    ),
    UnitArm(
        "failed", "tool", None,
        lambda p: F.coalesce(F.startswith(p, F.lit("error:")), F.lit(False)).cast("string"),
        None, "CAST(starts_with(payload, 'error:') AS VARCHAR)",
    ),
    # -- per-tool-kind arms (generator vocabulary + driver vocabulary) -------
    UnitArm(
        "n_terms", "tool", _tool_is("search"),
        lambda p: textfn.token_count(p).cast("string"),
        "tool = 'search'", _SQL_NTOK_PAYLOAD,
    ),
    UnitArm(
        "n_lines", "tool", _tool_is("code"),
        lambda p: F.size(F.split(p, "\n")).cast("string"),
        "tool = 'code'", "CAST(len(string_split(payload, chr(10))) AS VARCHAR)",
    ),
    UnitArm(
        "n_digits", "tool", _tool_is("calc"),
        lambda p: F.length(F.regexp_replace(p, "[^0-9]", "")).cast("string"),
        "tool = 'calc'",
        "CAST(length(regexp_replace(payload, '[^0-9]', '', 'g')) AS VARCHAR)",
    ),
    UnitArm(
        # byte size is the fetch-payload signal (differs from n_chars on
        # multibyte text)
        "payload_bytes", "tool", _tool_is("fetch"),
        lambda p: F.octet_length(p).cast("string"),
        "tool = 'fetch'", "CAST(strlen(payload) AS VARCHAR)",
    ),
    UnitArm(
        "n_unique_tokens", "tool", _tool_is("browse"),
        lambda p: F.size(F.array_distinct(textfn.tokens(p))).cast("string"),
        "tool = 'browse'",
        "CAST(CASE WHEN trim(payload) = '' THEN 0 "
        "ELSE len(list_distinct(regexp_split_to_array(trim(payload), '\\s+'))) END AS VARCHAR)",
    ),
    UnitArm(
        # transaction-ish driver vocabulary: purchase args carry a number
        "k_value", "tool", _tool_is("purchase"),
        lambda p: F.regexp_extract(p, "[0-9]+", 0),
        "tool = 'purchase'", "regexp_extract(payload, '[0-9]+', 0)",
    ),
    UnitArm(
        # error-channel tool: message length after the failure prefix
        "error_chars", "tool", _tool_is("error"),
        lambda p: F.length(F.regexp_replace(p, "^error: ", "")).cast("string"),
        "tool = 'error'",
        "CAST(length(regexp_replace(payload, '^error: ', '')) AS VARCHAR)",
    ),
    UnitArm(
        # any failed tool call: the error kind token after the prefix
        "error_kind", "tool",
        lambda: F.startswith(F.col("payload"), F.lit("error:")),
        lambda p: F.regexp_extract(p, "^error: *([a-z]+)", 1),
        "starts_with(payload, 'error:')",
        "coalesce(regexp_extract(payload, '^error: *([a-z]+)', 1), '')",
    ),
    # -- span base map -------------------------------------------------------
    UnitArm(
        # token_count, not raw split: F.split('') returns [''] (size 1)
        "span_tokens", "span", None,
        lambda p: textfn.token_count(p).cast("string"),
        None, _SQL_NTOK_PAYLOAD,
    ),
    UnitArm(
        "span_chars", "span", None,
        lambda p: F.length(p).cast("string"),
        None, "CAST(length(payload) AS VARCHAR)",
    ),
    UnitArm(
        "has_unicode", "span", None,
        lambda p: (F.octet_length(p) != F.length(p)).cast("string"),
        None, "CAST(strlen(payload) <> length(payload) AS VARCHAR)",
    ),
    UnitArm(
        "n_digits", "span", None,
        lambda p: F.length(F.regexp_replace(p, "[^0-9]", "")).cast("string"),
        None, "CAST(length(regexp_replace(payload, '[^0-9]', '', 'g')) AS VARCHAR)",
    ),
    # -- role-specific span arms ---------------------------------------------
    UnitArm(
        "is_question", "span", lambda: F.col("role") == "user",
        lambda p: p.contains("?").cast("string"),
        "role = 'user'", "CAST(contains(payload, '?') AS VARCHAR)",
    ),
    UnitArm(
        "n_sentences", "span", lambda: F.col("role") == "assistant",
        lambda p: F.size(F.split(p, "\\.")).cast("string"),
        "role = 'assistant'", "CAST(len(string_split(payload, '.')) AS VARCHAR)",
    ),
    UnitArm(
        "has_directive", "span", lambda: F.col("role") == "system",
        lambda p: p.contains(":").cast("string"),
        "role = 'system'", "CAST(contains(payload, ':') AS VARCHAR)",
    ),
    # -- payload-shape span arms (exclusive chain) ---------------------------
    UnitArm(
        "json_keys", "span",
        lambda: F.startswith(F.col("payload"), F.lit("{")),
        lambda p: ((F.length(p) - F.length(F.replace(p, F.lit('":'), F.lit("")))) / 2)
        .cast("int")
        .cast("string"),
        _IS_JSON,
        "CAST(CAST((length(payload) - length(replace(payload, '\":', ''))) / 2 AS INTEGER) AS VARCHAR)",
    ),
    UnitArm(
        "digits_only", "span",
        lambda: ~F.startswith(F.col("payload"), F.lit("{")) & F.col("payload").rlike("^[0-9 ]+$"),
        lambda p: F.lit("true"),
        _IS_DIGITS, "'true'",
    ),
    UnitArm(
        "n_urls", "span",
        lambda: ~F.startswith(F.col("payload"), F.lit("{"))
        & ~F.col("payload").rlike("^[0-9 ]+$")
        & F.col("payload").contains("http"),
        lambda p: ((F.length(p) - F.length(F.replace(p, F.lit("http"), F.lit("")))) / 4)
        .cast("int")
        .cast("string"),
        _HAS_URL,
        "CAST(CAST((length(payload) - length(replace(payload, 'http', ''))) / 4 AS INTEGER) AS VARCHAR)",
    ),
    # -- shape-independent span flag arms ------------------------------------
    UnitArm(
        "starts_upper", "span",
        lambda: F.col("payload").rlike("^[A-Z]"),
        lambda p: F.lit("true"),
        "regexp_matches(payload, '^[A-Z]')", "'true'",
    ),
]

# every details key in first-appearance order — the `units_details` oracle
# projects one typed column per key
DETAIL_KEYS: list[str] = []
for _a in UNIT_ARMS:
    if _a.key not in DETAIL_KEYS:
        DETAIL_KEYS.append(_a.key)


def _arm_entry(arm: UnitArm) -> Column:
    base = F.col("is_tool") if arm.unit == "tool" else ~F.col("is_tool")
    cond = base if arm.spark_cond is None else base & arm.spark_cond()
    p = F.col("payload")
    return F.when(cond, F.create_map(F.lit(arm.key), arm.spark_val(p))).otherwise(
        F.create_map().cast("map<string,string>")
    )


def extract_units(
    df: DataFrame, span_tokens: int = 8, conv_seq: Column | None = None
) -> DataFrame:
    """Explode transcripts into the UNITS output schema."""
    seq = conv_seq if conv_seq is not None else toid_mod.conv_seq("conv_id")
    toks = textfn.tokens(F.col("text"))
    is_tool = F.col("role") == "tool"

    n_units = F.when(is_tool, F.lit(1)).otherwise(
        F.greatest(F.ceil(F.size(toks) / F.lit(span_tokens)), F.lit(1)).cast("int")
    )

    base = df.select(
        "conv_id",
        "turn_idx",
        "role",
        "tool",
        "ts",
        seq.alias("conv_seq"),
        toks.alias("toks"),
        is_tool.alias("is_tool"),
        F.posexplode(F.sequence(F.lit(0), n_units - 1)).alias("unit_idx", "_unit_n"),
    )

    payload = F.when(
        F.col("is_tool"), F.array_join(F.col("toks"), " ")
    ).otherwise(
        F.array_join(
            F.slice(F.col("toks"), F.col("unit_idx") * span_tokens + 1, span_tokens), " "
        )
    )
    # materialize payload once; every arm reads the named column
    base = base.withColumn("payload", payload)

    unit_type = F.when(F.col("is_tool"), F.lit("tool_call")).otherwise(F.lit("span"))

    # The per-type details switch (operation.go:584-1184), generated from
    # UNIT_ARMS — map_concat of the arm entries (conditions within a family
    # are exclusive, so no key collides at runtime).
    details = F.map_concat(*[_arm_entry(a) for a in UNIT_ARMS])

    turn_id = toid_mod.toid(F.col("conv_seq"), "turn_idx")
    return base.select(
        toid_mod.toid(F.col("conv_seq"), "turn_idx", F.col("unit_idx")).alias("unit_id"),
        turn_id.alias("turn_id"),
        "conv_id",
        "turn_idx",
        F.col("unit_idx").cast("int").alias("unit_idx"),
        unit_type.alias("unit_type"),
        F.when(F.col("is_tool"), F.lit(1)).otherwise(F.lit(0)).cast("int").alias("unit_type_code"),
        F.col("payload"),
        details.alias("details"),
        "ts",
    )
