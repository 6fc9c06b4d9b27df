"""Deterministic synthetic transcripts — the engine's input-table generator.

The reference tests against fixed ledger ranges of real network history; our
analog (FIXTURES.md §1) is a seeded, fully deterministic transcript stream.
Everything is **pure column arithmetic over ``spark.range``** — no driver-side
data, no Python UDFs — so the same generator produces 10^3 rows for unit tests
and a 10^9-turn bench sample by changing one argument, generated in parallel
across all executors.

Determinism contract (the golden invariant): every cell is a pure function of
``(seed, conv index, turn_idx)``; two runs — or a checkpoint replay — produce
byte-identical rows.

Skew + disorder knobs mirror the fixture spec:

- Zipf-ish conversation sizes with explicit hot conversations (the "hot
  ledger" analog — exercises AQE skew handling and salting);
- bounded event-time disorder (≤ ``disorder_sec``) to exercise watermarks;
- mid-conversation gaps > session gap in some conversations to exercise
  session-window splitting;
- optional duplicate (conv_id, turn_idx) deliveries for exactly-once dedup
  tests;
- deterministic ``error:`` payload prefix on ~1/13 of tool turns (the failed-tx
  analog, ``transform/effects.go:55-57`` skips failed txs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

# Small word vocabulary incl. unicode/multibyte entries (FIXTURES edge cases).
_VOCAB = [
    "alpha", "beta", "gamma", "delta", "query", "result", "token", "stream",
    "window", "state", "join", "merge", "shuffle", "spark", "ledger", "turn",
    "données", "模型", "ответ", "naïve", "東京", "🙂ok",
]
_TOOLS = ["search", "code", "fetch", "browse", "calc"]


def _h(*cols, seed: int) -> F.Column:
    """Stable non-negative 63-bit hash of the given columns + seed."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def transcripts_df(
    spark: SparkSession,
    n_convs: int = 100,
    seed: int = 42,
    mean_turns: int = 8,
    hot_convs: int = 1,
    hot_turns: int = 512,
    start: str = "2026-01-01 00:00:00",
    conv_spacing_sec: int = 37,
    turn_step_sec: int = 20,
    disorder_sec: int = 15,
    session_break_gap_sec: int = 3600,
    with_duplicates: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    """Build the transcripts table (schemas.TRANSCRIPTS) deterministically.

    Conversation ``i`` starts at ``start + i*conv_spacing_sec``; its turns are
    ``turn_step_sec`` apart with ±``disorder_sec`` jitter (bounded disorder —
    the watermark delay must exceed it for zero late drops). Conversations
    where ``hash % 5 == 0`` contain one intra-conversation gap of
    ``session_break_gap_sec`` (splits into two sessions).
    """
    convs = spark.range(0, n_convs, numPartitions=partitions)

    # Zipf-ish sizes: first `hot_convs` conversations get `hot_turns` turns,
    # the rest 1 + hash % (2*mean_turns) (mean ≈ mean_turns).
    size = F.when(F.col("id") < hot_convs, F.lit(hot_turns)).otherwise(
        (_h(F.col("id"), seed=seed) % (2 * mean_turns) + 1).cast("int")
    )
    convs = convs.select(
        F.col("id").alias("conv_n"),
        F.format_string("conv_%08d", F.col("id")).alias("conv_id"),
        size.alias("n_turns"),
    )

    # Explode to one row per turn — `sequence` + `explode` stays distributed.
    turns = convs.select(
        "conv_n",
        "conv_id",
        "n_turns",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )

    h_role = _h(F.col("conv_n"), F.col("turn_idx"), F.lit(1), seed=seed)
    h_text = _h(F.col("conv_n"), F.col("turn_idx"), F.lit(2), seed=seed)
    h_time = _h(F.col("conv_n"), F.col("turn_idx"), F.lit(3), seed=seed)
    h_gap = _h(F.col("conv_n"), F.lit(4), seed=seed)

    # Roles: turn 0 is `system` in 1/7 of conversations; otherwise alternate
    # user/assistant, with assistant slots becoming `tool` ~1/5 of the time
    # (user turns always precede their assistant/tool responses — the
    # stream-stream-join fixture requirement).
    sys_first = (_h(F.col("conv_n"), F.lit(5), seed=seed) % 7 == 0)
    parity = F.col("turn_idx") % 2
    role = (
        F.when((F.col("turn_idx") == 0) & sys_first, F.lit("system"))
        .when(parity == 0, F.lit("user"))
        .when(h_role % 5 == 0, F.lit("tool"))
        .otherwise(F.lit("assistant"))
    )

    turns = turns.withColumn("role", role)

    tool = F.when(
        F.col("role") == "tool",
        F.element_at(F.array(*[F.lit(t) for t in _TOOLS]), (h_role % len(_TOOLS) + 1).cast("int")),
    ).otherwise(F.lit(None).cast("string"))

    # Deterministic text: 1..40 vocabulary words chosen by per-(turn, word)
    # hash; ~1/97 turns empty; failed tool turns prefixed "error:".
    n_words = (h_text % 40 + 1).cast("int")
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda i: F.element_at(
            vocab,
            (F.abs(F.xxhash64(F.lit(seed), F.col("conv_n"), F.col("turn_idx"), i)) % len(_VOCAB) + 1).cast("int"),
        ),
    )
    body = F.array_join(words, " ")
    text = (
        F.when(h_text % 97 == 0, F.lit(""))
        .when((F.col("role") == "tool") & (h_text % 13 == 0), F.concat(F.lit("error: "), body))
        .otherwise(body)
    )

    # Event time: conversation start + per-turn step + bounded jitter + an
    # optional one-time session break in ~1/5 of conversations.
    jitter = (h_time % (2 * disorder_sec + 1)).cast("long") - disorder_sec
    has_break = (h_gap % 5 == 0) & (F.col("n_turns") >= 4)
    break_at = (h_gap % F.greatest(F.col("n_turns").cast("long"), F.lit(1)) + 1).cast("int")
    break_shift = F.when(
        has_break & (F.col("turn_idx") >= break_at), F.lit(session_break_gap_sec)
    ).otherwise(F.lit(0))
    offset_sec = (
        F.col("conv_n") * conv_spacing_sec
        + F.col("turn_idx").cast("long") * turn_step_sec
        + jitter
        + break_shift
    )
    ts = F.timestamp_seconds(F.unix_timestamp(F.lit(start)) + offset_sec)

    out = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role",
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )

    if with_duplicates:
        # ~1/20 of rows delivered twice (at-least-once input) — exactly-once
        # dedup must collapse them (FIXTURES §1 duplicate-delivery case).
        dupes = out.where(
            F.abs(F.xxhash64(F.lit(seed), F.col("conv_id"), F.col("turn_idx"), F.lit(6))) % 20 == 0
        )
        out = out.unionAll(dupes)

    return out


def write_transcripts(
    df: DataFrame,
    path: str,
    partition_by_day: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize the transcripts table.

    Production layout is an Iceberg table partitioned by ``days(ts)`` +
    ``bucket(N, conv_id)`` (SURVEY §7.0); locally (no Iceberg runtime jars in
    this sandbox) we keep the same *physical* idea with hive-style
    ``ts_date=`` directories so date predicates still prune at the scan.
    """
    writer = df.withColumn("ts_date", F.to_date("ts")).write.mode(mode)
    if partition_by_day:
        writer = writer.partitionBy("ts_date")
    writer.parquet(path)


def write_transcripts_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Bucketed physical layout (SURVEY §7.0 ``bucket(N, conv_id)``): every
    conversation lands in exactly one bucket, and the scan reports
    ``HashPartitioning(conv_id)`` — so every ``groupBy``/``join``/window keyed
    on ``conv_id`` over this table runs with ZERO shuffle (pinned in
    tests/test_plans.py). At 10^12 turns this removes the single biggest
    Exchange from the whole pipeline; on Iceberg the ``bucket(N, conv_id)``
    partition transform plays the same role. Registered as an external table
    at ``path`` (bucket metadata lives in the catalog; read back via
    ``read_batch(spark, "table:<name>")``)."""
    (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(buckets, "conv_id")
        .sortBy("conv_id", "turn_idx")
        .format("parquet")
        .saveAsTable(table)
    )


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Read back a materialized transcripts table (drops the partition col)."""
    df = spark.read.parquet(path)
    return df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
