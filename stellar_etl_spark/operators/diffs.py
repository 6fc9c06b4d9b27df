"""T9: pre/post state diff — the TransformSigners analog
(``internal/transform/account_signer.go:14-96``): the reference compares an
account's pre- and post-change signer maps and emits one row per signer,
including explicit deletion rows for signers present before and absent after
(``account_signer.go:57-87``), deterministically sorted
(``account_signer.go:89-94``).

Our analog: per (conversation, tumbling window), the set of tools used. The
operator diffs each window's tool set against the conversation's previous
window and emits (added | removed | retained) rows — the same pre/post
field-diff shape, built from ``collect_set`` + one ``lag`` window pass +
``explode`` (two shuffles total: the window agg and the lag re-sort share the
conv_id partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def extract_tool_diffs(df: DataFrame, window: str = "5 minutes") -> DataFrame:
    """One row per (conv, window, tool, change) with change ∈
    {added, removed, retained}; deletion rows mirror account_signer.go:57-87."""
    per_win = (
        df.groupBy(F.window("ts", window).alias("win"), F.col("conv_id"))
        .agg(F.sort_array(F.collect_set("tool")).alias("tools"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "conv_id",
            "tools",
        )
    )
    w = Window.partitionBy("conv_id").orderBy("window_start")
    with_prev = per_win.withColumn(
        "prev_tools", F.coalesce(F.lag("tools").over(w), F.array().cast("array<string>"))
    )
    changes = with_prev.select(
        "conv_id",
        "window_start",
        "window_end",
        F.explode(
            F.concat(
                F.transform(
                    F.array_except("tools", "prev_tools"),
                    lambda t: F.struct(t.alias("tool"), F.lit("added").alias("change")),
                ),
                F.transform(
                    F.array_except("prev_tools", "tools"),
                    lambda t: F.struct(t.alias("tool"), F.lit("removed").alias("change")),
                ),
                F.transform(
                    F.array_intersect("tools", "prev_tools"),
                    lambda t: F.struct(t.alias("tool"), F.lit("retained").alias("change")),
                ),
            )
        ).alias("c"),
    )
    # no trailing orderBy: a global sort is a full extra shuffle at scale and
    # row order is not part of the operator's contract
    return changes.select(
        "conv_id",
        "window_start",
        "window_end",
        F.col("c.tool").alias("tool"),
        F.col("c.change").alias("change"),
    )
