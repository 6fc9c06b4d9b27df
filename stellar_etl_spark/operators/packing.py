"""Sequence packing: assign documents to fixed token-budget bins — the
"pack documents into ~N-token training sequences / shards" step of a
training-data pipeline.

Semantics: documents are laid out on a single deterministic global token
axis (order: (bucket, md5-order-key, id)); a document belongs to the bin
containing its START offset, so every bin holds ~``target_tokens`` and the
boundary document straddles into the next bin (offset-chunked packing).
Strict greedy first-fit ("close the bin early when the next doc would
overflow") is a sequential recurrence no window/cumsum can express — the
offset-chunk relaxation is the distributed-scalable form and is what
byte/token-offset shard writers do in practice.

Scale shape — a distributed prefix sum, NO global single-task window:
phase 1 computes cumulative sums inside ``buckets`` hash buckets (a
partitioned window); phase 2 turns the ``buckets`` per-bucket totals into
exclusive prefix offsets (a window over exactly ``buckets`` rows — constant
work at any corpus size) and broadcast-joins them back. The md5-derived
order key doubles as the bucket source, is engine-portable (a DuckDB oracle
reproduces the exact bin assignment — tests/test_functions_misc.py), and
decorrelates bucket fill from ingest order so bucket totals stay balanced.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def sequence_pack_bins(
    df: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    target_tokens: int = 2048,
    buckets: int = 64,
    group_col: str | None = None,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id_col[, group_col], *carry_cols, token_col, token_offset, pack_bin):
    deterministic token-budget bin per document. ``token_offset`` is the
    document's exclusive start offset on the global token axis; ``pack_bin =
    token_offset DIV target_tokens``. With ``group_col`` (e.g. a train/val
    split label), the token axis restarts per group, so bins never mix
    groups — the prefix window is then over ``groups x buckets`` rows,
    still constant-size. ``carry_cols`` are per-document passthrough columns
    that ride the phase-1 bucket shuffle unchanged — callers that need them
    downstream (the corpus manifest) previously had to JOIN the packed
    output back to its own input, recomputing the entire upstream lineage a
    second time."""
    grp = [group_col] if group_col else []
    carry = [c for c in carry_cols]
    okey = F.md5(F.col(id_col).cast("string"))
    bucket = F.conv(F.substring(okey, 1, 4), 16, 10).cast("long") % buckets
    t = df.select(
        F.col(id_col),
        *grp,
        *carry,
        F.col(token_col).cast("long").alias(token_col),
        okey.alias("_okey"),
        bucket.alias("_bucket"),
    )
    w_local = (
        Window.partitionBy(*grp, "_bucket")
        .orderBy("_okey", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn("_lc", F.sum(token_col).over(w_local))
    totals = t.groupBy(*grp, "_bucket").agg(F.sum(token_col).alias("_btot"))
    # exclusive prefix over the bucket totals: a window over exactly
    # `groups x buckets` rows — constant-size work regardless of corpus size.
    w_prefix = (
        (Window.partitionBy(*grp) if grp else Window)
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = totals.select(
        *grp,
        "_bucket",
        F.coalesce(F.sum("_btot").over(w_prefix), F.lit(0)).alias("_boff"),
    )
    out = local.join(F.broadcast(prefixes), [*grp, "_bucket"])
    offset = F.col("_boff") + F.col("_lc") - F.col(token_col)
    # integer DIV, not floor(double /): double division diverges from the
    # oracle's integer `//` once a split's token axis exceeds 2^53
    return out.select(
        id_col,
        *grp,
        *carry,
        token_col,
        offset.alias("token_offset"),
    ).withColumn(
        "pack_bin", F.expr(f"token_offset DIV {int(target_tokens)}L")
    )
