"""§3.3: time → range utility — the ``get_ledger_range_from_times`` analog
(``cmd/get_ledger_range_from_times.go:27-95``,
``internal/input/ledger_range.go:18-113``).

The reference binary-searches close-times over a remote datastore with
memoized probes; with a columnar table the same answer is one aggregation —
min/max over the time-filtered scan, where parquet row-group stats / partition
pruning do the "binary search" for free. Clamping semantics preserved: the
requested window clamps to the available data range; an empty intersection
returns the closest boundary rows (the reference clamps rather than errors,
``ledger_range.go:72-81``).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def time_range(
    df: DataFrame,
    start: str | dt.datetime,
    end: str | dt.datetime,
    future_tolerance_sec: int | None = 10,
) -> DataFrame:
    """One-row DataFrame {start_ts, end_ts, start_turn_id, end_turn_id,
    n_turns} for turns with ``start <= ts <= end`` after clamping to the
    table's own [min_ts, max_ts] (ledger_range.go:72-81 semantics).

    Requests more than ``future_tolerance_sec`` past the latest available
    event fail loudly instead of silently clamping to stale data
    (ledger_range.go:96-113 checkTimesWithinDatastore, maxFutureTolerance):
    the returned plan raises on execution when violated. ``None`` disables
    the check (archive-scan mode). An inverted range raises immediately."""
    start_lit, end_lit = F.lit(start).cast("timestamp"), F.lit(end).cast("timestamp")
    as_dt = lambda v: dt.datetime.fromisoformat(v) if isinstance(v, str) else v  # noqa: E731
    if as_dt(start) > as_dt(end):
        raise ValueError(f"time_range: start {start!r} is after end {end!r}")
    bounds = df.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    if future_tolerance_sec is not None:
        cutoff = F.col("hi") + F.expr(f"INTERVAL {int(future_tolerance_sec)} SECONDS")
        guard = F.raise_error(
            F.format_string(
                "time_range request exceeds latest event by more than %d s",
                F.lit(int(future_tolerance_sec)),
            )
        )
        bounds = bounds.select(
            "lo",
            F.when((start_lit > cutoff) | (end_lit > cutoff), guard.cast("timestamp"))
            .otherwise(F.col("hi"))
            .alias("hi"),
        )
    # clamp BOTH ends into [lo, hi]: a request entirely outside the data
    # collapses to the nearest boundary instant (closest-boundary semantics,
    # ledger_range.go:72-81), never an empty all-null result
    start_c = F.least(F.greatest(start_lit, F.col("lo")), F.col("hi"))
    end_c = F.least(F.greatest(end_lit, F.col("lo")), F.col("hi"))
    clamped = bounds.select(start_c.alias("start_req"), end_c.alias("end_req"))

    filtered = df.join(F.broadcast(clamped)).where(
        F.col("ts").between(F.col("start_req"), F.col("end_req"))
    )
    from stellar_etl_spark import toid as toid_mod

    tid = toid_mod.toid(toid_mod.conv_seq("conv_id"), "turn_idx")
    return filtered.agg(
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
        F.min(tid).alias("start_turn_id"),
        F.max(tid).alias("end_turn_id"),
        F.count(F.lit(1)).alias("n_turns"),
    )
