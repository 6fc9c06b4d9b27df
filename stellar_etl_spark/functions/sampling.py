"""Deterministic sampling and dataset splitting for the training-data
pipeline layer: stable hash-based holdout splits and per-stratum
exact-fraction samples.

Both are pure functions of (seed, id) — re-running over a grown corpus never
reassigns an existing row (the property that keeps eval sets honest across
dataset versions), and every assignment is reproducible in any engine with
md5 (the tests recompute the exact membership in DuckDB).

Scale shape: ``hash_split`` is a narrow projection (no shuffle at all);
``stratified_sample`` shuffles once on the stratum key for its rank window —
the same single-Exchange shape as any per-group top-k. The md5 hash
decorrelates the split from ingest order, id ranges, and any data column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def _unit_hash(id_col: Column, seed: str) -> Column:
    """Deterministic uniform [0, 1) draw per id: 32 bits of md5(seed || id).
    Engine-portable (md5 + hex → integer exists everywhere)."""
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(float(2**32))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: str = "split-v1",
) -> DataFrame:
    """Append a ``split`` label ('train'/'val'/'test' by default) chosen by
    the id's deterministic unit hash against cumulative weight boundaries.

    Narrow projection — no shuffle, no sampling state; membership depends
    only on (seed, id), so adding documents later never moves an existing
    document between splits."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(weights.values())
    u = _unit_hash(F.col(id_col), seed)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        expr = (
            F.when(u < acc, F.lit(name))
            if expr is None
            else expr.when(u < acc, F.lit(name))
        )
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str = "doc_id",
    fraction: float = 0.1,
    seed: str = "sample-v1",
) -> DataFrame:
    """EXACT per-stratum fraction: keep the ceil(fraction * n) rows with the
    smallest deterministic unit hash inside each stratum.

    Unlike Bernoulli sampling (``df.sample``), the per-stratum count is
    exact, the chosen set is a stable function of (seed, ids present), and
    any engine can recompute it. One shuffle (rank window on the stratum
    key) — the id/hash ride it, payload columns follow the final semi-join
    only for the sampled rows.

    The count is computed in INTEGER arithmetic (fraction as a rational):
    ``ceil(n * fraction)`` in doubles turns 100 * 0.07 into
    7.000000000000001 and over-keeps a row."""
    from fractions import Fraction

    frac = Fraction(fraction).limit_denominator(10**6)
    u = _unit_hash(F.col(id_col), seed)
    ranked = df.select(
        F.col(stratum_col).alias("_stratum"), F.col(id_col), u.alias("_u")
    ).withColumn(
        "_rnk",
        F.row_number().over(
            Window.partitionBy("_stratum").orderBy("_u", id_col)
        ),
    )
    n = Window.partitionBy("_stratum")
    # exact ceil(n * num / den) via integer ceiling division
    keep_n = (F.col("_n") * frac.numerator + (frac.denominator - 1)) / frac.denominator
    keep = ranked.withColumn("_n", F.count(F.lit(1)).over(n)).where(
        F.col("_rnk") <= F.floor(keep_n)
    )
    return df.join(keep.select(id_col), id_col, "left_semi")
