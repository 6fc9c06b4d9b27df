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

from stellar_etl_spark.functions.dedup import _md5_half


def _unit_hash(id_col: Column, seed: str) -> Column:
    """Deterministic uniform [0, 1) draw per id: 32 bits of md5(seed || id).
    Engine-portable (md5 + hex → integer exists everywhere)."""
    h = F.concat(F.lit(seed), F.lit(":"), id_col.cast("string"))
    return _md5_half(h, 1) / F.lit(float(2**32))


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
    document between splits. A null id has no stable identity to hash —
    rather than silently lumping every null-id row into one split, the
    projection raises at runtime (fix the ids or filter first)."""
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
    expr = F.when(
        F.col(id_col).isNull(),
        F.raise_error(F.lit(f"hash_split: null {id_col} has no stable split")),
    ).otherwise(expr)
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

    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    # Human fractions (0.07) become their intended rational (7/100); tiny
    # rates fall through to a wider denominator instead of collapsing to 0
    # (Fraction(4e-7).limit_denominator(10**6) == 0 would silently keep
    # NOTHING). den <= 1e6 keeps n * num inside int64 up to n ~ 9e12 rows
    # per stratum; the 1e12 fallback covers 1-in-millions rates on small
    # numerators (num = round(fraction * den) stays tiny there).
    frac = Fraction(fraction).limit_denominator(10**6)
    if frac == 0:
        frac = Fraction(fraction).limit_denominator(10**12)
    if frac == 0:
        raise ValueError(f"fraction {fraction} below 1e-12 is not supported")
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
    # exact ceil(n * num / den) via int64 ceiling division — DIV, not the
    # Column `/` operator, which is a double Divide and re-introduces the
    # very rounding this rational form exists to avoid once n * num > 2^53
    keep_n = F.expr(
        f"(_n * {frac.numerator}L + {frac.denominator - 1}L)"
        f" DIV {frac.denominator}L"
    )
    keep = ranked.withColumn("_n", F.count(F.lit(1)).over(n)).where(
        F.col("_rnk") <= keep_n
    )
    return df.join(keep.select(id_col), id_col, "left_semi")
