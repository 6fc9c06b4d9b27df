"""Local replica of the driver's Spark-vs-DuckDB correctness comparison:
run each registry query in Spark and its oracle SQL in DuckDB over the same
parquet dir, sort columns by name and rows by value, compare cell-by-cell."""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return float(v)
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    return v


def _normalize(rows: list[dict]) -> list[tuple]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    out = [tuple(_norm_cell(r[c]) for c in cols) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    spark_rows = [r.asDict() for r in spark_df.collect()]
    rel = con.execute(sql)
    cols = [d[0] for d in rel.description]
    duck_rows = [dict(zip(cols, row)) for row in rel.fetchall()]

    result = {
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "rows_match": len(spark_rows) == len(duck_rows),
        "spark_cols": sorted(spark_rows[0].keys()) if spark_rows else [],
        "duck_cols": sorted(cols),
        "values_match": None,
        "first_diff": None,
    }
    if spark_rows and sorted(spark_rows[0].keys()) != sorted(cols):
        result["values_match"] = False
        result["first_diff"] = f"column sets differ: {result['spark_cols']} vs {result['duck_cols']}"
        return result
    a, b = _normalize(spark_rows), _normalize(duck_rows)
    result["values_match"] = a == b
    if not result["values_match"]:
        for i, (x, y) in enumerate(zip(a, b)):
            if x != y:
                result["first_diff"] = f"row {i}: spark={x!r} duck={y!r}"
                break
        else:
            result["first_diff"] = f"length mismatch {len(a)} vs {len(b)}; tail a={a[len(b):][:1]} b={b[len(a):][:1]}"
    return result
