#!/usr/bin/env python
"""Targeted per-query benchmark + plan capture (bench.py is frozen for
measurement; this file exists for optimization-round isolation runs).

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--plans OUTDIR] query [query ...]
  python bench_extra.py --all            # every registry query, one line each

Times each named registry query through the noop sink (guide §1.4) on
local[$SPARK_GRAFT_CPUS], best-of --reps interleaved passes, and optionally
dumps .explain("formatted") to OUTDIR/<query>.txt. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dir to write explain('formatted') per query")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from stellar_etl_spark.plans.registry import REGISTRY
    from stellar_etl_spark.session import get_spark

    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=cpus, streaming=True)
    names = list(REGISTRY) if args.all else args.queries
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up (same as bench.py)
    _force(spark.range(100000).selectExpr("id", "sha2(cast(id as string), 256) s"))
    _force(REGISTRY["turns"][0](spark, "/root/testdata/sf0.001"))

    reps: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.reps):
        for n in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{n}")
            t0 = time.time()
            _force(REGISTRY[n][0](spark, args.sf))
            reps[n].append(round(time.time() - t0, 3))
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for n in names:
            df = REGISTRY[n][0](spark, args.sf)
            with open(os.path.join(args.plans, f"{n}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    out = {
        "sf": args.sf,
        "cpus": cpus,
        "best": {n: min(ts) for n, ts in reps.items()},
        "reps": reps,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
