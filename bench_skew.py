#!/usr/bin/env python
"""Hot-conversation skew probe (VERDICT r2 item 7).

One mega-conversation (100k turns, ~10% of all rows) inside an otherwise
uniform table — the "hot ledger" analog at 10^12-turn scale. Measures, on
the same 16-core session:

- the per-reducer ROW distribution of the plain ``groupBy(conv_id)`` shuffle
  vs the salted (conv_id, _salt) shuffle — max/median rows per post-shuffle
  partition is the direct straggler-work proxy (task time is row-linear for
  the aggregation);
- wall time of the plain single-phase conversation aggregate vs the salted
  two-phase one (operators/salt.py), best of N reps.

Appends one markdown block to BENCH/ADDENDA.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import time

import pyspark.sql.functions as F

from stellar_etl_spark.generator import read_transcripts, transcripts_df, write_transcripts
from stellar_etl_spark.operators import extract_conversations
from stellar_etl_spark.operators.salt import extract_conversations_salted, salted
from stellar_etl_spark.session import get_spark

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = "/tmp/spark_graft_skew_src"
CORES = int(os.environ.get("SPARK_GRAFT_SKEW_CORES", "16"))
BUCKETS = 16
REPS = int(os.environ.get("SPARK_GRAFT_SKEW_REPS", "3"))


def dist(df, cols: list[str], n_parts: int = 32) -> dict:
    rows = (
        df.repartition(n_parts, *[F.col(c) for c in cols])
        .withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .count()
        .collect()
    )
    counts = sorted(int(r["count"]) for r in rows)
    return {
        "partitions": len(counts),
        "max_rows": counts[-1],
        "median_rows": int(statistics.median(counts)),
        "skew_ratio": round(counts[-1] / max(statistics.median(counts), 1), 2),
    }


def timed(build) -> float:
    t0 = time.time()
    build().write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    spark = get_spark("skew-probe", cores=CORES, shuffle_partitions=32)
    if not os.path.isdir(SRC):
        df = transcripts_df(
            spark, n_convs=120_000, hot_convs=1, hot_turns=100_000, partitions=64
        )
        write_transcripts(df, SRC, partition_by_day=False)
    t = read_transcripts(spark, SRC)
    n = t.count()

    plain_dist = dist(t, ["conv_id"])
    salt_dist = dist(salted(t, buckets=BUCKETS), ["conv_id", "_salt"])

    w_plain = min(timed(lambda: extract_conversations(t)) for _ in range(REPS))
    w_salt = min(
        timed(lambda: extract_conversations_salted(t, buckets=BUCKETS)) for _ in range(REPS)
    )

    result = {
        "metric": "skew_probe",
        "n_turns": int(n),
        "hot_turns": 100_000,
        "cores": CORES,
        "buckets": BUCKETS,
        "plain_partition_rows": plain_dist,
        "salted_partition_rows": salt_dist,
        "plain_agg_sec_best": w_plain,
        "salted_agg_sec_best": w_salt,
    }
    print(json.dumps(result))

    block = f"""
### Hot-conversation skew probe ({time.strftime('%Y-%m-%d')} — bench_skew.py)

Input: {n:,} turns, one 100k-turn hot conversation (~{100_000 * 100 // n}% of all
rows), {CORES} cores, 32 shuffle partitions. Post-shuffle rows per reducer
(the straggler-work proxy — aggregation task time is row-linear):

| shuffle key | max rows/task | median rows/task | straggler ratio |
|---|---|---|---|
| conv_id (plain) | {plain_dist['max_rows']:,} | {plain_dist['median_rows']:,} | {plain_dist['skew_ratio']}x |
| (conv_id, salt%{BUCKETS}) | {salt_dist['max_rows']:,} | {salt_dist['median_rows']:,} | {salt_dist['skew_ratio']}x |

Salting bounds the hottest task at ~1/{BUCKETS} of the hot conversation;
wall time (best of {REPS}): plain single-phase agg {w_plain}s vs salted
two-phase {w_salt}s. At this hot-share the 16 cores still hide most of the
straggler behind concurrent tasks — the row-distribution bound is the
at-scale evidence (1000 executors cannot hide a task {plain_dist['skew_ratio']}x
the median; a {salt_dist['skew_ratio']}x bound rides the normal distribution).
"""
    with open(os.path.join(_HERE, "BENCH", "ADDENDA.md"), "a") as f:
        f.write(block)
    spark.stop()


if __name__ == "__main__":
    main()
