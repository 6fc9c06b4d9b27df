#!/usr/bin/env python
"""Unbounded soak of the 3-sink fan-out export (VERDICT r4 item 5).

bench_soak.py covers the stateful pairs matcher; this drives the actual
north-star production job — ``run_fanout_export``'s one-scan → 3-extractor
(turns/units/effects) → 3 exactly-once epoch sinks path — under a
processing-time trigger over a live rate-limited feed for
``SPARK_GRAFT_SOAK_SEC`` (default 660 s), recording trigger latency and
per-epoch sink-commit wall time over ≥300 micro-batches.

Health criteria reported (appended to BENCH/ADDENDA.md):

- **flat trigger latency**: last-third mean within noise of the first third
  (no commit-log / file-index degradation as epochs accumulate);
- **bounded sink-commit time**: the fan-out foreachBatch (3 extractor runs +
  3 epoch writes + lineage) stays flat as the sinks grow to hundreds of
  epochs — the epoch-keyed layout never rewrites old epochs, so commit cost
  tracks batch size, not table size.

Env knobs: SPARK_GRAFT_SOAK_SEC, _FEED_SEC, _CONVS, _ROWS, _CORES (shared
with bench_soak.py, whose feeder this reuses).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from bench_soak import _Feeder, CONV_POOL, FEED_INTERVAL, ROWS_PER_BATCH

DURATION = int(os.environ.get("SPARK_GRAFT_SOAK_SEC", "660"))
CORES = int(os.environ.get("SPARK_GRAFT_SOAK_CORES", "16"))
_HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    from stellar_etl_spark.operators import extract_effects, extract_turns, extract_units
    from stellar_etl_spark.session import get_spark
    from stellar_etl_spark.sources.transcripts import read_stream
    from stellar_etl_spark.streaming.listener import MetricsListener
    from stellar_etl_spark.streaming.sink import IdempotentSink

    started = time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime())
    # 8 shuffle partitions: the production small-batch tuning (a 2k-row
    # micro-batch gains nothing from 32 reducers; see registry harness note)
    spark = get_spark("soak-fanout", cores=CORES, shuffle_partitions=8, streaming=True)
    work = tempfile.mkdtemp(prefix="soak_fanout_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    feeder = _Feeder(src)
    feeder._write_batch()

    extractors = {"turns": extract_turns, "units": extract_units, "effects": extract_effects}
    keys = {
        "turns": ("conv_id", "turn_idx"),
        "units": ("conv_id", "turn_idx", "unit_idx"),
        "effects": ("conv_id", "turn_idx", "effect_index"),
    }
    sinks = {
        name: IdempotentSink(
            os.path.join(work, "out", name), keys[name], output_partitions=4
        )
        for name in extractors
    }
    commit_secs: list[tuple[float, float]] = []  # (wall offset, fanout seconds)
    t_start_holder = [0.0]

    def fanout(batch_df, epoch_id):
        t0 = time.time()
        for name, ex in extractors.items():
            sinks[name].foreach_batch(ex(batch_df), epoch_id)
        commit_secs.append((round(t0 - t_start_holder[0], 1), round(time.time() - t0, 3)))

    listener = MetricsListener()
    spark.streams.addListener(listener)
    # t_start set BEFORE start(): the first micro-batch can commit before
    # control returns here, and its timeline offset must not be epoch-absolute.
    t_start = time.time()
    t_start_holder[0] = t_start
    q = (
        read_stream(spark, src)
        .writeStream.foreachBatch(fanout)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    feeder.start()
    try:
        while time.time() - t_start < DURATION:
            time.sleep(1.0)
            if not q.isActive:
                raise RuntimeError(f"query died mid-soak: {q.exception()}")
    finally:
        feeder.stop_evt.set()
        feeder.join(timeout=10)
        q.stop()
        spark.streams.removeListener(listener)

    snaps = [s for s in listener.snapshots if s["numInputRows"] > 0]
    commits = [c for c in commit_secs if c[1] > 0]
    third = max(len(snaps) // 3, 1)
    cthird = max(len(commits) // 3, 1)

    def mean(xs):
        xs = [x for x in xs if x is not None]
        return round(sum(xs) / len(xs), 1) if xs else None

    trig = [(s["durationMs"] or {}).get("triggerExecution") for s in snaps]
    csec = [c[1] for c in commits]
    out_rows = {
        name: sum(e["rows"] for e in sinks[name].lineage()) for name in sinks
    }
    result = {
        "metric": "soak_fanout",
        "duration_sec": round(time.time() - t_start, 1),
        "cores": CORES,
        "rows_fed": feeder.rows_fed,
        "feed_batches": feeder.batches_fed,
        "micro_batches": len(snaps),
        "rows_processed": sum(s["numInputRows"] for s in snaps),
        "trigger_ms_first_third": mean(trig[:third]),
        "trigger_ms_last_third": mean(trig[-third:]),
        "commit_sec_first_third": round(sum(csec[:cthird]) / cthird, 3),
        "commit_sec_last_third": round(sum(csec[-cthird:]) / cthird, 3),
        "commit_sec_max": max(csec, default=None),
        "epochs_per_sink": {name: len(sinks[name].lineage()) for name in sinks},
        "rows_committed": out_rows,
    }
    print(json.dumps(result))

    sample = commits[:: max(len(commits) // 10, 1)]
    ts_line = "| " + " | ".join(f"{t:.0f}s: {c}s" for t, c in sample) + " |"
    with open(os.path.join(_HERE, "BENCH", "ADDENDA.md"), "a") as f:
        f.write(
            f"""
### Fan-out soak ({started}, bench_soak_fanout.py)

{result['duration_sec']:.0f} s processing-time-trigger (1 s) run of the
3-sink fan-out export (one scan -> turns/units/effects -> 3 exactly-once
epoch sinks) over a live rate-limited feed: {result['feed_batches']} feed
batches, {result['rows_fed']:,} rows fed across a {CONV_POOL}-conversation pool
({ROWS_PER_BATCH} rows / {FEED_INTERVAL:.0f} s), {result['micro_batches']} data
micro-batches, {CORES} cores.

| metric | first third | last third | max |
|---|---|---|---|
| mean trigger latency (ms) | {result['trigger_ms_first_third']} | {result['trigger_ms_last_third']} | — |
| fan-out commit wall (s) | {result['commit_sec_first_third']} | {result['commit_sec_last_third']} | {result['commit_sec_max']} |

Rows committed exactly-once: turns {out_rows['turns']:,} / units
{out_rows['units']:,} / effects {out_rows['effects']:,} across
{result['epochs_per_sink']['turns']} epochs per sink — commit cost tracks
batch size, not accumulated table size (the epoch-keyed layout never
rewrites old epochs).

Commit-time timeline (sampled): {ts_line}
"""
        )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
