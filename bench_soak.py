#!/usr/bin/env python
"""Unbounded streaming soak — the one regime the AvailableNow benches never
exercise (VERDICT r3 #8): a processing-time-trigger query over a rate-limited
LIVE file feed, run for ``SPARK_GRAFT_SOAK_SEC`` (default 600 s), recording
RocksDB state size, watermark lag, and trigger latency over time.

Job under soak: the stateful user→response matcher (``streaming_pairs`` —
applyInPandasWithState over RocksDB, EventTimeTimeout eviction) through the
exactly-once epoch sink. A feeder thread appends a small parquet batch every
``SPARK_GRAFT_SOAK_FEED_SEC`` seconds with event times at wall clock, so the
watermark advances in near-real-time and state eviction runs continuously —
exactly the long-running production regime.

Health criteria reported (appended to BENCH/ADDENDA.md):

- **bounded state**: state rows plateau near the conversation-pool working
  set instead of tracking cumulative input; final ≈ peak ≪ total rows fed.
- **flat latency**: last-third mean trigger latency within noise of the
  first third (no monotonic growth = no state-scan degradation).
- **bounded watermark lag**: watermark trails wall clock by roughly the
  configured delay (2 min) + one feed interval, flat over the run.

Env knobs: SPARK_GRAFT_SOAK_SEC, _FEED_SEC, _CONVS (conversation pool),
_ROWS (rows per feed batch), _CORES.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import tempfile
import threading
import time

DURATION = int(os.environ.get("SPARK_GRAFT_SOAK_SEC", "600"))
FEED_INTERVAL = float(os.environ.get("SPARK_GRAFT_SOAK_FEED_SEC", "2"))
CONV_POOL = int(os.environ.get("SPARK_GRAFT_SOAK_CONVS", "200"))
ROWS_PER_BATCH = int(os.environ.get("SPARK_GRAFT_SOAK_ROWS", "2000"))
CORES = int(os.environ.get("SPARK_GRAFT_SOAK_CORES", "16"))
WATERMARK = "2 minutes"
_HERE = os.path.dirname(os.path.abspath(__file__))


class _Feeder(threading.Thread):
    """Appends one parquet batch per interval with event times ~ wall clock.
    Pure pyarrow writes (no Spark jobs) so the feed never contends with the
    streaming query for cluster resources."""

    def __init__(self, src: str):
        super().__init__(daemon=True)
        self.src = src
        self.stop_evt = threading.Event()
        self.rows_fed = 0
        self.batches_fed = 0
        self._turn_idx = dict.fromkeys(range(CONV_POOL), 0)
        self._file_no = 0

    def _write_batch(self) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        roles = ("user", "assistant", "tool", "user", "assistant")
        conv_ids, turn_idxs, role_col, texts, tools, tss = [], [], [], [], [], []
        for i in range(ROWS_PER_BATCH):
            conv = (self.rows_fed + i) % CONV_POOL
            idx = self._turn_idx[conv]
            self._turn_idx[conv] = idx + 1
            role = roles[idx % len(roles)]
            conv_ids.append(f"soak_{conv:05d}")
            turn_idxs.append(idx)
            role_col.append(role)
            texts.append(f"turn {idx} of conversation {conv} role {role}")
            tools.append("search" if role == "tool" else None)
            # spread the batch's event times across the feed interval, all
            # in the past so nothing is "future" relative to the watermark
            tss.append(now - dt.timedelta(milliseconds=(i % 1000)))
        table = pa.table(
            {
                "conv_id": pa.array(conv_ids, pa.string()),
                "turn_idx": pa.array(turn_idxs, pa.int32()),
                "role": pa.array(role_col, pa.string()),
                "text": pa.array(texts, pa.string()),
                "tool": pa.array(tools, pa.string()),
                "ts": pa.array(tss, pa.timestamp("us")),
            }
        )
        day_dir = os.path.join(self.src, f"ts_date={now.date().isoformat()}")
        os.makedirs(day_dir, exist_ok=True)
        tmp = os.path.join(day_dir, f".part-{self._file_no:06d}.parquet.tmp")
        pq.write_table(table, tmp)
        # atomic rename: the stream lister never sees a half-written file
        os.rename(tmp, os.path.join(day_dir, f"part-{self._file_no:06d}.parquet"))
        self._file_no += 1
        self.rows_fed += ROWS_PER_BATCH
        self.batches_fed += 1

    def run(self) -> None:
        while not self.stop_evt.is_set():
            t0 = time.time()
            self._write_batch()
            self.stop_evt.wait(max(0.0, FEED_INTERVAL - (time.time() - t0)))


def _wm_lag_sec(snap: dict, at_wall: float) -> float | None:
    wm = (snap.get("eventTime") or {}).get("watermark")
    if not wm:
        return None
    wm_ts = dt.datetime.fromisoformat(wm.replace("Z", "+00:00")).timestamp()
    if wm_ts < 1e9:  # epoch-zero placeholder before the first watermark commit
        return None
    return round(at_wall - wm_ts, 1)


def main() -> None:
    from stellar_etl_spark.session import get_spark
    from stellar_etl_spark.sources.transcripts import read_stream
    from stellar_etl_spark.streaming.listener import MetricsListener
    from stellar_etl_spark.streaming.sink import IdempotentSink
    from stellar_etl_spark.streaming.state import streaming_pairs

    started = time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime())
    spark = get_spark("soak", cores=CORES, streaming=True)
    work = tempfile.mkdtemp(prefix="soak_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    feeder = _Feeder(src)
    feeder._write_batch()  # one batch before start: the source must exist

    sink = IdempotentSink(
        os.path.join(work, "pairs"),
        ("conv_id", "user_turn_idx"),
        output_partitions=8,
    )
    listener = MetricsListener()
    spark.streams.addListener(listener)
    # stamp each snapshot with its wall time (the listener stores progress
    # only): poll snapshot count from the main loop below
    snap_walls: list[float] = []
    # 60 s pairing horizon: emissions need watermark > user_ts + horizon, so
    # a 10-min soak sees several minutes of steady exactly-once commits
    out = streaming_pairs(read_stream(spark, src), WATERMARK, 60)
    q = (
        out.writeStream.foreachBatch(sink.foreach_batch)
        .option("checkpointLocation", os.path.join(work, "ck"))
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    feeder.start()
    t_start = time.time()
    seen = 0
    try:
        while time.time() - t_start < DURATION:
            time.sleep(1.0)
            while seen < len(listener.snapshots):
                snap_walls.append(time.time())
                seen += 1
            if not q.isActive:
                raise RuntimeError(f"query died mid-soak: {q.exception()}")
    finally:
        feeder.stop_evt.set()
        feeder.join(timeout=10)
        q.stop()
        spark.streams.removeListener(listener)

    snaps = listener.snapshots
    walls = snap_walls + [time.time()] * (len(snaps) - len(snap_walls))
    recs = []
    for s, w in zip(snaps, walls):
        recs.append(
            {
                "t": round(w - t_start, 1),
                "batch": s["batchId"],
                "rows": s["numInputRows"],
                "trigger_ms": (s["durationMs"] or {}).get("triggerExecution"),
                "state_rows": sum(op.get("numRowsTotal") or 0 for op in s["stateOperators"]),
                "state_bytes": sum(op.get("memoryUsedBytes") or 0 for op in s["stateOperators"]),
                "wm_lag_sec": _wm_lag_sec(s, w),
            }
        )
    data = [r for r in recs if r["rows"] > 0 or r["state_rows"] > 0]
    third = max(len(data) // 3, 1)
    first, last = data[:third], data[-third:]

    def mean(xs):
        xs = [x for x in xs if x is not None]
        return round(sum(xs) / len(xs), 1) if xs else None

    result = {
        "metric": "soak",
        "duration_sec": round(time.time() - t_start, 1),
        "cores": CORES,
        "rows_fed": feeder.rows_fed,
        "feed_batches": feeder.batches_fed,
        "micro_batches": len(data),
        "rows_processed": sum(r["rows"] for r in data),
        "trigger_ms_first_third": mean([r["trigger_ms"] for r in first]),
        "trigger_ms_last_third": mean([r["trigger_ms"] for r in last]),
        "state_rows_peak": max((r["state_rows"] for r in data), default=0),
        "state_rows_final": data[-1]["state_rows"] if data else 0,
        "state_mb_peak": round(max((r["state_bytes"] for r in data), default=0) / 1e6, 1),
        "wm_lag_first_third": mean([r["wm_lag_sec"] for r in first]),
        "wm_lag_last_third": mean([r["wm_lag_sec"] for r in last]),
        "pairs_committed": sum(e["rows"] for e in sink.lineage()),
    }
    print(json.dumps(result))

    ts_line = "| " + " | ".join(
        f"{r['t']:.0f}s: {r['trigger_ms']}ms/{r['state_rows']}rows"
        for r in data[:: max(len(data) // 10, 1)]
    ) + " |"
    with open(os.path.join(_HERE, "BENCH", "ADDENDA.md"), "a") as f:
        f.write(
            f"""
### Unbounded soak ({started}, bench_soak.py)

{result['duration_sec']:.0f} s processing-time-trigger (1 s) run of the
stateful pairs matcher (applyInPandasWithState, RocksDB state store,
event-time timeout) over a live rate-limited feed: {result['feed_batches']}
feed batches, {result['rows_fed']:,} rows fed across a {CONV_POOL}-conversation
working set, {result['micro_batches']} micro-batches, {CORES} cores.

| metric | first third | last third |
|---|---|---|
| mean trigger latency (ms) | {result['trigger_ms_first_third']} | {result['trigger_ms_last_third']} |
| mean watermark lag (s) | {result['wm_lag_first_third']} | {result['wm_lag_last_third']} |

State: peak {result['state_rows_peak']:,} rows / {result['state_mb_peak']} MB,
final {result['state_rows_final']:,} rows, vs {result['rows_fed']:,} cumulative
input rows — watermark eviction keeps state at the working set, not the
stream. Pairs committed exactly-once: {result['pairs_committed']:,}.

Timeline (sampled): {ts_line}
"""
        )
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
