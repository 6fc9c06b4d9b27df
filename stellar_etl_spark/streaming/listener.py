"""K4: transform stats / metrics — the PrintTransformStats analog
(``cmd/command_utils.go:90-103``; accumulation at
``cmd/ledger_batch_export.go:72-85``), upgraded to a
``StreamingQueryListener`` that captures per-micro-batch throughput,
watermark progression, and state-store size.
"""

from __future__ import annotations

import json

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Collects per-batch progress: rows/sec, durations, state rows.

    ``snapshots`` is driver-side only (tiny: one dict per micro-batch);
    :meth:`summary` aggregates to the headline numbers BENCH reports.
    """

    def __init__(self, sink_path: str | None = None):
        self.snapshots: list[dict] = []
        self.sink_path = sink_path

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        snap = {
            "batchId": p.get("batchId"),
            "numInputRows": p.get("numInputRows", 0),
            "inputRowsPerSecond": p.get("inputRowsPerSecond"),
            "processedRowsPerSecond": p.get("processedRowsPerSecond"),
            "durationMs": p.get("durationMs", {}),
            "eventTime": p.get("eventTime", {}),
            "stateOperators": [
                {
                    "numRowsTotal": s.get("numRowsTotal"),
                    "numRowsUpdated": s.get("numRowsUpdated"),
                    "memoryUsedBytes": s.get("memoryUsedBytes"),
                }
                for s in p.get("stateOperators", [])
            ],
        }
        self.snapshots.append(snap)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        if self.sink_path:
            try:
                with open(self.sink_path, "w") as f:
                    json.dump(self.snapshots, f)
            except OSError:
                pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def summary(self) -> dict:
        rows = sum(s["numInputRows"] for s in self.snapshots)
        total_ms = sum(
            (s["durationMs"] or {}).get("triggerExecution", 0) for s in self.snapshots
        )
        state_rows = [
            sum(op.get("numRowsTotal") or 0 for op in s["stateOperators"])
            for s in self.snapshots
            if s["stateOperators"]
        ]
        state_bytes = [
            sum(op.get("memoryUsedBytes") or 0 for op in s["stateOperators"])
            for s in self.snapshots
            if s["stateOperators"]
        ]
        return {
            "batches": len(self.snapshots),
            "input_rows": rows,
            "wall_ms": total_ms,
            "rows_per_sec": (rows / (total_ms / 1000.0)) if total_ms else None,
            # watermark-eviction health: peak/final state footprint (rows and
            # bytes across all stateful operators) — bounded state means the
            # final snapshot is far below cumulative input
            "max_state_rows": max(state_rows, default=0),
            "final_state_rows": state_rows[-1] if state_rows else 0,
            "max_state_bytes": max(state_bytes, default=0),
        }
