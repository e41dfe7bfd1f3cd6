"""Streaming observability: a StreamingQueryListener that turns
micro-batch progress events into the numbers an operator actually
watches — rows in, processing rate, batch latency, state size.

At 100 TB-scale streaming, throughput regressions and state growth
are operational incidents; Spark already emits everything needed on
every micro-batch through the listener bus, and this module reduces
that event stream to a compact summary (and keeps the raw per-batch
rows for drill-down).  Nothing here touches the data path — the
listener is pure control-plane, so attaching it costs nothing in the
hot loop.

Usage::

    mon = ProgressMonitor.attach(spark)
    try:
        ... run streaming queries ...
        mon.wait_for_batches(1)
        stats = mon.summary()
    finally:
        mon.detach(spark)

Listener events are delivered asynchronously on Spark's listener
thread — ``wait_for_batches`` polls until delivery (or timeout), so
tests and availableNow drains can assert deterministically.
"""

from __future__ import annotations

import threading
import time

from pyspark.sql.streaming import StreamingQueryListener


class ProgressMonitor(StreamingQueryListener):
    """Collects per-micro-batch progress rows and summarizes them."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.batches: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []
        self.exceptions: list[str] = []

    # -- listener callbacks (Spark's listener thread) -----------------

    def onQueryStarted(self, event) -> None:
        with self._lock:
            self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        row = {
            "query_id": str(p.id),
            "batch_id": p.batchId,
            "input_rows": p.numInputRows or 0,
            "rows_per_sec": p.processedRowsPerSecond or 0.0,
            "batch_ms": (p.durationMs or {}).get("triggerExecution", 0),
            "state_rows": sum(
                (op.numRowsTotal or 0) for op in (p.stateOperators or [])
            ),
        }
        with self._lock:
            self.batches.append(row)

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing
        pass

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self.terminated.append(str(event.id))
            if event.exception:
                self.exceptions.append(str(event.exception))

    # -- driver-side API ----------------------------------------------

    @classmethod
    def attach(cls, spark) -> "ProgressMonitor":
        mon = cls()
        spark.streams.addListener(mon)
        return mon

    def detach(self, spark) -> None:
        spark.streams.removeListener(self)

    def wait_for_batches(
        self, n: int, timeout_s: float = 30.0, poll_s: float = 0.1
    ) -> bool:
        """Poll until >= n batch-progress events with input rows have
        arrived (listener delivery is async).  True on success."""
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            with self._lock:
                if len([b for b in self.batches if b["input_rows"] > 0]) >= n:
                    return True
            time.sleep(poll_s)
        return False

    def summary(self) -> dict:
        """One roll-up row: the dashboard numbers."""
        with self._lock:
            rows = list(self.batches)
            n_term = len(self.terminated)
            n_exc = len(self.exceptions)
        fed = [b for b in rows if b["input_rows"] > 0]
        return {
            "n_batches": len(rows),
            "n_fed_batches": len(fed),
            "total_input_rows": sum(b["input_rows"] for b in rows),
            "max_state_rows": max((b["state_rows"] for b in rows), default=0),
            "max_batch_ms": max((b["batch_ms"] for b in rows), default=0),
            "n_terminated": n_term,
            "n_exceptions": n_exc,
        }
