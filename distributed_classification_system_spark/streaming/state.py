"""Keyed session state kernel — the heart of the CEP engine.

Re-expresses the reference's per-job incremental fold
(backend-service/handlers/handlers.go:231-304) as an
``applyInPandasWithState`` function grouped by ``conv_id``:

- dedup by turn_idx against state (A2; ref scans DetailedResults O(n) per
  message, handlers.go:247-256 — we keep a seen-set)
- counters: total/classified/unknown, processing-time sum (A4/A6)
- label → turn-name grouping (A3, handlers.go:263-264) with stable
  turn_idx ordering (W10 — ref appends in arrival order; we sort)
- completion when n_seen >= n_expected (A5, handlers.go:291-299), **or**
  event-time timeout once the watermark passes last_ts + gap — the
  late-data-safe improvement over the reference, which leaves a job
  'processing' forever if one message is lost (T3).

Spark guarantees per-key serial execution partitioned across the cluster,
replacing the reference's global mutex (handlers.go:28,219-221) that
serialized ALL jobs through one lock.

Output is a union stream: one 'turn' row per classified turn (pass-through
with stable ordering) plus one 'summary' row per conversation close.
"""

from __future__ import annotations

import json
from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import types as T

# Rows entering the stateful fold (classified turns + conv config).
FOLD_INPUT = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("model_used", T.StringType()),
        T.StructField("top_prediction", T.StringType()),
        T.StructField("top_confidence", T.DoubleType()),
        T.StructField("all_predictions_json", T.StringType()),
        T.StructField("reason", T.StringType()),
        T.StructField("processing_time_ms", T.DoubleType()),
        T.StructField("n_turns", T.IntegerType()),
    ]
)

# Union output: row_type 'turn' | 'summary'.
FOLD_OUTPUT = T.StructType(
    [
        T.StructField("row_type", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        # turn fields
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("model_used", T.StringType()),
        T.StructField("top_prediction", T.StringType()),
        T.StructField("top_confidence", T.DoubleType()),
        T.StructField("all_predictions_json", T.StringType()),
        T.StructField("reason", T.StringType()),
        T.StructField("processing_time_ms", T.DoubleType()),
        # summary fields
        T.StructField("status", T.StringType()),
        T.StructField("total", T.IntegerType()),
        T.StructField("classified", T.IntegerType()),
        T.StructField("unknown", T.IntegerType()),
        T.StructField("grouped_by_label_json", T.StringType()),
        T.StructField("sum_processing_time_ms", T.DoubleType()),
        T.StructField("completed_at", T.TimestampType()),
    ]
)

# Keyed state: counters + seen-set + label grouping (JSON).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_expected", T.IntegerType()),
        T.StructField("classified", T.IntegerType()),
        T.StructField("unknown", T.IntegerType()),
        T.StructField("sum_ms", T.DoubleType()),
        T.StructField("max_ts_us", T.LongType()),
        T.StructField("model_used", T.StringType()),
        T.StructField("seen", T.ArrayType(T.IntegerType())),
        T.StructField("labels_json", T.StringType()),
        T.StructField("done", T.BooleanType()),
    ]
)

TURN_NAME = "turn-%05d"
SESSION_GAP_MS = 10 * 60 * 1000  # close-by-timeout gap after last seen turn


def _summary_pdf(conv_id: str, status: str, st: dict[str, Any]) -> pd.DataFrame:
    labels: dict[str, list[tuple[int, str]]] = json.loads(st["labels_json"])
    grouped = {
        lab: [name for _, name in sorted(pairs)] for lab, pairs in sorted(labels.items())
    }
    return pd.DataFrame(
        [
            {
                "row_type": "summary",
                "conv_id": conv_id,
                "status": status,
                "model_used": st["model_used"],
                "total": len(st["seen"]),
                "classified": st["classified"],
                "unknown": st["unknown"],
                "grouped_by_label_json": json.dumps(grouped, sort_keys=True),
                "sum_processing_time_ms": st["sum_ms"],
                "completed_at": pd.Timestamp(st["max_ts_us"], unit="us"),
            }
        ]
    )


def session_fold(
    key: tuple[str],
    pdfs: Iterable[pd.DataFrame],
    state,
) -> Iterable[pd.DataFrame]:
    """The per-conversation fold. ``state`` is a pyspark GroupState."""
    (conv_id,) = key

    if state.hasTimedOut:
        st = _state_dict(state.get)
        state.remove()
        if not st["done"] and st["seen"]:
            yield _summary_pdf(conv_id, "timeout", st)
        return

    if state.exists:
        st = _state_dict(state.get)
    else:
        st = {
            "n_expected": -1,
            "classified": 0,
            "unknown": 0,
            "sum_ms": 0.0,
            "max_ts_us": 0,
            "model_used": None,
            "seen": [],
            "labels_json": "{}",
            "done": False,
        }

    seen = set(st["seen"])
    labels: dict[str, list[list]] = json.loads(st["labels_json"])
    turn_out = []

    for pdf in pdfs:
        # stable (conv_id, turn_idx) ordering before folding — the reference
        # folds in nondeterministic arrival order (handlers.go:259)
        pdf = pdf.sort_values("turn_idx")
        for row in pdf.itertuples(index=False):
            idx = int(row.turn_idx)
            if idx in seen or st["done"]:
                continue  # A2 idempotency dedup under at-least-once replay
            seen.add(idx)
            st["n_expected"] = int(row.n_turns)
            st["model_used"] = row.model_used
            if row.top_prediction != "unknown":
                st["classified"] += 1
            else:
                st["unknown"] += 1
            st["sum_ms"] += float(row.processing_time_ms)
            ts_us = int(row.ts.value // 1000)
            st["max_ts_us"] = max(st["max_ts_us"], ts_us)
            labels.setdefault(row.top_prediction, []).append(
                [idx, TURN_NAME % idx]
            )
            turn_out.append(
                {
                    "row_type": "turn",
                    "conv_id": conv_id,
                    "turn_idx": idx,
                    "role": row.role,
                    "text": row.text,
                    "tool": row.tool,
                    "ts": row.ts,
                    "model_used": row.model_used,
                    "top_prediction": row.top_prediction,
                    "top_confidence": float(row.top_confidence),
                    "all_predictions_json": row.all_predictions_json,
                    "reason": row.reason,
                    "processing_time_ms": float(row.processing_time_ms),
                }
            )

    if turn_out:
        yield pd.DataFrame(turn_out)

    st["seen"] = sorted(seen)
    st["labels_json"] = json.dumps(labels, sort_keys=True)

    complete = st["n_expected"] > 0 and len(seen) >= st["n_expected"]
    if complete and not st["done"]:
        st["done"] = True
        yield _summary_pdf(conv_id, "completed", st)
        state.remove()
        return

    state.update(_state_tuple(st))
    # close-by-timeout once the watermark passes last activity + gap (T3)
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + SESSION_GAP_MS)


def _state_dict(tup) -> dict[str, Any]:
    return {
        "n_expected": tup[0],
        "classified": tup[1],
        "unknown": tup[2],
        "sum_ms": tup[3],
        "max_ts_us": tup[4],
        "model_used": tup[5],
        "seen": list(tup[6]) if tup[6] is not None else [],
        "labels_json": tup[7] or "{}",
        "done": bool(tup[8]),
    }


def _state_tuple(st: dict[str, Any]) -> tuple:
    return (
        st["n_expected"],
        st["classified"],
        st["unknown"],
        st["sum_ms"],
        st["max_ts_us"],
        st["model_used"],
        st["seen"],
        st["labels_json"],
        st["done"],
    )
