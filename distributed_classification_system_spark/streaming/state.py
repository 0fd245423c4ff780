"""Keyed session state kernel — the heart of the CEP engine.

Re-expresses the reference's per-job incremental fold
(backend-service/handlers/handlers.go:231-304) as an
``applyInPandasWithState`` function grouped by ``conv_id``:

- dedup by turn_idx against state (A2; ref scans DetailedResults O(n) per
  message, handlers.go:247-256 — we keep a seen-set, vectorized isin)
- counters: total/classified/unknown, processing-time sum (A4/A6)
- label → turn-name grouping (A3, handlers.go:263-264) with stable
  turn_idx ordering (W10 — ref appends in arrival order; we sort the
  grouping lists at emission)
- completion when n_seen >= n_expected (A5, handlers.go:291-299), **or**
  session-window timeout once the event-time watermark passes
  last_activity + gap — the late-data-safe improvement over the
  reference, which leaves a job 'processing' forever if one message is
  lost (T3).

Spark guarantees per-key serial execution partitioned across the cluster,
replacing the reference's global mutex (handlers.go:28,219-221) that
serialized ALL jobs through one lock.

Output is a union stream: per-turn pass-through rows (row_type='turn')
plus one summary row per session close (row_type='summary', fields packed
in ``summary_json`` and expanded JVM-side in the sink — keeps the per-key
Python down to one vectorized ``assign``).

Performance note: the per-key cost here is deliberately O(batch rows for
this key) with ~4 pandas ops — measured ~0.5 ms/key against Spark's own
~1 ms/key group-slicing floor. A completed session keeps a tombstone
state (with its seen-set) until the watermark passes, so at-least-once
redelivery after completion neither re-emits turns nor spawns a second
session.
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

# Union output: the input columns + row_type + packed summary.
FOLD_OUTPUT = T.StructType(
    FOLD_INPUT.fields
    + [
        T.StructField("row_type", T.StringType()),
        T.StructField("summary_json", T.StringType()),
    ]
)

SUMMARY_JSON_SCHEMA = (
    "struct<status:string, model_used:string, total:int, classified:int,"
    " unknown:int, grouped_by_label:map<string,array<string>>,"
    " processing_time_ms:double, completed_at:timestamp>"
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
SESSION_GAP_MS = 10 * 60 * 1000  # close-by-timeout gap after last activity

_OUT_COLS = [f.name for f in FOLD_OUTPUT.fields]
_EMPTY = {c: None for c in _OUT_COLS}


def _summary_pdf(conv_id: str, status: str, st: dict[str, Any]) -> pd.DataFrame:
    labels: dict[str, list[tuple[int, str]]] = json.loads(st["labels_json"])
    grouped = {
        lab: [name for _, name in sorted(pairs)] for lab, pairs in sorted(labels.items())
    }
    payload = {
        "status": status,
        "model_used": st["model_used"],
        "total": len(st["seen"]),
        "classified": st["classified"],
        "unknown": st["unknown"],
        "grouped_by_label": grouped,
        "processing_time_ms": st["sum_ms"],
        # emission time = max event time of the session (deterministic)
        "completed_at": pd.Timestamp(st["max_ts_us"], unit="us").isoformat(),
    }
    row = dict(_EMPTY)
    row["conv_id"] = conv_id
    row["row_type"] = "summary"
    row["summary_json"] = json.dumps(payload, sort_keys=True)
    return pd.DataFrame([row], columns=_OUT_COLS)


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
        # done-tombstones expire silently; open sessions close as 'timeout'
        # (the reference leaves them 'processing' forever, handlers.go:291-299)
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
    out_parts = []

    for pdf in pdfs:
        # A2 idempotency dedup under at-least-once delivery: intra-batch
        # via drop_duplicates, cross-batch via the state seen-set
        pdf = pdf.drop_duplicates("turn_idx")
        if seen:
            pdf = pdf[~pdf["turn_idx"].isin(seen)]
        if st["done"] or pdf.empty:
            continue
        idxs = pdf["turn_idx"].to_numpy()
        preds = pdf["top_prediction"].to_numpy()
        seen.update(int(i) for i in idxs)
        st["n_expected"] = int(pdf["n_turns"].iloc[0])
        st["model_used"] = pdf["model_used"].iloc[0]
        unk = int((preds == "unknown").sum())
        st["classified"] += len(preds) - unk
        st["unknown"] += unk
        st["sum_ms"] += float(pdf["processing_time_ms"].sum())
        st["max_ts_us"] = max(st["max_ts_us"], int(pdf["ts"].max().value // 1000))
        for i, p in zip(idxs, preds):
            labels.setdefault(p, []).append([int(i), TURN_NAME % int(i)])
        # single vectorized pass-through: input columns + two constants
        out_parts.append(pdf.assign(row_type="turn", summary_json=None))

    if out_parts:
        yield out_parts[0] if len(out_parts) == 1 else pd.concat(out_parts)

    st["seen"] = sorted(seen)
    st["labels_json"] = json.dumps(labels, sort_keys=True)

    complete = st["n_expected"] > 0 and len(seen) >= st["n_expected"]
    if complete and not st["done"]:
        st["done"] = True
        yield _summary_pdf(conv_id, "completed", st)
        # tombstone retained: dedups post-completion redelivery until the
        # watermark expires it

    state.update(_state_tuple(st))
    # session-window close semantics: time out once the event-time
    # watermark passes last activity + gap (T3/T4). EventTimeTimeout
    # requires a timestamp strictly beyond the current watermark.
    wm = state.getCurrentWatermarkMs()
    last_activity_ms = st["max_ts_us"] // 1000
    state.setTimeoutTimestamp(max(last_activity_ms + SESSION_GAP_MS, wm + 1000))


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
