"""W7 — linear interpolation / series alignment (SURVEY.md §2.5).

The reference resamples sparse CloudWatch series onto Locust timestamps
with scipy.interp1d (load-tests/analysis/generate_graphs.py:117-150).
Spark has no interpolation primitive, so this is the designated
``applyInPandas`` (grouped-map) operator: each metric group is small
(one time-series), pandas does the alignment, the group fan-out is the
parallelism.

Exactness contract for the DuckDB oracle: the interpolation formula is
written the same way on both sides —

    frac = (t - t0) / (t1 - t0)          # int64 microseconds → one division
    v    = v0 + (v1 - v0) * frac         # same IEEE op order

(np.interp is NOT used — it computes slope*(x-x0)+y0, a different op
order with different low bits.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = "event_type string, grid_ts timestamp, value_interp double"


def _interp_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("ts")
    # dedup equal timestamps deterministically (min value)
    pdf = pdf.groupby("ts", as_index=False).agg(
        event_type=("event_type", "first"), value=("value", "min")
    )
    if len(pdf) < 2:
        return pd.DataFrame(columns=["event_type", "grid_ts", "value_interp"])
    start = pdf["ts"].min().ceil("min")
    end = pdf["ts"].max().floor("min")
    if start > end:
        return pd.DataFrame(columns=["event_type", "grid_ts", "value_interp"])
    grid = pd.DataFrame({"grid_ts": pd.date_range(start, end, freq="min")})
    prev = pd.merge_asof(
        grid, pdf.rename(columns={"ts": "t0", "value": "v0"})[["t0", "v0"]],
        left_on="grid_ts", right_on="t0", direction="backward",
    )
    nxt = pd.merge_asof(
        grid, pdf.rename(columns={"ts": "t1", "value": "v1"})[["t1", "v1"]],
        left_on="grid_ts", right_on="t1", direction="forward",
    )
    out = pd.concat([prev, nxt[["t1", "v1"]]], axis=1)
    t_us = out["grid_ts"].astype("int64")
    t0_us = out["t0"].astype("int64")
    t1_us = out["t1"].astype("int64")
    at_point = t_us == t0_us
    frac = (t_us - t0_us) / (t1_us - t0_us)
    out["value_interp"] = (out["v0"] + (out["v1"] - out["v0"]) * frac).where(
        ~at_point, out["v0"]
    )
    out["event_type"] = pdf["event_type"].iloc[0]
    return out[["event_type", "grid_ts", "value_interp"]]


def interpolate_series(events: DataFrame) -> DataFrame:
    """Per-metric minute-grid linear interpolation.

    Grid points lie strictly inside each series' [min_ts, max_ts], so both
    brackets always exist. Scale shape: one group per metric — fine for
    metric counts up to ~10^5; for per-entity series partition by the
    entity key instead."""
    return (
        events.select("event_type", "ts", "value")
        .groupBy("event_type")
        .applyInPandas(_interp_group, OUT_SCHEMA)
    )
