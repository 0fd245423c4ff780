"""Focused tests for the r6 kernel-internals optimization:

- `_label_groups` must group EXACTLY by label set even when the cheap
  (len, first, last) fingerprint collides between different sets (the
  vectorized-verify-then-fallback path).
- `make_classify_udf` (constant-config factory, no per-row label array)
  must be bit-identical to the generic 4-arg `classify_udf` on a real
  Spark plan, including at the wide-vocabulary argpartition path.
- `conv_summaries`' single-pass grouping must emit an EMPTY map (not
  null) for a conversation whose every turn failed validation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from distributed_classification_system_spark.functions.kernel import (
    _classify_batch,
    _label_groups,
    classify_udf,
    make_classify_udf,
    score_text,
)
from distributed_classification_system_spark.operators.classify import DOC_LABELS_1K


def test_label_groups_fingerprint_collision_falls_back_exactly():
    # same length, same first, same last, different middle -> same
    # fingerprint bucket, different sets: must split into exact groups
    a = np.array(["alpha", "mid1", "omega"], dtype=object)
    b = np.array(["alpha", "mid2", "omega"], dtype=object)
    labels = pd.Series([a, b, a, b, a], dtype=object)
    groups = _label_groups(labels)
    got = {tuple(ordered): sorted(rows.tolist()) for ordered, rows in groups}
    assert got == {
        ("alpha", "mid1", "omega"): [0, 2, 4],
        ("alpha", "mid2", "omega"): [1, 3],
    }
    # and scoring with those groups matches the scalar oracle per row
    texts = pd.Series(["mid1 mid2 x", "mid1 mid2 x", "alpha", "", None])
    out = _classify_batch(
        texts, groups, np.full(5, 0.2), np.full(5, 2, dtype=np.int64)
    )
    sets = [a, b, a, b, a]
    for i in range(5):
        ref = score_text(texts[i], list(sets[i]), 2, 0.2)
        assert out.iloc[i].top_prediction == ref["top_prediction"]
        assert out.iloc[i].top_confidence == ref["top_confidence"]


def test_factory_udf_matches_generic_udf_on_spark(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["spark join spark", "class0007 class0007 filter", "", None, "the a of"]
        )],
        "doc_id long, text string",
    )
    for labels, k, thr in [(["spark", "join", "filter"], 2, 0.3), (DOC_LABELS_1K, 3, 0.0)]:
        lab_col = F.array(*[F.lit(l) for l in labels])
        generic = docs.select(
            "doc_id", classify_udf("text", lab_col, F.lit(k), F.lit(thr)).alias("r")
        )
        factory = docs.select(
            "doc_id", make_classify_udf(labels, k, thr)("text").alias("r")
        )
        g = {r["doc_id"]: r["r"] for r in generic.collect()}
        f = {r["doc_id"]: r["r"] for r in factory.collect()}
        assert g == f


def test_conv_summaries_all_failed_conversation_has_empty_map(spark):
    from distributed_classification_system_spark.operators.sessionize import conv_summaries

    turns = spark.createDataFrame(
        [
            ("c1", 0, "2025-01-01 00:00:00", "m", "spark", 0.05, "empty_text"),
            ("c1", 1, "2025-01-01 00:00:01", "m", "spark", 0.05, "null_ts"),
            ("c2", 0, "2025-01-01 00:00:00", "m", "spark", 0.05, None),
        ],
        "conv_id string, turn_idx int, ts string, model_used string,"
        " top_prediction string, processing_time_ms double, error_reason string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    config = spark.createDataFrame([("c1", 2), ("c2", 1)], "conv_id string, n_turns int")
    rows = {r["conv_id"]: r for r in conv_summaries(turns, config).collect()}
    assert rows["c1"]["grouped_by_label"] == {}  # empty map, not null
    assert rows["c1"]["failed"] == 2 and rows["c1"]["status"] == "completed"
    assert rows["c2"]["grouped_by_label"] == {"spark": ["turn-00000"]}
