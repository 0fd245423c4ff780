"""Kernel tests: scalar oracle ≡ pandas UDF ≡ Catalyst expression; edge
cases for top-k, thresholds, ties (SURVEY.md §2.3)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from distributed_classification_system_spark.functions.kernel import (
    classify_expr,
    classify_udf,
    score_text,
)
from distributed_classification_system_spark.operators.classify import classify_turns
from distributed_classification_system_spark.sources.gen import (
    gen_conv_config,
    gen_label_registry,
    gen_transcripts,
)

LABELS = ["dog", "cat", "bird", "car", "person"]


def test_scalar_semantics():
    r = score_text("dog dog cat the a", LABELS, top_k=3, threshold=0.3)
    # counts: dog=2 cat=1; denom = 5 + 3 = 8
    assert r["top_prediction"] == "dog"
    assert r["top_confidence"] == 3 / 8
    assert [p["label"] for p in r["all_predictions"]] == ["dog", "cat", "bird"]
    assert [p["score"] for p in r["all_predictions"]] == [3 / 8, 2 / 8, 1 / 8]
    assert r["reason"] is None
    assert r["processing_time_ms"] == 5 * 0.05


def test_threshold_relabel_keeps_confidence():
    # reference keeps the original confidence on relabel
    # (ml-service/controllers/classification_controller.py:87-96)
    r = score_text("the a of", LABELS, top_k=2, threshold=0.5)
    assert r["top_prediction"] == "unknown"
    assert r["top_confidence"] == 1 / 5
    assert r["reason"] == "low_confidence"


def test_tie_break_label_asc():
    r = score_text("no markers here", LABELS, top_k=5, threshold=0.0)
    assert [p["label"] for p in r["all_predictions"]] == sorted(LABELS)


def test_top_k_bounds():
    assert len(score_text("x", LABELS, 1, 0.0)["all_predictions"]) == 1
    assert len(score_text("x", LABELS, 10, 0.0)["all_predictions"]) == 5  # capped at vocab
    assert len(score_text("x", LABELS, 0, 0.0)["all_predictions"]) == 1  # floor 1


def _as_dict(row):
    return {
        "top_prediction": row.top_prediction,
        "top_confidence": row.top_confidence,
        "all_predictions": [{"label": p.label, "score": p.score} for p in row.all_predictions],
        "reason": row.reason,
        "processing_time_ms": row.processing_time_ms,
    }


def test_udf_and_expr_match_scalar_oracle(spark):
    """All three implementations produce bit-identical results on a real
    generated corpus with varying label sets / top_k / thresholds."""
    t = gen_transcripts(spark, 40)
    cfg = gen_conv_config(spark, 40)
    reg = gen_label_registry(spark)
    joined = (
        t.join(cfg, "conv_id")
        .join(F.broadcast(reg), "job_type")
        .select("conv_id", "turn_idx", "text", "labels", "top_k", "confidence_threshold")
    )
    udf_res = joined.select(
        "conv_id",
        "turn_idx",
        "text",
        "labels",
        "top_k",
        "confidence_threshold",
        classify_udf("text", "labels", "top_k", "confidence_threshold").alias("r"),
    ).collect()
    expr_res = {
        (r.conv_id, r.turn_idx): r.r
        for r in joined.select(
            "conv_id",
            "turn_idx",
            classify_expr(
                F.col("text"), F.col("labels"), F.col("top_k"), F.col("confidence_threshold")
            ).alias("r"),
        ).collect()
    }
    assert len(udf_res) > 100
    for row in udf_res:
        oracle = score_text(row.text, list(row.labels), row.top_k, row.confidence_threshold)
        got_udf = _as_dict(row.r)
        got_expr = _as_dict(expr_res[(row.conv_id, row.turn_idx)])
        assert got_udf == oracle, (row.conv_id, row.turn_idx)
        assert got_expr == oracle, (row.conv_id, row.turn_idx)
        # exact float equality is intentional: single-division scores
        assert not any(math.isnan(p["score"]) for p in got_udf["all_predictions"])


def test_kernel_at_1000_label_vocabulary(spark):
    """K2 at the surveyed scale (ref ImageNet-1000): the vectorized kernel
    with a 1000-label registry row matches the scalar oracle bit-for-bit,
    and the real marker labels still win over the synthetic padding."""
    from distributed_classification_system_spark.sources.gen import IMAGE_LABELS_1K

    t = gen_transcripts(spark, 12)
    rows = t.filter(F.col("turn_idx") < 4).select("conv_id", "turn_idx", "text").collect()
    assert len(rows) > 20
    res = {
        (r.conv_id, r.turn_idx): r.r
        for r in t.filter(F.col("turn_idx") < 4).select(
            "conv_id",
            "turn_idx",
            classify_udf(
                "text",
                F.array(*[F.lit(l) for l in IMAGE_LABELS_1K]),
                F.lit(3),
                F.lit(0.0),
            ).alias("r"),
        ).collect()
    }
    hits = 0
    for r in rows:
        oracle = score_text(r.text, IMAGE_LABELS_1K, 3, 0.0)
        assert _as_dict(res[(r.conv_id, r.turn_idx)]) == oracle, (r.conv_id, r.turn_idx)
        # at V=1000 the top score is ~c/(1000+c) — always below 0.25, which
        # is why the 1k queries run with threshold 0
        assert oracle["top_confidence"] < 0.25
        if not oracle["top_prediction"].startswith("class"):
            hits += 1
    assert hits > 0  # bias markers beat the synthetic padding somewhere


def test_classify_turns_salting_invariance(spark):
    """Salted and unsalted plans must return identical rows (T10)."""
    t = gen_transcripts(spark, 30, n_hot=1, hot_turns=200)
    cfg = gen_conv_config(spark, 30, n_hot=1, hot_turns=200)
    reg = gen_label_registry(spark)
    base = classify_turns(t, cfg, reg).orderBy("conv_id", "turn_idx").collect()
    salted = (
        classify_turns(t, cfg, reg, salt_buckets=8)
        .orderBy("conv_id", "turn_idx")
        .collect()
    )
    assert base == salted


def test_per_turn_text_equality_under_stable_ordering(spark):
    """The BASELINE.json row invariant: classify output carries `text`
    unchanged, keyed and ordered by (conv_id, turn_idx)."""
    t = gen_transcripts(spark, 25)
    cfg = gen_conv_config(spark, 25)
    reg = gen_label_registry(spark)
    out = classify_turns(t, cfg, reg).orderBy("conv_id", "turn_idx").collect()
    src = t.orderBy("conv_id", "turn_idx").collect()
    assert [(r.conv_id, r.turn_idx, r.text) for r in out] == [
        (r.conv_id, r.turn_idx, r.text) for r in src
    ]
