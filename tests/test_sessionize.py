"""Batch session fold tests (SURVEY.md §2.4 A1-A7)."""

from __future__ import annotations

from distributed_classification_system_spark.operators.classify import classify_turns
from distributed_classification_system_spark.operators.sessionize import conv_summaries
from distributed_classification_system_spark.plans.flagship import flagship
from distributed_classification_system_spark.sources.gen import (
    gen_conv_config,
    gen_label_registry,
    gen_transcripts,
)

N = 60


def _pipeline(spark, **kw):
    t = gen_transcripts(spark, N, **kw)
    cfg = gen_conv_config(spark, N, **kw)
    reg = gen_label_registry(spark)
    return classify_turns(t, cfg, reg), cfg


def test_counters_consistent(spark):
    turns, cfg = _pipeline(spark)
    out = conv_summaries(turns, cfg).collect()
    assert len(out) == N
    for r in out:
        assert r.classified + r.unknown == r.total
        assert r.status == "completed"  # batch sees every turn
        grouped_total = sum(len(v) for v in r.grouped_by_label.values())
        assert grouped_total == r.total
        assert r.unknown == len(r.grouped_by_label.get("unknown", []))


def test_dedup_idempotency(spark):
    """A2: re-delivered rows must not change the aggregate (reference dedups
    by S3Key, handlers.go:247-256; SQS is at-least-once)."""
    turns, cfg = _pipeline(spark)
    dup = turns.unionAll(turns.sample(0.2, seed=7))
    base = {r.conv_id: r for r in conv_summaries(turns, cfg).collect()}
    withdup = {r.conv_id: r for r in conv_summaries(dup, cfg).collect()}
    assert base.keys() == withdup.keys()
    for k in base:
        assert base[k].total == withdup[k].total
        assert base[k].grouped_by_label == withdup[k].grouped_by_label


def test_label_grouping_stable_order(spark):
    turns, cfg = _pipeline(spark)
    out = conv_summaries(turns, cfg).collect()
    for r in out:
        for names in r.grouped_by_label.values():
            assert names == sorted(names)  # turn-%05d sorts by turn_idx


def test_completion_detection_partial(spark):
    """A5: missing turns leave the conversation 'processing' (reference
    handlers.go:291-299 — job completes only when all items arrived)."""
    turns, cfg = _pipeline(spark)
    partial = turns.filter("turn_idx < 2")
    out = {r.conv_id: r.status for r in conv_summaries(partial, cfg).collect()}
    ntr = {r.conv_id: r.n_turns for r in cfg.collect()}
    for conv, status in out.items():
        assert status == ("completed" if ntr[conv] <= 2 else "processing")


def test_flagship_smoke(spark):
    out = flagship(spark, 0.001)
    rows = out.limit(5).collect()
    assert rows and rows[0].conv_id == "conv-00000000"
