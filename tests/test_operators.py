"""Operator semantics tests beyond the DuckDB parity gate: properties the
SQL oracle can't express (similarity sanity, interpolation math, simhash
locality)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from distributed_classification_system_spark.operators import ann, dedup, interp
from distributed_classification_system_spark.schemas import TRANSCRIPTS


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_interp_linear_midpoint(spark):
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:30", "cpu", 10.0),
            (2, "2024-01-01 00:02:30", "cpu", 30.0),
        ],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.grid_ts.isoformat(): r.value_interp
           for r in interp.interpolate_series(events).collect()}
    # grid minutes 00:01 and 00:02, linear between (00:00:30, 10) and (00:02:30, 30)
    assert out["2024-01-01T00:01:00"] == 10.0 + 20.0 * (30 / 120)
    assert out["2024-01-01T00:02:00"] == 10.0 + 20.0 * (90 / 120)


def test_interp_exact_point_passthrough(spark):
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:01:00", "cpu", 5.0),
            (2, "2024-01-01 00:03:00", "cpu", 9.0),
        ],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.grid_ts.isoformat(): r.value_interp
           for r in interp.interpolate_series(events).collect()}
    assert out["2024-01-01T00:01:00"] == 5.0
    assert out["2024-01-01T00:03:00"] == 9.0
    assert out["2024-01-01T00:02:00"] == 7.0


def test_simhash_locality(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    near = base.replace("lazy", "sleepy", 1)  # single-token edit
    far = "completely different content about spark engines and queries " * 4
    docs = _docs(spark, [base, near, far])
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_near_dups(docs, max_hamming=16).collect()
    }
    assert (0, 1) in pairs  # near-dup detected
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_exact_dedup_survivor(spark):
    docs = _docs(spark, ["aaa", "bbb", "aaa", "ccc", "bbb"])
    out = {r.keep_id: r.n_copies for r in dedup.exact_dedup(docs).collect()}
    assert out == {0: 2, 1: 2, 3: 1}


def test_jaccard_self_similarity(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(spark, [text, text, "unrelated words entirely here now friend ok"])
    pairs = {(r.doc_a, r.doc_b): r.jaccard
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.0).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) not in pairs


def test_ann_bruteforce_sanity(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = ann.brute_force_topk(emb, n_queries=3, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rnk, r.neighbor_id))
    assert set(by_q) == {0, 1, 2}
    for q, lst in by_q.items():
        assert sorted(r for r, _ in lst) == [1, 2, 3, 4, 5]
        assert all(n != q for _, n in lst)  # self excluded


def test_ann_ivf_subset_of_cell(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned = ann.ivf_assign(emb, n_cells=8)
    cells = {r.vec_id: r.cell for r in assigned.collect()}
    out = ann.ivf_topk(emb, n_queries=3, k=5, n_cells=8).collect()
    for r in out:
        assert cells[r.neighbor_id] == cells[r.query_id]  # pruned search space


def test_rolling_fingerprint_shift_invariance(spark):
    from distributed_classification_system_spark.functions.text import rolling_fingerprints

    a = "one two three four five six seven eight nine ten"
    b = "zzz " + a  # shifted by one token: shares most 8-token windows
    docs = _docs(spark, [a, b])
    fp = rolling_fingerprints(docs, window=8)
    shared = (
        fp.groupBy("chunk_hash").agg(F.countDistinct("doc_id").alias("n"))
        .filter("n = 2").count()
    )
    assert shared >= 2  # common windows detected despite the shift


def test_simhash_matches_scalar_reference(spark):
    """The vectorized fingerprint must equal an independent per-token
    scalar implementation (hash-exactness; the DuckDB twin in
    __spark_entry__.oracle_sql()['simhash_near_dups'] checks the same
    md5-64 hash end to end through the banded join)."""
    import hashlib

    import numpy as np
    from pyspark.sql import functions as F

    from distributed_classification_system_spark.operators.dedup import simhash64

    def scalar_simhash(txt: str | None) -> int:
        tokens = (txt or "").lower().split(" ")
        if not tokens:
            return 0
        votes = np.zeros(64, dtype=np.int64)
        for t in tokens:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        sh = sum(1 << b for b in range(64) if votes[b] > 0)
        return sh - (1 << 64) if sh >= 1 << 63 else sh

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    got = {r.doc_id: r.sh for r in docs.select("doc_id", simhash64("text").alias("sh")).collect()}
    want = {r.doc_id: scalar_simhash(r.text) for r in docs.collect()}
    assert got == want


def _chain_docs(spark, n: int):
    """Near-dup CHAIN of n docs: doc i = u_i×4 then u_{i+1}×4, so adjacent
    docs share exactly one 3-shingle (jaccard 1/7 ≈ 0.143) and non-adjacent
    docs share none — component diameter = n-1."""
    rows = [(i, " ".join([f"w{i:04d}"] * 4 + [f"w{i + 1:04d}"] * 4)) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_near_dup_clusters_pointer_jumping_converges_on_long_chain(spark):
    """A 40-hop dup chain needs ~39 rounds under plain neighbor-min
    propagation; pointer jumping (labels propagate through labels) must
    collapse it within the default 12-round budget."""
    docs = _chain_docs(spark, 40)
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.near_dup_clusters(docs, threshold=0.1).collect()
    }
    assert got == {i: 0 for i in range(40)}


def test_near_dup_clusters_raises_when_round_budget_exhausted(spark):
    """Exhausting max_iter with labels still moving must raise — a
    silently-unconverged labeling splits real dup chains."""
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.near_dup_clusters(_chain_docs(spark, 40), threshold=0.1, max_iter=2)
