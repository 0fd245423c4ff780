"""Sampling / packing / chunking operators (training-data curation).

The oracled trio (stratified_sample, pack_sequences, chunk_documents) is
also hash-checked against DuckDB by tests/test_oracle_parity.py; these
tests pin the SEMANTIC invariants the hashes can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_classification_system_spark.operators import sample

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_stratified_sample_deterministic_and_monotone(spark):
    """Same rows on every run; raising a stratum's rate only ADDS rows
    (hash-bucket sampling is nested by construction — the property that
    makes data mixes extendable without resampling old rows)."""
    docs = _docs(spark)
    lo = sample.stratified_sample(docs, {"en": 0.25, "de": 0.5})
    hi = sample.stratified_sample(docs, {"en": 0.5, "de": 0.5})
    lo_ids = {r.doc_id for r in lo.collect()}
    lo_ids2 = {r.doc_id for r in lo.collect()}
    hi_ids = {r.doc_id for r in hi.collect()}
    assert lo_ids == lo_ids2
    assert lo_ids <= hi_ids
    # unmentioned strata default to rate 0
    assert lo.filter(~F.col("lang").isin("en", "de")).count() == 0


def test_stratified_sample_rate_is_approximately_honored(spark):
    docs = _docs(spark)
    n_en = docs.filter(F.col("lang") == "en").count()
    got = sample.stratified_sample(docs, {"en": 0.5}).count()
    assert n_en > 20
    assert abs(got / n_en - 0.5) < 0.2  # md5 buckets are uniform


def test_pack_sequences_offsets_are_contiguous_per_stratum(spark):
    """start_offset must equal the running token total in doc_id order
    within each source, and pack_id must be start_offset // budget."""
    out = sample.pack_sequences(_docs(spark), budget_tokens=512).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src) > 1
    for rows in by_src.values():
        rows.sort(key=lambda r: r.doc_id)
        run = 0
        for r in rows:
            assert r.start_offset == run
            assert r.pack_id == run // 512
            run += r.n_tok


def test_pack_greedy_hard_budget_and_matches_scalar_reference(spark):
    budget = 300
    out = sample.pack_sequences_greedy(_docs(spark), budget_tokens=budget).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for rows in by_src.values():
        rows.sort(key=lambda r: r.doc_id)
        # scalar reference: greedy next-fit in doc_id order
        cur_pack, cur_fill = 0, 0
        packs: dict[int, int] = {}
        for r in rows:
            if cur_fill > 0 and cur_fill + r.n_tok > budget:
                cur_pack, cur_fill = cur_pack + 1, 0
            cur_fill += r.n_tok
            assert (r.pack_id, r.pack_fill) == (cur_pack, cur_fill), r
            packs[cur_pack] = cur_fill
        # hard budget: a pack exceeds it only as a single over-budget doc
        counts: dict[int, int] = {}
        for r in rows:
            counts[r.pack_id] = counts.get(r.pack_id, 0) + 1
        for p, fill in packs.items():
            assert fill <= budget or counts[p] == 1


def test_pack_greedy_partitioning_invariance(spark):
    """Greedy packing must not depend on the physical partitioning of the
    input (applyInPandas re-gathers each stratum)."""
    docs = _docs(spark)
    a = sorted(map(tuple, sample.pack_sequences_greedy(docs).collect()))
    b = sorted(map(tuple, sample.pack_sequences_greedy(docs.repartition(13)).collect()))
    assert a == b


def test_chunk_documents_covers_stream_with_overlap(spark):
    """Chunk boundaries: stride = max_tokens - overlap; every chunk except
    the last has exactly max_tokens tokens; reassembling chunk starts
    reproduces the token stream length."""
    max_t, ov = 64, 16
    docs = _docs(spark).filter(F.col("doc_id") < 40)
    toks = {r.doc_id: r.text.lower().split(" ") for r in docs.collect()}
    out = sample.chunk_documents(docs, max_tokens=max_t, overlap=ov).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(toks)
    stride = max_t - ov
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        n = len(toks[doc_id])
        expect_chunks = 1 + max(0, -(-(n - max_t) // stride)) if n > max_t else 1
        assert len(rows) == expect_chunks
        for r in rows:
            start = r.chunk_idx * stride
            assert r.chunk_tokens == min(max_t, n - start)


def test_chunk_documents_short_doc_single_chunk(spark):
    docs = _docs(spark).sparkSession.createDataFrame(
        [(1, "a b c")], "doc_id long, text string"
    )
    rows = sample.chunk_documents(docs, max_tokens=64, overlap=16).collect()
    assert len(rows) == 1 and rows[0].chunk_tokens == 3


def test_chunk_documents_rejects_bad_overlap(spark):
    with pytest.raises(ValueError):
        sample.chunk_documents(_docs(spark), max_tokens=8, overlap=8)


def test_pack_null_text_parity_both_engines(spark, tmp_path):
    """NULL text must not poison pack offsets (r4 ADVICE): DuckDB's
    len(string_split(NULL)) is NULL and Spark's size(split(NULL)) is
    NULL/-1 — unguarded, either propagates through the running sum and
    corrupts pack_id/fill for every LATER doc in the same source. Both
    engines now pin n_tok(NULL text) = 0; this differential test runs the
    real oracle SQL against the real operators on a fixture WITH nulls."""
    import duckdb

    import __spark_entry__ as E

    rows = [
        (1, "s1", "a b c"),
        (2, "s1", None),  # mid-source null: later docs 3.. must stay sane
        (3, "s1", "d e"),
        (4, "s2", None),  # source-leading null
        (5, "s2", "x y z w"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    p = str(tmp_path / "documents.parquet")
    docs.write.parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")
    oracles = E.oracle_sql()

    def canon(df):
        cols = sorted(df.columns)
        return sorted(
            "|".join("∅" if v is None or v != v else str(int(v)) if isinstance(v, (int, float)) and float(v).is_integer() else str(v) for v in rec)
            for rec in df[cols].astype(object).itertuples(index=False)
        )

    for name, fn in (
        ("pack_sequences", sample.pack_sequences),
        ("pack_greedy", sample.pack_sequences_greedy),
    ):
        got = canon(fn(docs).toPandas())
        want = canon(con.execute(oracles[name]).df())
        assert got == want, f"{name} diverged on null text:\n{got}\nvs\n{want}"
        # and no NULL/negative token counts leaked through
        assert not any("∅" in r or "|-1|" in r for r in got), got
