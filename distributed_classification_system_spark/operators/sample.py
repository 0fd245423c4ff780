"""Sampling / packing / chunking operators for training-data curation.

Beyond the reference's query surface (like operators/dedup.py), these are
the table-shaping steps a large-scale pretraining pipeline runs between
dedup and tokenization:

- stratified_sample: deterministic per-stratum rate sampling via a
  portable content hash — reproducible data mixes without a shuffle or a
  random number generator (re-running the pipeline keeps the same rows).
- pack_sequences: lay documents head-to-tail per stratum and bin them by
  token offset into fixed-budget packs (pure Catalyst, one window scan).
- pack_sequences_greedy: true greedy first-fit packing with a hard
  per-pack token budget (applyInPandas — the accumulator-reset scan is
  inherently sequential per stratum, but strata pack independently).
- chunk_documents: context-window chunking with overlap (posexplode over
  a computed chunk count — pure Catalyst, no Python).

Scale notes (100 TB): stratified_sample is a stateless filter — no
shuffle, full scan parallelism. pack_sequences shuffles once on the
stratum key and scans each stratum with one window; strata are the unit
of parallelism (pack across sources, never globally — a global ORDER BY
would serialize the corpus through one task). chunk_documents is a
flatMap — output rows carry chunk hashes + counts, never duplicated text,
so the explode multiplies row count, not byte volume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_classification_system_spark.functions.text import token_count


def _n_tok_safe() -> Column:
    """Token count with NULL text pinned to 0 on BOTH engines. Spark's
    ``size(split(NULL))`` is NULL/-1 depending on legacy config, and a
    NULL n_tok silently poisons every running-sum/accumulator downstream
    (a NULL propagates through the whole stratum's offsets). The DuckDB
    oracles mirror this with ``coalesce(len(string_split(text,' ')), 0)``."""
    return F.when(F.col("text").isNull(), F.lit(0)).otherwise(token_count())


def _portable_bucket(key: Column, buckets: int = 10_000) -> Column:
    """Deterministic uniform bucket in [0, buckets): first 8 hex digits of
    md5, mod buckets. Bit-identical in DuckDB:
    ``('0x' || substr(md5(k), 1, 8))::BIGINT % buckets``."""
    return F.pmod(
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long"), F.lit(buckets)
    )


def stratified_sample(
    documents: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Per-language rate sampling: keep a doc iff its hash bucket falls
    below ``rates[lang] * buckets``. Content-hash-deterministic — the same
    doc_id is kept or dropped on every run, every cluster size, with no
    RNG state — which is what makes training-data mixes reproducible and
    incrementally extendable (new data changes nothing for old rows).
    A stateless filter: no shuffle, prunes to (doc_id, lang, n_chars)."""
    rate_col = None
    for lang, rate in sorted(rates.items()):
        cond = F.col("lang") == lang
        rate_col = (
            F.when(cond, F.lit(rate))
            if rate_col is None
            else rate_col.when(cond, F.lit(rate))
        )
    rate_col = (
        rate_col.otherwise(F.lit(default_rate)) if rate_col is not None else F.lit(default_rate)
    )
    bucket = _portable_bucket(F.concat(F.lit("strat|"), F.col("doc_id").cast("string")), buckets)
    return (
        documents.select("doc_id", "lang", "n_chars", bucket.alias("bucket"))
        .filter(F.col("bucket") < (rate_col * buckets).cast("long"))
        .select("doc_id", "lang", "n_chars", "bucket")
    )


def pack_sequences(documents: DataFrame, budget_tokens: int = 512) -> DataFrame:
    """Offset-binning sequence packing: per stratum (``source``), lay docs
    head-to-tail in doc_id order and assign pack = token_offset // budget.

    Semantics (deliberately SQL-exact): a doc belongs to the pack its
    FIRST token lands in, so a pack's token span is ≤ budget + the one
    straddling doc — the standard concat-then-split pretraining layout
    (documents are concatenated and the stream is cut every ``budget``
    tokens; the cut doc continues in the next pack). For a hard ≤ budget
    guarantee per pack use pack_sequences_greedy. One shuffle (stratum
    key), one window scan per stratum."""
    w = F.sum("n_tok").over(
        Window.partitionBy("source").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    )
    base = documents.select("doc_id", "source", _n_tok_safe().alias("n_tok"))
    return base.select(
        "doc_id",
        "source",
        "n_tok",
        F.coalesce(w, F.lit(0)).alias("start_offset"),
    ).select(
        "doc_id",
        "source",
        "n_tok",
        (F.col("start_offset") / budget_tokens).cast("long").alias("pack_id"),
        F.col("start_offset").cast("long").alias("start_offset"),
    )


_GREEDY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("pack_id", T.LongType()),
        T.StructField("pack_fill", T.IntegerType()),
    ]
)


def pack_sequences_greedy(documents: DataFrame, budget_tokens: int = 512) -> DataFrame:
    """True greedy next-fit packing with a HARD per-pack budget: walk each
    stratum in doc_id order, close the pack when the next doc would
    overflow (docs longer than the budget get a pack of their own). The
    accumulator reset makes this a sequential scan — not a window
    function — so it runs as one applyInPandas pass per stratum; strata
    pack in parallel and the pandas loop is per-doc within one stratum
    (thousands, not billions). ``pack_fill`` is the pack's running token
    total at this doc (audit column: max(pack_fill) per pack ≤ budget
    unless the pack is a single over-budget doc)."""
    base = documents.select("doc_id", "source", _n_tok_safe().alias("n_tok"))

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        n_tok = pdf["n_tok"].to_numpy(dtype=np.int64)
        pack = np.zeros(len(pdf), dtype=np.int64)
        fill = np.zeros(len(pdf), dtype=np.int64)
        cur_pack, cur_fill = 0, 0
        for i, t in enumerate(n_tok):
            if cur_fill > 0 and cur_fill + t > budget_tokens:
                cur_pack += 1
                cur_fill = 0
            cur_fill += int(t)
            pack[i] = cur_pack
            fill[i] = cur_fill
        return pdf.assign(pack_id=pack, pack_fill=fill.astype(np.int32))

    return base.groupBy("source").applyInPandas(_pack, _GREEDY_SCHEMA)


def chunk_documents(
    documents: DataFrame, max_tokens: int = 64, overlap: int = 16
) -> DataFrame:
    """Context-window chunking: split each doc's token stream into windows
    of ``max_tokens`` advancing by ``max_tokens - overlap`` (the standard
    embedding/RAG pre-pass). Final partial window is kept. Output carries
    the chunk's md5 and token count, NOT the chunk text — the explode
    multiplies rows, never bytes. Pure Catalyst: slice + posexplode."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toks = F.split(F.lower(F.col("text")), " ")
    n_tok = F.size(toks)
    # number of windows: 1 + ceil(max(0, n_tok - max_tokens) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(F.lit(0), n_tok - max_tokens).cast("double") / stride
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * stride + 1, max_tokens)),
    )
    return (
        documents.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            "doc_id",
            "chunk_idx",
            F.size(F.split(F.col("chunk"), " ")).alias("chunk_tokens"),
            F.md5(F.col("chunk")).alias("chunk_md5"),
        )
    )
