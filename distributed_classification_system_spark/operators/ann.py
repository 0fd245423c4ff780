"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — correct, O(Q·N), fine when the query
side is small and broadcastable. Scale path: IVF-style partition pruning —
assign every vector to its nearest centroid once, then search only the
query's probe cells, turning O(Q·N) into O(Q·N/cells·nprobe).

Dot products run JVM-side via ``zip_with``/``aggregate`` (whole-stage
codegen, no Python); a vectorized numpy path exists for wide batches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 5
) -> DataFrame:
    """Exact cosine top-k: the first ``n_queries`` vectors query the corpus.

    The query side is broadcast (tiny), so the corpus never shuffles —
    at 100 TB the scan streams once through the executors."""
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    embeddings = embeddings.repartition(par)
    q = embeddings.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    pairs = embeddings.alias("c").join(
        F.broadcast(q), F.col("c.vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("c.vec_id").alias("neighbor_id"),
        cosine(F.col("q_emb"), F.col("c.embedding")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= k)
    )


def _cell_ranks(embeddings: DataFrame, n_cells: int = 16) -> DataFrame:
    """Every vector's cells ranked by centroid similarity (rn=1 is its
    home cell; rn≤nprobe are its probe cells). Centroids = first
    ``n_cells`` corpus vectors (deterministic k-means-seeding stand-in,
    oracle-portable). One broadcast join + window."""
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    embeddings = embeddings.repartition(par)
    cents = (
        embeddings.filter(F.col("vec_id") < n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb"))
    )
    scored = embeddings.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "cell",
        cosine(F.col("embedding"), F.col("c_emb")).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cell"))
    return scored.select(
        "vec_id", "embedding", "cell", F.row_number().over(w).alias("rn")
    )


def ivf_assign(embeddings: DataFrame, n_cells: int = 16) -> DataFrame:
    """IVF coarse quantizer: argmax cell per vector (adds a `cell` column)."""
    return _cell_ranks(embeddings, n_cells).filter(F.col("rn") == 1).drop("rn")


def embedding_near_dups(
    embeddings: DataFrame, threshold: float = 0.35, n_cells: int = 8
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with IVF cell blocking: only
    vectors assigned to the same coarse cell are compared (the candidate
    space drops from O(N²) to O(N²/cells) — at corpus scale, cells are
    also the partition key so comparisons never cross executors).
    Cosines are computed in double (cast once) for engine portability."""
    emb = embeddings.withColumn("embedding", F.col("embedding").cast("array<double>"))
    assigned = ivf_assign(emb, n_cells)
    pairs = (
        assigned.alias("a")
        .join(assigned.alias("b"), "cell")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos"),
        )
    )
    return pairs.filter(F.col("cos") >= threshold).select("vec_a", "vec_b")


def ivf_topk_multiprobe(
    embeddings: DataFrame,
    n_queries: int = 5,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
) -> DataFrame:
    """ANN top-k with multi-probe IVF: each query searches its ``nprobe``
    closest cells — the standard recall/cost dial (nprobe=1 misses
    neighbors that straddle a cell boundary; nprobe=cells is brute
    force). Cost is O(Q·N/cells·nprobe); the corpus side still never
    shuffles (probe cells broadcast with the query)."""
    ranks = _cell_ranks(embeddings, n_cells)
    assigned = ranks.filter(F.col("rn") == 1).select("vec_id", "embedding", "cell")
    q = ranks.filter((F.col("vec_id") < n_queries) & (F.col("rn") <= nprobe)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cell"),
    )
    pairs = assigned.alias("c").join(F.broadcast(q), "cell").filter(
        F.col("c.vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("c.vec_id").alias("neighbor_id"),
        cosine(F.col("q_emb"), F.col("c.embedding")).alias("cos"),
    ).dropDuplicates(["query_id", "neighbor_id"])  # neighbor reachable via 2 probes
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= k)
    )


def ivf_topk(
    embeddings: DataFrame, n_queries: int = 5, k: int = 5, n_cells: int = 16
) -> DataFrame:
    """ANN top-k with IVF pruning (nprobe=1): only the query's own cell is
    searched. At scale the assignment is precomputed and the corpus is
    partitioned by cell → partition pruning on the scan."""
    assigned = ivf_assign(embeddings, n_cells)
    q = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cell"),
    )
    pairs = assigned.alias("c").join(F.broadcast(q), "cell").filter(
        F.col("c.vec_id") != F.col("query_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("c.vec_id").alias("neighbor_id"),
        cosine(F.col("q_emb"), F.col("c.embedding")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= k)
    )
