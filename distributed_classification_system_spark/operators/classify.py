"""Batch/micro-batch classification stage.

Re-expresses the reference's fan-out → queue → worker → classify path
(SURVEY.md §3.1 steps 3-5; backend-service/handlers/handlers.go:95-126,
ml-service/sqs_worker.py:142-174, ml-service/controllers/
classification_controller.py:60-106) as one declarative plan:

    transcripts ⋈ conv_config (equi, co-partitioned on conv_id)
                ⋈ broadcast(label_registry) (stream-static dim join, K7/J3)
                → [optional salted repartition — skew defense, T10]
                → vectorized kernel (classify_udf / classify_expr)

Scale notes (100 TB):
- conv_config is keyed by conv_id like the downstream session fold, so
  Catalyst reuses the same hash partitioning across join → groupBy — one
  shuffle, not two.
- the registry is tiny (one row per job_type) → broadcast, no shuffle.
- a hot conv_id (10^5 turns in one conversation) would serialize one task
  in the *stateless* kernel stage if rows stayed partitioned by conv_id;
  ``salt_buckets`` spreads each conversation over that many buckets before
  the UDF runs. The keyed fold re-gathers by conv_id afterwards
  (reference anti-pattern being fixed: global mutex serializing ALL jobs,
  backend-service/handlers/handlers.go:28,219-221).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from distributed_classification_system_spark.functions.kernel import classify_expr, classify_udf


DOC_LABELS = ["spark", "query", "join", "filter", "window"]

# K2 at the surveyed vocabulary scale (SURVEY §2.3; ref ImageNet-1000,
# ml-service/models/mobilenet_model.py:17-49): the 5 real document labels
# padded to exactly 1000 with deterministic synthetic classes. The kernel
# cost is O(labels) per row — `classify_docs_1k` grades correctness at
# this width and the bench line prices it.
DOC_LABELS_1K = sorted(set(DOC_LABELS) | {f"class{i:04d}" for i in range(995)})
assert len(DOC_LABELS_1K) == 1000

# classify_expr Column templates per (labels, top_k, threshold) — see
# classify_documents
_EXPR_CACHE: dict[tuple, "F.Column"] = {}


def classify_documents(
    documents: DataFrame,
    labels: list[str] | None = None,
    top_k: int = 3,
    threshold: float = 0.25,
    use_expr: bool = False,
) -> DataFrame:
    """The classification kernel applied to the driver's documents table
    with a fixed config — the oracle-checkable form of the kernel (same
    code path as the transcript pipeline, DuckDB-replicable semantics).

    Returns flat columns; all_predictions is flattened to a label CSV so
    the oracle hash never depends on nested-type encodings."""
    labels = labels or DOC_LABELS
    par = documents.sparkSession.sparkContext.defaultParallelism
    documents = documents.repartition(par)
    if use_expr:
        # memoized: the Catalyst expression tree is hundreds of py4j calls
        # to build; Column objects are immutable templates, safe to reuse
        key = (tuple(labels), top_k, threshold)
        res = _EXPR_CACHE.get(key)
        if res is None:
            lab_col = F.array(*[F.lit(l) for l in labels])
            res = classify_expr(F.col("text"), lab_col, F.lit(top_k), F.lit(threshold))
            _EXPR_CACHE[key] = res
    else:
        # constant-config factory: the label set never crosses the Python
        # boundary per row (guide §4.1 — at 1000 labels the lit-array
        # column was 1000 strings/row through Arrow for zero information)
        from distributed_classification_system_spark.functions.kernel import make_classify_udf

        res = make_classify_udf(labels, top_k, threshold)(F.col("text"))
    return documents.select("doc_id", "lang", res.alias("r")).select(
        "doc_id",
        "lang",
        "r.top_prediction",
        "r.top_confidence",
        F.concat_ws(",", F.transform("r.all_predictions", lambda p: p["label"])).alias("pred_labels"),
        "r.reason",
        "r.processing_time_ms",
    )


def classify_turns(
    transcripts: DataFrame,
    conv_config: DataFrame,
    registry: DataFrame,
    use_expr: bool = False,
    salt_buckets: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Classify every turn; returns the TURN_RESULTS columns minus lineage.

    ``use_expr=True`` switches to the pure-Catalyst kernel (same output),
    ``salt_buckets`` enables the hot-conversation salting repartition.
    """
    df = transcripts.join(conv_config.select("conv_id", "job_type", "top_k", "confidence_threshold"), "conv_id")
    df = df.join(F.broadcast(registry.select("job_type", "model_name", "labels")), "job_type")

    if salt_buckets:
        salt = F.pmod(F.xxhash64("turn_idx"), F.lit(salt_buckets))
        parts = [num_partitions] if num_partitions else []
        df = df.repartition(*parts, F.col("conv_id"), salt)

    if use_expr:
        res = classify_expr(
            F.col("text"), F.col("labels"), F.col("top_k"), F.col("confidence_threshold")
        )
    else:
        res = classify_udf(
            F.col("text"), F.col("labels"), F.col("top_k"), F.col("confidence_threshold")
        )

    return df.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
        F.col("model_name").alias("model_used"),
        res.alias("r"),
    ).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
        "model_used",
        "r.top_prediction",
        "r.top_confidence",
        "r.all_predictions",
        "r.reason",
        "r.processing_time_ms",
    )
