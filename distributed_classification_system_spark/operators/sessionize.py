"""Batch session fold: per-conversation aggregate over classified turns.

Re-expresses the reference's keyed incremental job fold (SURVEY.md §2.4
A1-A7; backend-service/handlers/handlers.go:231-304):

- A2 idempotency dedup — ``dropDuplicates(conv_id, turn_idx)`` replaces the
  O(n) linear scan per message (handlers.go:247-256)
- A3 label→turn grouping — ``collect_list`` per (conv, label), ordered by
  turn_idx (the reference appends in nondeterministic arrival order,
  handlers.go:259-264; we enforce stable turn ordering, the row invariant)
- A4 conditional counters (handlers.go:269-275)
- A5 completion detection ``n_seen >= n_expected`` (handlers.go:291-299)
- A6 processing-time sum (handlers.go:267)

The streaming engine runs the same fold incrementally in keyed state
(streaming/engine.py); this batch form is the golden oracle for
batch ≡ stream equivalence tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TURN_NAME = "turn-%05d"  # stable per-turn identifier (ref: filename, P8/P9)


def conv_summaries(turn_results: DataFrame, conv_config: DataFrame) -> DataFrame:
    """CONV_SUMMARIES rows from classified turns (batch form of A1)."""
    tr = turn_results.dropDuplicates(["conv_id", "turn_idx"])

    per_label = (
        tr.groupBy("conv_id", "top_prediction")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("turn_idx"), F.format_string(TURN_NAME, "turn_idx").alias("name")))
                ),
                lambda s: s["name"],
            ).alias("files")
        )
        .groupBy("conv_id")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct(F.col("top_prediction").alias("label"), F.col("files"))))
            ).alias("grouped_by_label")
        )
    )

    counters = tr.groupBy("conv_id").agg(
        F.count("*").cast("int").alias("total"),
        F.sum(F.when(F.col("top_prediction") != "unknown", 1).otherwise(0)).cast("int").alias("classified"),
        F.sum(F.when(F.col("top_prediction") == "unknown", 1).otherwise(0)).cast("int").alias("unknown"),
        # exact integer cents → one IEEE division: order-independent total
        # (a raw double sum is shuffle-order-dependent and can't hash-match
        # the streaming fold or a SQL oracle)
        (
            F.sum(F.round(F.col("processing_time_ms") * 100).cast("long")).cast("double") / 100.0
        ).alias("processing_time_ms"),
        F.max("ts").alias("completed_at"),
        F.first("model_used").alias("model_used"),
    )

    return (
        counters.join(per_label, "conv_id")
        .join(conv_config.select("conv_id", "n_turns"), "conv_id")
        .select(
            "conv_id",
            F.when(F.col("total") >= F.col("n_turns"), F.lit("completed"))
            .otherwise(F.lit("processing"))
            .alias("status"),
            "model_used",
            "total",
            "classified",
            "unknown",
            "grouped_by_label",
            "processing_time_ms",
            "completed_at",
        )
    )
