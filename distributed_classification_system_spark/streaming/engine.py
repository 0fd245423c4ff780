"""The Structured Streaming CEP engine (SURVEY.md §3.1 restated).

Pipeline (one streaming query, one state store, one pass):

    readStream(transcripts) ──watermark(ts)──▶ stream-static join
      (conv_config on conv_id, broadcast registry on job_type)
      ──▶ salted repartition (hot-conv skew defense, T10)
      ──▶ vectorized classification (Arrow pandas UDF, K1-K6/P6)
      ──▶ groupBy(conv_id).applyInPandasWithState(session_fold)  [A1-A6, T5]
      ──▶ foreachBatch: idempotent batch-id-partitioned sink      [S6/T1]
            ├── turn_results  (exactly-once keyed (conv_id, turn_idx))
            └── conv_summaries (completed | timeout sessions)

Replaces the reference's SQS long-poll loop + goroutine fold + DynamoDB
upserts (ml-service/sqs_worker.py:142-174, backend-service/handlers/
handlers.go:192-304): micro-batches ≈ receive batches, checkpoint WAL ≈
queue persistence, state store ≈ job table, watermark timeout ≈ the
missing-message recovery the reference lacks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_classification_system_spark.functions.kernel import classify_udf
from distributed_classification_system_spark.schemas import TRANSCRIPTS
from distributed_classification_system_spark.streaming import sink as _sink
from distributed_classification_system_spark.streaming.state import (
    FOLD_OUTPUT,
    STATE_SCHEMA,
    session_fold,
)

WATERMARK_DELAY = "5 minutes"


def classified_stream(
    stream: DataFrame,
    conv_config: DataFrame,
    registry: DataFrame,
    salt_buckets: int = 8,
    watermark: str = WATERMARK_DELAY,
) -> DataFrame:
    """watermark → stream-static joins → salted repartition → kernel."""
    df = stream.withWatermark("ts", watermark)
    df = df.join(
        conv_config.select("conv_id", "job_type", "top_k", "confidence_threshold", "n_turns"),
        "conv_id",
    )
    df = df.join(F.broadcast(registry.select("job_type", "model_name", "labels")), "job_type")
    if salt_buckets:
        # spread hot conversations across tasks for the stateless kernel
        # stage; the keyed fold re-gathers by conv_id afterwards (T10)
        df = df.repartition(F.col("conv_id"), F.pmod(F.xxhash64("turn_idx"), F.lit(salt_buckets)))
    res = classify_udf(F.col("text"), F.col("labels"), F.col("top_k"), F.col("confidence_threshold"))
    return df.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
        F.col("model_name").alias("model_used"),
        res.alias("r"),
        "n_turns",
    ).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
        "model_used",
        F.col("r.top_prediction").alias("top_prediction"),
        F.col("r.top_confidence").alias("top_confidence"),
        F.to_json(F.col("r.all_predictions")).alias("all_predictions_json"),
        F.col("r.reason").alias("reason"),
        F.col("r.processing_time_ms").alias("processing_time_ms"),
        "n_turns",
    )


def folded_stream(classified: DataFrame) -> DataFrame:
    """The keyed session fold (turn pass-through + summary emission)."""
    return classified.groupBy("conv_id").applyInPandasWithState(
        session_fold,
        outputStructType=FOLD_OUTPUT,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )


def _sink_batch(out_dir: str):
    turns_dir = os.path.join(out_dir, "turn_results")
    summaries_dir = os.path.join(out_dir, "conv_summaries")

    def write(batch_df: DataFrame, batch_id: int) -> None:
        from distributed_classification_system_spark.streaming.state import SUMMARY_JSON_SCHEMA

        batch_df = batch_df.persist()
        try:
            turns = batch_df.filter(F.col("row_type") == "turn").select(
                "conv_id",
                "turn_idx",
                "role",
                "text",
                "tool",
                "ts",
                "model_used",
                "top_prediction",
                "top_confidence",
                "all_predictions_json",
                "reason",
                "processing_time_ms",
            )
            _sink.write_batch_idempotent(turns, turns_dir, batch_id)
            summaries = (
                batch_df.filter(F.col("row_type") == "summary")
                .select("conv_id", F.from_json("summary_json", SUMMARY_JSON_SCHEMA).alias("s"))
                .select(
                    "conv_id",
                    "s.status",
                    "s.model_used",
                    "s.total",
                    "s.classified",
                    "s.unknown",
                    "s.grouped_by_label",
                    "s.processing_time_ms",
                    "s.completed_at",
                )
            )
            _sink.write_batch_idempotent(summaries, summaries_dir, batch_id)
        finally:
            batch_df.unpersist()

    return write


def run_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    conv_config: DataFrame,
    registry: DataFrame,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    salt_buckets: int = 8,
    watermark: str = WATERMARK_DELAY,
    await_termination: bool = False,
):
    """Start the engine over a transcript file stream; returns the query.

    ``max_files_per_trigger`` paces micro-batches the way the reference's
    long-poll batch size (≤10 msgs) paces SQS consumption (S1)."""
    checkpoint_dir = checkpoint_dir or os.path.join(out_dir, "_checkpoint")
    reader = spark.readStream.schema(TRANSCRIPTS)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    classified = classified_stream(stream, conv_config, registry, salt_buckets, watermark)
    folded = folded_stream(classified)

    q = (
        folded.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_sink_batch(out_dir))
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def read_turn_results(spark: SparkSession, out_dir: str) -> DataFrame:
    return _sink.read_sink(spark, os.path.join(out_dir, "turn_results"))


def read_conv_summaries(spark: SparkSession, out_dir: str) -> DataFrame:
    """Summaries with the one-row-per-conversation contract enforced:
    'completed' beats 'timeout', then larger total, then earliest batch —
    deterministic survivor under any replay interleaving."""
    from pyspark.sql import Window

    df = _sink.read_sink(spark, os.path.join(out_dir, "conv_summaries"))
    w = Window.partitionBy("conv_id").orderBy(
        F.when(F.col("status") == "completed", 0).otherwise(1),
        F.col("total").desc(),
        F.col("batch_id"),
    )
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def write_stream_fixture(transcripts: DataFrame, input_dir: str, n_files: int = 8) -> None:
    """Write a transcript DataFrame as a sequence of time-sliced parquet
    files — the stream fixture. Files are time-ordered (slice i covers the
    i-th ts range) with increasing mtimes, so the file stream source
    replays them as a plausible stream whose disorder stays within the
    watermark, matching the contract a real Iceberg/Kafka source gives."""
    import glob
    import shutil
    import tempfile
    import time

    from pyspark.sql import Window

    os.makedirs(input_dir, exist_ok=True)
    staged = transcripts.withColumn("_slice", F.ntile(n_files).over(Window.orderBy("ts")))
    tmp = tempfile.mkdtemp()
    staged.write.partitionBy("_slice").parquet(os.path.join(tmp, "slices"))
    for i in range(1, n_files + 1):
        parts = sorted(glob.glob(os.path.join(tmp, "slices", f"_slice={i}", "*.parquet")))
        dest = os.path.join(input_dir, f"f{i:04d}.parquet")
        if len(parts) == 1:
            shutil.move(parts[0], dest)
        else:  # merge multi-part slice into one file via pandas
            import pandas as pd

            pd.concat([pd.read_parquet(p) for p in parts]).to_parquet(dest, index=False)
        t = time.time() - (n_files - i) * 2
        os.utime(dest, (t, t))
    shutil.rmtree(tmp)
