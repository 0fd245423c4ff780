"""Label-partitioned result sink (SURVEY.md §2.1 S10).

The reference's user-visible output layout is an object store organized
``jobid/label/filename`` — the backend copies every classified item into
a per-label folder (backend-service/handlers/handlers.go:342-375, copy
primitive services/s3.go:27-37). The Spark-native equivalent is a
``partitionBy(label)`` parquet layout: the label becomes a partition
column, so the directory tree IS the grouping and reading one label
prunes every other partition at the scan (no data files even opened).

At 100 TB scale this layout is also the right write shape: the write is
one pass, each task streams its rows into per-label files, and the
downstream per-label consumers (the reference's "browse one label"
access pattern) read only their slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_label_partitioned(classified: DataFrame, out_dir: str) -> None:
    """One-pass label-partitioned write: <out_dir>/top_prediction=<label>/."""
    classified.write.mode("overwrite").partitionBy("top_prediction").parquet(out_dir)


def read_label_partition(spark: SparkSession, out_dir: str, label: str) -> DataFrame:
    """Read ONE label's slice — the filter lands on the partition column,
    so every other label's files are pruned from the scan."""
    return (
        spark.read.option("basePath", out_dir)
        .parquet(out_dir)
        .filter(F.col("top_prediction") == label)
    )


def label_partition_roundtrip(
    documents: DataFrame, out_dir: str, label: str = "spark"
) -> DataFrame:
    """S10 end-to-end: classify → label-partitioned write → read back one
    label partition. Oracle = the classification CTE filtered to the label
    (the layout must neither drop nor duplicate rows)."""
    from distributed_classification_system_spark.operators.classify import classify_documents

    spark = documents.sparkSession
    write_label_partitioned(classify_documents(documents, use_expr=True), out_dir)
    return read_label_partition(spark, out_dir, label).select(
        "doc_id", "lang", F.col("top_prediction").cast("string").alias("top_prediction"),
        "top_confidence", "pred_labels", "reason", "processing_time_ms",
    )
