"""Loaders for the driver-provided parquet tables (TESTDATA.md).

Equivalent of the reference's scan sources (S4/S9 in SURVEY.md §2.1):
parquet scans get predicate pushdown + column pruning from Catalyst for
free, replacing the hand-written DynamoDB Scan/FilterExpression and the
paginated S3 listing loop (backend-service/services/dynamo.go:119-155,
services/s3.go:60-92).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from distributed_classification_system_spark.schemas import DRIVER_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every driver table as a temp view for SQL-form operators."""
    for name in DRIVER_TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
