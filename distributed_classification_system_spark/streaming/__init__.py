from distributed_classification_system_spark.streaming.engine import run_stream  # noqa: F401
