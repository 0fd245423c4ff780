from distributed_classification_system_spark.operators.classify import classify_turns  # noqa: F401
from distributed_classification_system_spark.operators.sessionize import conv_summaries  # noqa: F401
