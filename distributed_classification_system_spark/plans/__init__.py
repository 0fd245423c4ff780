from distributed_classification_system_spark.plans.flagship import flagship, flagship_turns  # noqa: F401
