from distributed_classification_system_spark.sources.gen import (  # noqa: F401
    gen_conv_config,
    gen_conversations,
    gen_label_registry,
    gen_transcripts,
)
from distributed_classification_system_spark.sources.tables import load_table, register_views  # noqa: F401
