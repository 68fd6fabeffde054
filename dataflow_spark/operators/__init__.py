from dataflow_spark.operators import (  # noqa: F401
    dedup,
    evaluators,
    filters,
    multimodal,
    refiners,
    similarity,
    text2sql,
)
