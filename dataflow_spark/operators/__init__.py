from dataflow_spark.operators import (  # noqa: F401
    chunking,
    code,
    dedup,
    evaluators,
    filters,
    multimodal,
    reasoning,
    refiners,
    similarity,
    text2sql,
)
