from finance_data_pipeline_spark.extensions import (
    dedup,
    multimodal,
    sampling,
    similarity,
    text,
)

__all__ = ["dedup", "sampling", "similarity", "text", "multimodal"]
