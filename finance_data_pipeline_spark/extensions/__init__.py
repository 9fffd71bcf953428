from finance_data_pipeline_spark.extensions import dedup, multimodal, similarity, text

__all__ = ["dedup", "similarity", "text", "multimodal"]
