from finance_data_pipeline_spark.operators import relational

__all__ = ["relational"]
