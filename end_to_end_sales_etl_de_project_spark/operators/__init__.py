from end_to_end_sales_etl_de_project_spark.operators.metrics import (
    grouped_monthly_sum,
    top_performer_incentive,
    windowed_partition_sum,
)

__all__ = [
    "grouped_monthly_sum",
    "top_performer_incentive",
    "windowed_partition_sum",
]
