from end_to_end_sales_etl_de_project_spark.functions.scalar import (
    full_name,
    money,
    money_sum,
    month_key,
)

__all__ = ["full_name", "money", "money_sum", "month_key"]
