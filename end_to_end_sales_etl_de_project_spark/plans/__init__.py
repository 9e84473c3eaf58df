from end_to_end_sales_etl_de_project_spark.plans.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
