"""end_to_end_sales_etl_de_project_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference ETL project (subu131/End-to-End-Sales-ETL-DE-Project): CSV
ingestion with schema validation + quarantine, star-schema enrichment via
broadcast joins, windowed business metrics, partitioned parquet marts, a
staging/idempotency ledger — plus the large-scale training-data operators
(dedup, similarity search, text analysis, streaming) a 100 TB pipeline
needs.

Everything is declarative DataFrame/SQL so Catalyst + AQE pick the
physical strategy; Python UDFs appear only where built-ins genuinely
cannot express the semantics (and then as Arrow-batched Pandas UDFs).
"""

from end_to_end_sales_etl_de_project_spark.session import get_spark_session

__all__ = ["get_spark_session"]
__version__ = "0.1.0"
