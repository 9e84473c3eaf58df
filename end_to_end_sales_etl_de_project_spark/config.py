"""Engine configuration: the reference's data contracts, Spark-native.

Mirrors ``/root/reference/config.py`` (paths, table names,
MANDATORY_COLUMNS at line 77) minus credentials — connection settings
come from the environment, never source.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The sales-fact contract (reference config.py:77). Order matters: it is
# the canonical column order after validation.
MANDATORY_COLUMNS: tuple[str, ...] = (
    "customer_id",
    "store_id",
    "product_name",
    "sales_date",
    "sales_person_id",
    "price",
    "quantity",
    "total_cost",
)

# Explicit schema replacing the reference's inferSchema double-scan
# (SURVEY §1.2): ids are longs, money is decimal, quantity int.
# sales_date stays STRING deliberately — the reference's month semantics
# are substring(1,7) over the text form (transform.py:126,142).
SALES_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.LongType()),
        T.StructField("store_id", T.LongType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("sales_date", T.StringType()),
        T.StructField("sales_person_id", T.LongType()),
        T.StructField("price", T.DecimalType(12, 2)),
        T.StructField("quantity", T.IntegerType()),
        T.StructField("total_cost", T.DecimalType(12, 2)),
    ]
)

# Quarantine route names (reference src/main_1.py:157-212, move.py).
ROUTE_VALID = "valid"
ROUTE_WRONG_TYPE = "wrong_files"  # non-CSV extension
ROUTE_BAD_SCHEMA = "bad_schema"  # missing mandatory columns
ROUTE_EMPTY = "empty_files"  # header-only / zero rows
ROUTE_PROCESSED = "processed"  # archived after success

# Ledger status domain (reference staging.py:28, main_1.py:671).
STATUS_START = "START"
STATUS_COMPLETED = "COMPLETED"
