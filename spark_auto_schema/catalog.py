"""Catalog existence checks + deployed-schema fetch via the Spark catalog.

Reference: psycopg2 probes of Redshift system tables —
``check_schema_existence`` (RAS.py:93-107, ``pg_namespace``),
``check_table_existence`` (RAS.py:109-123, ``pg_tables UNION pg_views LIMIT
1`` — views count as tables), and the deployed-column query over
``information_schema.columns`` (RAS.py:215-216).

The rebuild targets the Spark catalog: ``databaseExists`` / ``tableExists``
(which covers views) / ``listColumns``.  Deployed Spark types are lifted into
the Redshift type vocabulary via :func:`spark_to_redshift_type` so the
13-class alias diffing (types.py) behaves exactly like the reference's
``udt_name || '(len)'`` strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .types import spark_to_redshift_type


def schema_exists(spark: SparkSession, schema: str) -> bool:
    """RAS.py:93-107 — schema existence, no SQL interpolation needed."""
    return spark.catalog.databaseExists(schema)


def table_exists(spark: SparkSession, schema: str, table: str) -> bool:
    """RAS.py:109-123 — table OR view existence (tableExists covers both)."""
    return spark.catalog.tableExists(f"{schema}.{table}")


def deployed_schema_df(spark: SparkSession, schema: str, table: str) -> DataFrame:
    """Deployed columns as (field, deployed_type) in ordinal order.

    Mirrors the reference's information_schema query (RAS.py:215-216) against
    the Spark catalog.  Catalog metadata is driver-local; the result is lifted
    into a DataFrame to feed the distributed diff join.
    """
    cols = spark.catalog.listColumns(tableName=table, dbName=schema)
    rows = []
    for c in cols:
        # listColumns yields DDL-ish dataType strings; parse via StructType
        try:
            dt = T._parse_datatype_string(c.dataType)
            rtype = spark_to_redshift_type(dt)
        except Exception:
            rtype = str(c.dataType).lower()
        rows.append((c.name, rtype))
    schema_t = T.StructType(
        [
            T.StructField("field", T.StringType(), False),
            T.StructField("deployed_type", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema_t)
