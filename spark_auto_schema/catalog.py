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

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .types import spark_to_redshift_type

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_$]*$")


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


def deployed_columns_query(
    schema: str, table: str, dialect: str = "redshift"
) -> str:
    """The reference's deployed-column SQL (RAS.py:215-216), parameter-safe.

    Same projection: ``udt_name || '(character_maximum_length)'`` for sized
    types, ordered by ordinal position.  Unlike the reference's raw f-string
    interpolation (SURVEY.md section 1.4 — injection-prone), schema/table
    must be plain SQL identifiers; anything else is rejected.

    ``dialect='redshift'`` (default) is reference-exact, including the
    unlengthed ``CAST(... AS VARCHAR)`` Redshift/postgres accept.
    ``dialect='ansi'`` renders the length via ``TRIM(CAST(... AS
    CHAR(10)))`` — equivalent output, accepted by engines that require a
    length on every character cast (Derby, DB2), which is what the embedded
    Derby integration test exercises through the real ``spark.read.jdbc``
    path."""
    for name in (schema, table):
        if not _IDENT_RE.match(name or ""):
            raise ValueError(f"not a plain SQL identifier: {name!r}")
    if dialect == "redshift":
        len_expr = "CAST(character_maximum_length AS VARCHAR)"
    elif dialect == "ansi":
        len_expr = "TRIM(CAST(character_maximum_length AS CHAR(10)))"
    else:
        raise ValueError(f"unknown dialect: {dialect!r}")
    return (
        "SELECT column_name AS field, udt_name || "
        "CASE WHEN character_maximum_length IS NOT NULL "
        f"THEN '(' || {len_expr} || ')' "
        "ELSE '' END AS deployed_type "
        "FROM information_schema.columns "
        f"WHERE table_schema = '{schema}' AND table_name = '{table}' "
        "ORDER BY ordinal_position"
    )


def _jdbc_load(
    spark: SparkSession, url: str, query: str, properties: dict[str, str]
) -> DataFrame:
    """One JDBC pushdown query via the public ``jdbc`` source (tests stub
    this seam; a real run needs the Redshift/postgres driver jar on the
    classpath)."""
    reader = spark.read.format("jdbc").option("url", url).option("query", query)
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()


def deployed_schema_df_jdbc(
    spark: SparkSession,
    url: str,
    schema: str,
    table: str,
    properties: dict[str, str] | None = None,
    dialect: str = "redshift",
) -> DataFrame:
    """Deployed columns of a LIVE Redshift/postgres table as
    (field, deployed_type), via ``spark.read.jdbc`` —  the rebuild's
    equivalent of the reference's psycopg2 ``information_schema.columns``
    fetch (RAS.py:215-216), closing the live-catalog path without a psycopg2
    dependency.

    The query is pushed down to the warehouse (a single-partition read of a
    catalog-sized result — no parallelism needed); the result feeds
    :func:`spark_auto_schema.diff.evaluate_diffs` exactly like
    :func:`deployed_schema_df`.  ``properties`` passes JDBC options through
    (``user``, ``password``, ``driver``, ...)."""
    query = deployed_columns_query(schema, table, dialect=dialect)
    df = _jdbc_load(spark, url, query, dict(properties or {}))
    # normalize column case: some JDBC catalogs upper-case unquoted aliases
    return df.toDF(*[c.lower() for c in df.columns]).select(
        "field", "deployed_type"
    )
