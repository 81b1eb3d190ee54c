"""Single-pass schema-inference queries + generated DuckDB oracles (SURVEY.md §2A rows 7-19).

Mechanically split from __spark_entry__.py (round 11); no semantic change.
Assembled by __spark_entry__.queries() / oracle_sql() — the single driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from spark_auto_schema.inference import infer_table_schema
from spark_auto_schema.inference import inference_to_df
from spark_auto_schema.io import read_table

# ---------------------------------------------------------------------------
# inference queries + generated oracles
# ---------------------------------------------------------------------------

# Known testdata schemas (FIXTURES.md section 4): column -> probe kind.
_TABLE_KINDS: dict[str, dict[str, str]] = {
    "lineitem": {
        "l_orderkey": "int",
        "l_partkey": "int",
        "l_suppkey": "int",
        "l_linenumber": "int",
        "l_quantity": "float",
        "l_extendedprice": "float",
        "l_discount": "float",
        "l_tax": "float",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp",
    },
    "orders": {
        "o_orderkey": "int",
        "o_custkey": "int",
        "o_orderstatus": "string",
        "o_totalprice": "float",
        "o_orderdate": "timestamp",
        "o_orderpriority": "string",
    },
    "events": {
        "event_id": "int",
        "ts": "timestamp",
        "user_id": "int",
        "event_type": "string",
        "value": "float",
        "props": "string",
    },
    "documents": {
        "doc_id": "int",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "int",
    },
    "customer": {
        "c_custkey": "int",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "float",
        "c_mktsegment": "string",
    },
    "embeddings": {
        "vec_id": "int",
        "embedding": "array",
        "label": "int",
    },
    "part": {
        "p_partkey": "int",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "float",
    },
    "supplier": {
        "s_suppkey": "int",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "float",
    },
    "nation": {
        "n_nationkey": "int",
        "n_name": "string",
        "n_regionkey": "int",
    },
    "region": {
        "r_regionkey": "int",
        "r_name": "string",
    },
}

_INT_RANGE_SQL = "min({v}) >= -2147483648 AND max({v}) <= 2147483647"


def _infer_col_sql(table: str, col: str, kind: str) -> str:
    """DuckDB aggregate CASE replicating the inference decision tree for one
    column (reference tree: RedshiftAutoSchema.py:294-339)."""
    identifier = col.endswith("_id")
    c = f'"{col}"'
    if kind == "int":
        boolline = (
            ""
            if identifier
            else f"WHEN coalesce(bool_and({c} IN (0,1)), FALSE) THEN 'bool' "
        )
        body = (
            f"CASE WHEN count({c}) = 0 THEN 'notype' "
            + boolline
            + f"WHEN {_INT_RANGE_SQL.format(v=c)} THEN 'int4' ELSE 'int8' END"
        )
    elif kind == "float":
        body = (
            f"CASE WHEN count({c}) = 0 THEN 'notype' "
            f"WHEN coalesce(bool_and({c} = floor({c})), FALSE) THEN "
            f"(CASE WHEN {_INT_RANGE_SQL.format(v=c)} THEN 'int4' ELSE 'int8' END) "
            f"ELSE 'float8' END"
        )
    elif kind == "timestamp":
        body = (
            f"CASE WHEN count({c}) = 0 THEN 'notype' "
            f"WHEN bool_and({c} = date_trunc('day', {c})) THEN 'date' "
            f"ELSE 'timestamp' END"
        )
    elif kind == "string":
        d = f"try_cast({c} AS DOUBLE)"
        t = f"try_cast({c} AS TIMESTAMP)"
        boolline = (
            ""
            if identifier
            else (
                f"WHEN coalesce(bool_and(lower({c}) IN "
                f"('true','false','t','f','0','1')), FALSE) THEN 'bool' "
            )
        )
        body = (
            f"CASE WHEN count({c}) = 0 THEN 'notype' "
            + boolline
            + f"WHEN coalesce(bool_and({d} IS NOT NULL), FALSE) THEN "
            f"(CASE WHEN bool_and({d} = floor({d})) THEN "
            f"(CASE WHEN min({d}) >= -2147483648 AND max({d}) <= 2147483647 "
            f"THEN 'int4' ELSE 'int8' END) ELSE 'float8' END) "
            f"WHEN coalesce(bool_and({t} IS NOT NULL), FALSE) THEN "
            f"(CASE WHEN bool_and({t} = date_trunc('day', {t})) THEN 'date' "
            f"ELSE 'timestamp' END) "
            f"WHEN max(length({c})) <= 240 THEN 'varchar(256)' "
            f"ELSE 'varchar(65535)' END"
        )
    elif kind == "array":
        body = (
            f"CASE WHEN count({c}) = 0 THEN 'notype' "
            f"WHEN max(length(CAST({c} AS VARCHAR))) <= 240 THEN 'varchar(256)' "
            f"ELSE 'varchar(65535)' END"
        )
    else:  # pragma: no cover
        raise ValueError(kind)
    return f"SELECT '{col}' AS field, {body} AS proposed_type FROM {table}"


def _infer_table_sql(table: str) -> str:
    return " UNION ALL ".join(
        _infer_col_sql(table, col, kind) for col, kind in _TABLE_KINDS[table].items()
    )


def _infer_query(table: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = read_table(spark, sf_dir, table)
        return inference_to_df(spark, infer_table_schema(df)).select(
            "field", "proposed_type"
        )

    return fn


