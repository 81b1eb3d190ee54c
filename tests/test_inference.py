"""Inference branch coverage: every decision-tree branch, CSV and parquet.

Reference tree: /root/reference/redshift_auto_schema/RedshiftAutoSchema.py:294-339.
"""

from __future__ import annotations

import pytest

from spark_auto_schema.inference import infer_table_schema
from spark_auto_schema.io import load_file

from .conftest import INFER_PROBE_EXPECTED


def _types(results):
    return {ci.name: ci.proposed_type for ci in results}


def test_parquet_branches(spark, infer_probe_parquet):
    df = load_file(spark, infer_probe_parquet)
    got = _types(infer_table_schema(df))
    assert got == INFER_PROBE_EXPECTED


def test_csv_branches(spark, infer_probe_csv):
    df = load_file(spark, infer_probe_csv)
    got = _types(infer_table_schema(df))
    assert got == INFER_PROBE_EXPECTED


def test_empty_input_returns_none(spark):
    df = spark.createDataFrame([], "a string, b int")
    assert infer_table_schema(df) is None


def test_single_pass_plan(spark, infer_probe_parquet):
    """The inference stats must be ONE aggregate job over one scan: the plan
    contains exactly one HashAggregate pair (partial+final) and no shuffle
    besides the single-row exchange."""
    from pyspark.sql import functions as F

    from spark_auto_schema.inference import _stat_exprs

    df = load_file(spark, infer_probe_parquet)
    exprs = [F.count(F.lit(1)).alias("__nrows")]
    for i, field in enumerate(df.schema.fields):
        exprs.extend(_stat_exprs(df, i, field.name, field.dataType))
    plan = df.agg(*exprs)._jdf.queryExecution().executedPlan().toString()
    # one partial + one final HashAggregate/SortAggregate, single scan
    assert plan.count("Scan parquet") == 1


def test_chunked_passes_match_single_pass(spark, infer_probe_parquet):
    df = load_file(spark, infer_probe_parquet)
    single = _types(infer_table_schema(df))
    chunked = _types(infer_table_schema(df, max_cols_per_pass=4))
    assert single == chunked


def test_bool_column_dtype(spark):
    df = spark.createDataFrame([(True,), (False,), (None,)], "flag boolean")
    got = _types(infer_table_schema(df))
    assert got == {"flag": "bool"}


def test_bool_dtype_identifier_becomes_int4(spark):
    # reference quirk: _id escape skips the bool branch, float(True)=1.0 -> int4
    df = spark.createDataFrame([(True,), (False,)], "x_id boolean")
    got = _types(infer_table_schema(df))
    assert got == {"x_id": "int4"}


def test_date_dtype(spark):
    import datetime

    df = spark.createDataFrame(
        [(datetime.date(2020, 1, 1),), (datetime.date(2021, 2, 3),)], "d date"
    )
    assert _types(infer_table_schema(df)) == {"d": "date"}


def test_nested_compat_vs_native(spark):
    df = spark.createDataFrame([([1.0, 2.0],), ([3.0] * 200,)], "emb array<double>")
    compat = _types(infer_table_schema(df, compat_nested=True))
    native = _types(infer_table_schema(df, compat_nested=False))
    assert compat == {"emb": "varchar(65535)"}  # stringified > 240 chars
    assert native == {"emb": "array<double>"}


def test_sampling_is_opt_in(spark, infer_probe_parquet):
    df = load_file(spark, infer_probe_parquet)
    # sample_fraction=1.0 must agree with the full scan
    assert _types(infer_table_schema(df, sample_fraction=1.0)) == INFER_PROBE_EXPECTED


@pytest.mark.parametrize(
    "values,expected",
    [
        ([("0",), ("1",)], "bool"),  # stringified 0/1 still bool
        ([("2",), ("3",)], "int4"),
        ([("2147483648",), ("1",)], "int8"),
        ([("1.5",), ("2",)], "float8"),
        ([("1e3",), ("2",)], "int4"),  # scientific notation, integral
        (
            [("2019-01-01T12:00:00",), ("2020-01-01T01:02:03",)],
            "timestamp",
        ),  # ISO T separator
        ([("03/15/2019",), ("12/31/2020",)], "date"),  # US date shape
        ([("Jan 5, 2020",), ("Mar 7, 2021",)], "date"),  # month-name shape
        ([("2019-13-45",), ("2020-01-01",)], "varchar(256)"),  # invalid date
        (
            [("2019-01-02 03:04",), ("2020-05-06 07:08",)],
            "timestamp",
        ),  # minutes without seconds are COMPLETE (dateutil agrees)
        ([("2019",), ("2020",)], "int4"),  # numeric-before-date
        ([("03/2019",), ("04/2020",)], "varchar(256)"),  # partial date
        (
            [("2019-01-02T03:04:05+02:00",), ("2020-01-02T03:04:05+02:00",)],
            "varchar(256)",
        ),  # zoned shapes excluded by design (documented divergence)
    ],
)
def test_string_probe_cases(spark, values, expected):
    df = spark.createDataFrame(values, "c string")
    assert _types(infer_table_schema(df)) == {"c": expected}
