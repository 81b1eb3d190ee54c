"""Golden DDL tests (FIXTURES.md section 2; reference RAS.py:125-200)."""

from __future__ import annotations

import pytest

from spark_auto_schema import ddl

COLS = [("user_id", "int4"), ("amount", "float8"), ("note", "varchar(256)")]


def test_schema_ddl():
    assert ddl.generate_schema_ddl("analytics") == (
        "CREATE SCHEMA IF NOT EXISTS analytics;"
    )


def test_schema_permissions():
    assert ddl.generate_schema_permissions("analytics", "dbreader") == (
        "GRANT USAGE ON SCHEMA analytics TO GROUP dbreader;"
    )


def test_table_permissions():
    assert ddl.generate_table_permissions("analytics", "t1", "dbreader") == (
        "GRANT SELECT ON analytics.t1 TO GROUP dbreader;"
    )


def test_table_ddl_default_diststyle_even():
    assert ddl.generate_table_ddl("analytics", "t1", COLS) == (
        "CREATE TABLE analytics.t1 (\n"
        '"user_id" int4\n'
        ', "amount" float8\n'
        ', "note" varchar(256)\n'
        ")\n"
        "DISTSTYLE EVEN\n"
    )


def test_table_ddl_dist_key():
    out = ddl.generate_table_ddl("analytics", "t1", COLS, dist_key="user_id")
    assert out.endswith(")\nDISTKEY (user_id)\n")
    assert "DISTSTYLE" not in out


def test_table_ddl_sort_key_multi():
    out = ddl.generate_table_ddl("analytics", "t1", COLS, sort_key="user_id, amount")
    assert out.endswith("DISTSTYLE EVEN\nSORTKEY (user_id, amount)\n")


def test_table_ddl_primary_key_and_export_field():
    out = ddl.generate_table_ddl(
        "analytics",
        "t1",
        COLS,
        primary_key="user_id",
        export_field_name="export_date",
        export_field_type="date",
    )
    assert " , export_date date\n , PRIMARY KEY (user_id)\n)\n" in out


def test_table_ddl_notype_becomes_varchar256():
    out = ddl.generate_table_ddl("s", "t", [("c", "notype")])
    assert '"c" varchar(256)' in out  # RAS.py:153


def test_column_ddl():
    out = ddl.generate_column_ddl("s", "t", [("c", "float8"), ("d", "date")])
    assert out == (
        "ALTER TABLE s.t ADD COLUMN c float8;\nALTER TABLE s.t ADD COLUMN d date;"
    )
    assert ddl.generate_column_ddl("s", "t", []) is None


@pytest.mark.parametrize(
    "bad", ["s; DROP TABLE x", "s.t", "s t", "", "1abc", 'a"b']
)
def test_injection_rejected(bad):
    # the reference interpolates raw f-strings (RAS.py:104,120); we validate
    with pytest.raises(ValueError):
        ddl.generate_schema_ddl(bad)
    with pytest.raises(ValueError):
        ddl.generate_table_ddl(bad, "t", COLS)


def test_spark_dialect_ddl():
    out = ddl.generate_spark_table_ddl(
        "analytics", "t1", COLS + [("ts", "timestamp")], partitioned_by=["user_id"]
    )
    assert out == (
        "CREATE TABLE analytics.t1 (\n"
        "  user_id INT\n"
        ",\n  amount DOUBLE\n"
        ",\n  note STRING\n"
        ",\n  ts TIMESTAMP\n"
        ")\nUSING parquet\nPARTITIONED BY (user_id)"
    ).replace("\n,\n", ",\n")


def test_spark_dialect_runs_in_spark(spark, tmp_path):
    out = ddl.generate_spark_table_ddl(
        "default", "sas_ddl_check", COLS, location=str(tmp_path / "t")
    )
    spark.sql("DROP TABLE IF EXISTS default.sas_ddl_check")
    spark.sql(out)  # must be valid Spark SQL
    cols = {c.name for c in spark.catalog.listColumns("sas_ddl_check", "default")}
    assert cols == {"user_id", "amount", "note"}
    spark.sql("DROP TABLE default.sas_ddl_check")
