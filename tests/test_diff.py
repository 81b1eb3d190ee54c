"""Diff matrix + 13-class classification tests (FIXTURES.md section 3).

Reference: RAS.py:202-225 (diff), RAS.py:258-292 (_classify_type).
"""

from __future__ import annotations

import pytest

from spark_auto_schema.diff import evaluate_diffs, missing_columns
from spark_auto_schema.types import classify_type


@pytest.mark.parametrize(
    "t,cls",
    [
        ("smallint", 1),
        ("int2", 1),
        ("integer", 2),
        ("int", 2),
        ("int4", 2),
        ("bigint", 3),
        ("int8", 3),
        ("decimal", 4),
        ("numeric", 4),
        ("real", 5),
        ("float", 5),  # first-match: class 5, not the dead class-6 alias
        ("double precision", 6),
        ("float8", 6),
        ("boolean", 7),
        ("bool", 7),
        ("char", 8),
        ("bpchar", 8),
        ("varchar", 9),
        ("varchar(256)", 9),
        ("text", 9),
        ("character varying(256)", 9),
        ("varchar(65535)", 10),
        ("nvarchar(65535)", 10),
        ("date", 11),
        ("timestamp", 12),
        ("timestamp without time zone", 12),
        ("timestamptz", 13),
        ("timestamp with time zone", 13),
        ("DATE", 11),  # case-insensitive
        (" int4 ", 2),  # trimmed
        ("varchar(123)", 0),  # unknown stays 0 like the reference
        ("nan", 0),
        (None, 0),
        # fixed substring bug (RAS.py:285): these were class 11 in the reference
        ("dat", 0),
        ("at", 0),
        ("e", 0),
    ],
)
def test_classify_type(t, cls):
    assert classify_type(t) == cls


def _mk(spark, rows, col):
    return spark.createDataFrame(rows, f"field string, {col} string")


def test_diff_matrix(spark):
    proposed = _mk(
        spark,
        [("a", "int4"), ("b", "int4"), ("c", "float8"), ("e", "notype")],
        "proposed_type",
    )
    deployed = _mk(
        spark,
        [("a", "integer"), ("b", "varchar(256)"), ("d", "date")],
        "deployed_type",
    )
    diff = evaluate_diffs(proposed, deployed)
    got = {r["field"]: (r["proposed_type"], r["deployed_type"], r["reason"])
           for r in diff.collect()}
    assert got == {
        # a: int4 vs integer = same class 2 -> no diff -> absent
        "b": ("int4", "varchar(256)", "TYPE MISMATCH"),
        "c": ("float8", None, "MISSING"),
        "d": (None, "date", "DEPRECATED"),
        # e: notype proposals silently dropped (RAS.py:222)
    }
    assert missing_columns(diff) == [("c", "float8")]


def test_diff_empty_when_identical(spark):
    proposed = _mk(spark, [("a", "int4")], "proposed_type")
    deployed = _mk(spark, [("a", "int")], "deployed_type")
    assert evaluate_diffs(proposed, deployed).count() == 0


def test_diff_unknown_types_both_class0_no_mismatch(spark):
    # reference behavior: two unknown types both classify 0 -> equal -> no diff
    proposed = _mk(spark, [("a", "weird1")], "proposed_type")
    deployed = _mk(spark, [("a", "weird2")], "deployed_type")
    assert evaluate_diffs(proposed, deployed).count() == 0


# ------------------------------------------------------- JDBC deployed path
def test_deployed_columns_query_matches_reference_shape():
    from spark_auto_schema.catalog import deployed_columns_query

    q = deployed_columns_query("analytics", "orders")
    # same projection as RAS.py:215-216: udt_name || '(len)' for sized types,
    # filtered to the schema/table, in ordinal order
    assert "information_schema.columns" in q
    assert "udt_name" in q and "character_maximum_length" in q
    assert "table_schema = 'analytics'" in q
    assert "table_name = 'orders'" in q
    assert q.rstrip().endswith("ORDER BY ordinal_position")


@pytest.mark.parametrize("bad", ["x; drop table y", "a'b", 'a"b', "", "1abc"])
def test_deployed_columns_query_rejects_non_identifiers(bad):
    from spark_auto_schema.catalog import deployed_columns_query

    with pytest.raises(ValueError):
        deployed_columns_query(bad, "t")
    with pytest.raises(ValueError):
        deployed_columns_query("s", bad)


def test_deployed_schema_df_jdbc_stubbed(spark, monkeypatch):
    """Stub the JDBC seam (_jdbc_load) and drive the full live-diff flow:
    jdbc fetch -> evaluate_diffs -> MISSING/TYPE MISMATCH/DEPRECATED."""
    from spark_auto_schema import catalog

    captured = {}

    def fake_jdbc_load(sp, url, query, properties):
        captured.update(url=url, query=query, properties=properties)
        # what a Redshift information_schema fetch of this table would return
        # (upper-case column names: some JDBC catalogs upcase unquoted aliases)
        return sp.createDataFrame(
            [("a", "int4"), ("b", "varchar(256)"), ("d", "date")],
            "FIELD string, DEPLOYED_TYPE string",
        )

    monkeypatch.setattr(catalog, "_jdbc_load", fake_jdbc_load)
    deployed = catalog.deployed_schema_df_jdbc(
        spark,
        "jdbc:redshift://example.invalid:5439/db",
        "analytics",
        "orders",
        properties={"user": "u", "driver": "com.amazon.redshift.jdbc42.Driver"},
    )
    assert deployed.columns == ["field", "deployed_type"]
    assert captured["url"].startswith("jdbc:redshift://")
    assert "table_name = 'orders'" in captured["query"]
    assert captured["properties"]["user"] == "u"

    proposed = _mk(
        spark,
        [("a", "int4"), ("b", "int4"), ("c", "float8")],
        "proposed_type",
    )
    got = {
        r["field"]: r["reason"]
        for r in evaluate_diffs(proposed, deployed).collect()
    }
    assert got == {"b": "TYPE MISMATCH", "c": "MISSING", "d": "DEPRECATED"}
