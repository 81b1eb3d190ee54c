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
