"""Differential test: run the ACTUAL reference library (pandas) and our Spark
engine on identical fixture files; assert identical proposed types.

SURVEY.md section 5.5 — the strongest oracle for the inference core.

The reference imports psycopg2 at module top (RAS.py:17) which is not
installed here; we stub it (the inference path never touches it).  Known,
documented divergences are excluded below.
"""

from __future__ import annotations

import importlib.util
import sys
import types as pytypes

import pytest

from spark_auto_schema.inference import infer_table_schema
from spark_auto_schema.io import load_file

REF = "/root/reference/redshift_auto_schema/RedshiftAutoSchema.py"

# Documented divergences (inference.py module docstring):
#  - numeric_string: reference hits `'str' <= int` TypeError -> float8 on
#    object-dtype numeric text; we return int4 (pandas-typed CSV gives the
#    reference int4 too, so the quirk only shows on parquet string columns).
EXCLUDED_PARQUET = {"numeric_string"}


@pytest.fixture(scope="module")
def reference_cls():
    if "psycopg2" not in sys.modules:
        stub = pytypes.ModuleType("psycopg2")
        ext = pytypes.ModuleType("psycopg2.extensions")

        class _Conn:  # placeholder for the type annotation only
            pass

        ext.connection = _Conn
        stub.extensions = ext
        sys.modules["psycopg2"] = stub
        sys.modules["psycopg2.extensions"] = ext
    spec = importlib.util.spec_from_file_location("ref_ras", REF)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception as ex:  # pragma: no cover
        pytest.skip(f"reference import failed: {ex}")
    return mod.RedshiftAutoSchema


def _reference_types(reference_cls, path, **kwargs):
    ref = reference_cls(schema="s", table="t", file=path, **kwargs)
    try:
        ref._generate_table_metadata()
    except Exception as ex:  # pandas version drift in the reference itself
        pytest.skip(f"reference inference failed on this pandas: {ex}")
    return dict(zip(ref.metadata["index"], ref.metadata["proposed_type"]))


def test_differential_parquet(spark, reference_cls, infer_probe_parquet):
    ref_types = _reference_types(reference_cls, infer_probe_parquet)
    ours = {
        ci.name: ci.proposed_type
        for ci in infer_table_schema(load_file(spark, infer_probe_parquet))
    }
    mismatches = {
        k: (ref_types.get(k), v)
        for k, v in ours.items()
        if k not in EXCLUDED_PARQUET and ref_types.get(k) != v
    }
    assert mismatches == {}


def test_differential_lineitem(spark, reference_cls):
    path = "/root/testdata/sf0.001/lineitem.parquet"
    ref_types = _reference_types(reference_cls, path)
    ours = {
        ci.name: ci.proposed_type
        for ci in infer_table_schema(load_file(spark, path))
    }
    assert ours == ref_types


@pytest.mark.parametrize(
    "table", ["orders", "customer", "part", "supplier", "nation", "region", "documents"]
)
def test_differential_testdata_tables(spark, reference_cls, table):
    path = f"/root/testdata/sf0.001/{table}.parquet"
    ref_types = _reference_types(reference_cls, path)
    ours = {
        ci.name: ci.proposed_type
        for ci in infer_table_schema(load_file(spark, path))
    }
    assert ours == ref_types


def test_differential_events_nanos(spark, reference_cls):
    """events carries timestamp[ns]; both systems must agree after each
    handles the representation its own way (pandas reads ns natively; we
    convert via nanosAsLong + timestamp_micros)."""
    path = "/root/testdata/sf0.001/events.parquet"
    ref_types = _reference_types(reference_cls, path)
    ours = {
        ci.name: ci.proposed_type
        for ci in infer_table_schema(load_file(spark, path))
    }
    assert ours == ref_types


def test_differential_csv(spark, reference_cls, infer_probe_csv):
    """Both systems read the same |-delimited CSV with their native typed
    readers; proposed types must agree (CSV inference feeds both trees with
    already-typed columns, so even numeric_string agrees here)."""
    ref_types = _reference_types(reference_cls, infer_probe_csv)
    ours = {
        ci.name: ci.proposed_type
        for ci in infer_table_schema(load_file(spark, infer_probe_csv))
    }
    mismatches = {
        k: (ref_types.get(k), v) for k, v in ours.items() if ref_types.get(k) != v
    }
    assert mismatches == {}


def test_differential_ddl_strings(spark, reference_cls):
    """Whitespace-normalized CREATE TABLE parity with the reference: same
    columns, same proposed types, same PRIMARY KEY / DISTKEY / SORTKEY
    clauses (the reference's pandas-to_string spacing quirks aside)."""
    import re

    path = "/root/testdata/sf0.001/nation.parquet"
    ref = reference_cls(
        schema="s", table="nation", file=path,
        dist_key="n_nationkey", sort_key="n_name", primary_key="n_nationkey",
    )
    try:
        ref_ddl = ref.generate_table_ddl()
    except Exception as ex:  # pragma: no cover
        pytest.skip(f"reference failed: {ex}")

    from spark_auto_schema import SparkAutoSchema

    ours = SparkAutoSchema(
        schema="s", table="nation", file=path, spark=spark,
        dist_key="n_nationkey", sort_key="n_name", primary_key="n_nationkey",
    ).generate_table_ddl()

    def norm(s: str) -> str:
        return re.sub(r"\s+", " ", s).strip()

    assert norm(ours) == norm(ref_ddl)
