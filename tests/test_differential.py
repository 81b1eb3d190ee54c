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


# ---------------------------------------------------------------------------
# hypothesis-driven differential fuzz (round 6)
# ---------------------------------------------------------------------------
#
# The fixture-based tests above pin every KNOWN branch of the decision
# tree; this fuzz walks the boundaries BETWEEN branches (int4/int8 edges,
# the 240-char varchar threshold, bool-set membership with case noise,
# midnight vs non-midnight, null sprinkling) with freshly generated
# columns, always comparing against the actual reference library.  The
# value space is restricted to the supported contract — whitelisted date
# formats and |x| < 1e12 numerics — so any mismatch is a real bug in one
# engine, not a documented divergence class.

import datetime as _dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_BOOL_WORDS = ["true", "false", "TRUE", "False", "t", "f", "T", "F", "0", "1"]


def _dates(fmt):
    return st.dates(
        min_value=_dt.date(1990, 1, 1), max_value=_dt.date(2035, 12, 31)
    ).map(lambda d: d.strftime(fmt))


_COLUMN_KINDS = st.one_of(
    st.tuples(st.just("bool_words"), st.lists(st.sampled_from(_BOOL_WORDS), min_size=1, max_size=8)),
    st.tuples(st.just("ints"), st.lists(
        st.one_of(
            st.integers(-(2**31), 2**31 - 1),
            st.sampled_from([2**31 - 1, -(2**31), 2**31, -(2**31) - 1, 0]),
            st.integers(-(10**12), 10**12),
        ), min_size=1, max_size=8)),
    st.tuples(st.just("floats"), st.lists(
        st.one_of(
            st.floats(-1e12, 1e12, allow_nan=False, allow_infinity=False),
            st.integers(-(10**6), 10**6).map(float),
        ), min_size=1, max_size=8)),
    st.tuples(st.just("dates"), st.lists(_dates("%Y-%m-%d"), min_size=1, max_size=6)),
    st.tuples(st.just("timestamps"), st.lists(st.tuples(
        _dates("%Y-%m-%d"),
        st.sampled_from(["00:00:00", "00:00:00", "12:34:56", "23:59:59"]),
    ).map(lambda t: f"{t[0]} {t[1]}"), min_size=1, max_size=6)),
    st.tuples(st.just("strings"), st.lists(st.text(
        alphabet="abc XYZ-_", min_size=0, max_size=300
    ), min_size=1, max_size=6)),
    # heterogeneous columns: every branch's probe must fail closed into
    # the varchar fallback in BOTH engines (the fall-through seam)
    st.tuples(st.just("mixed"), st.lists(st.one_of(
        st.integers(-1000, 1000).map(str),
        st.sampled_from(["true", "f", "1"]),
        _dates("%Y-%m-%d"),
        st.text(alphabet="xyz ", min_size=1, max_size=12),
    ), min_size=2, max_size=8).filter(
        # ensure genuine heterogeneity: at least one non-numeric word AND
        # one numeric-or-structured value, so no single branch can win
        lambda v: any(any(c.isalpha() for c in x) and "-" not in x for x in v)
        and any(x.lstrip("-").isdigit() or "-" in x for x in v)
    )),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(col=_COLUMN_KINDS, with_null=st.booleans(), id_name=st.booleans())
def test_differential_fuzz_parquet(spark, reference_cls, col, with_null, id_name):
    import tempfile

    import pandas as pd

    kind, values = col
    if with_null and kind in ("bool_words", "dates", "timestamps", "strings"):
        values = list(values) + [None]
    name = "fuzz_id" if id_name else "fuzz_col"
    pdf = pd.DataFrame({name: pd.Series(values, dtype="object" if isinstance(values[0], str) or values[-1] is None else None)})
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/fuzz.parquet"
        pdf.to_parquet(path, index=False)
        ref_types = _reference_types(reference_cls, path)
        ours = {
            ci.name: ci.proposed_type
            for ci in infer_table_schema(load_file(spark, path))
        }
    nn = [v for v in values if v is not None]
    if id_name and kind == "bool_words" and set(nn) <= {"0", "1"}:
        # the documented numeric-string quirk class (EXCLUDED_PARQUET):
        # an *_id column of "0"/"1" STRINGS skips the bool branch and hits
        # the reference's `'str' <= int` TypeError -> float8; we return the
        # deliberately-fixed int4.  Assert OUR contract instead.
        assert ours == {name: "int4"}, f"values={values!r}"
        return
    assert ours == ref_types, f"kind={kind} values={values!r}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(col=_COLUMN_KINDS, id_name=st.booleans())
def test_differential_fuzz_csv(spark, reference_cls, col, id_name):
    """Same fuzz through the |-delimited CSV path: the reference ingests
    via pandas read_csv dtype inference, we via Spark's inferSchema — the
    two CSV type sniffers must land both trees on the same proposed type.
    Nulls are excluded (CSV null spelling is a reader-config concern, not
    an inference one) and strings are restricted to pipe/quote/newline-free
    text so the file itself is unambiguous."""
    import csv as _csv
    import tempfile

    kind, values = col
    if kind == "strings":
        values = [v.replace("|", " ").replace('"', " ") for v in values]
        if any(v.strip() == "" for v in values):
            return  # pandas reads empty cells as NaN, Spark as null/empty: config, not inference
    if kind == "floats":
        # pandas read_csv's default fast C float parser (xstrtod) is up to
        # 1 ulp off and can round a non-integral literal to an exact
        # integer (hypothesis found 900719925474.9999 -> 900719925475.0),
        # flipping the reference's int-vs-float verdict; Spark parses
        # round-trip-exact.  A PARSER artifact, not inference semantics —
        # skip values whose integrality differs between the two parses,
        # like the NaN-spelling guard above.
        import io as _io

        import pandas as _pd

        for v in values:
            fast = _pd.read_csv(_io.StringIO(f"c\n{v}\n"))["c"][0]
            if float(fast).is_integer() != float(str(v)).is_integer():
                return
    name = "fuzz_id" if id_name else "fuzz_col"
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/fuzz.csv"
        with open(path, "w", newline="") as fh:
            w = _csv.writer(fh, delimiter="|", quotechar='"')
            w.writerow([name])
            for v in values:
                w.writerow([v])
        ref_types = _reference_types(reference_cls, path, delimiter="|")
        ours = {
            ci.name: ci.proposed_type
            for ci in infer_table_schema(load_file(spark, path, delimiter="|"))
        }
    assert ours == ref_types, f"kind={kind} values={values!r}"
