"""Single-pass, Spark-native column type inference.

Reference algorithm: ``_evaluate_type`` at
``/root/reference/redshift_auto_schema/RedshiftAutoSchema.py:294-339`` and its
driver ``_generate_table_metadata`` (RAS.py:252-256).  The reference scans the
full pandas DataFrame once **per column**, sequentially probing
bool -> numeric -> date -> varchar.

Spark-native redesign (SURVEY.md section 4.2): every statistic each column's
decision needs is computed for **all columns in ONE ``df.agg(...)``** — a
shuffle-free two-phase HashAggregate (map-side partial aggregation, single-row
exchange, final merge).  The branching decision tree then runs on the
collected one-row statistics vector on the driver.  At 100 TB this is one
linear scan with per-executor partial aggregation; the driver holds only
O(columns) scalars.

Semantics replicated exactly (SURVEY.md section 1.3):

* inference ignores nulls; an all-null column is ``notype`` (RAS.py:306-309)
* the bool literal set {true,false,t,f,0,1} on stringified values, disabled
  for ``*_id`` columns (RAS.py:311, 255)
* numeric-before-date: ``"20190101"`` is int, never date (RAS.py:315 vs 328)
* integral floats demote to int (RAS.py:317)
* int4 iff min >= -2147483648 and max <= 2147483647, else int8 (RAS.py:318)
* date iff every parsed timestamp is midnight-normalized, else timestamp
  (RAS.py:331-334)
* varchar(256) iff max stringified length <= 240 (not 256!), else
  varchar(65535) (RAS.py:336-339)
* partial dates ("2019", "03/2019", "Jan 2020") are NOT dates -> varchar.
  The reference detects these by double-parsing with dateutil defaults
  (RAS.py:329-330); Catalyst has no dateutil, so we require values to match
  an explicit whitelist of *complete* date/timestamp formats via strict
  ``try_to_timestamp`` (unparsed trailing text -> NULL).  Partial shapes fail
  every format and demote to varchar, same result.

Deliberate divergence (documented, SURVEY.md section 1.4): for *string*
columns of numeric text the reference hits ``'str' <= int`` TypeError on its
range check and returns ``float8`` (RAS.py:317-325); we range-check the
parsed doubles and return int4/int8 — the behavior its own docs intend and
what pandas-typed CSV input already produces.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

BOOL_LITERALS = ("true", "false", "t", "f", "0", "1")
INT4_MIN, INT4_MAX = -2147483648, 2147483647
VARCHAR_THRESHOLD = 240  # RAS.py:336 — threshold really is 240, not 256

# Complete (non-partial) date/timestamp shapes accepted by the date probe.
# Spark's CORRECTED-mode parser is strict: trailing unparsed text => NULL,
# and bracketed sections are optional.  "S" fraction patterns accept 1..9
# digits.  Partial shapes like "2019", "03/2019", "Jan 2020" match nothing.
COMPLETE_DATE_FORMATS = (
    "yyyy-M-d[ H:m[:s[.SSSSSSSSS]]]",
    "yyyy-M-d'T'H:m[:s[.SSSSSSSSS]]",
    "yyyy/M/d[ H:m[:s[.SSSSSSSSS]]]",
    "M/d/yyyy[ H:m[:s[.SSSSSSSSS]]]",
    "M-d-yyyy[ H:m[:s]]",
    "MMM d, yyyy[ H:m[:s]]",
    "MMM d yyyy",
    "d MMM yyyy",
    "MMMM d, yyyy",
)

# Acceptance gap vs the reference (documented, deliberate): dateutil accepts
# more *complete* datetime shapes than this whitelist — e.g. timezone-offset
# strings ("2019-01-02T03:04:05+02:00"), 12-hour clock forms ("Jan 2, 2020
# 5:00 PM"), and locale-ish orderings.  Those classify varchar here while the
# reference returns timestamp.  Zoned shapes are excluded on purpose: the
# reference normalizes them through naive local time, which is
# session-timezone-dependent — behavior a distributed engine should not
# replicate.  The whitelist does accept minutes-without-seconds and
# fractional-second forms, which cover the shapes real data lakes emit.

# Cheap structural superset of every COMPLETE_DATE_FORMATS shape.  Values
# failing this regex cannot parse under any whitelisted format, so the
# expensive DateTimeFormatter probe is skipped for them — measured ~30x
# faster on non-date string columns (formatter failure paths are costly).
DATEISH_RE = (
    r"^(\d{4}[-/]\d{1,2}[-/]\d{1,2}"
    r"|\d{1,2}[-/]\d{1,2}[-/]\d{4}"
    r"|[A-Za-z]{3,9} \d{1,2},? \d{4}"
    r"|\d{1,2} [A-Za-z]{3,9} \d{4})"
)

_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL_TYPES = (T.FloatType, T.DoubleType)
_TIMESTAMP_TYPES = (T.TimestampType, T.TimestampNTZType)


@dataclass(frozen=True)
class ColumnInference:
    """Inference result for one column."""

    name: str
    spark_type: str  # source Spark dtype, simpleString form
    proposed_type: str  # Redshift-vocabulary proposed type (or Spark type in native mode)

    @property
    def is_identifier(self) -> bool:
        return self.name.endswith("_id")


def _stat_exprs(df: DataFrame, i: int, name: str, dtype: T.DataType) -> list:
    """Aggregate expressions producing column *i*'s statistics vector.

    Null handling: the reference drops nulls before probing (RAS.py:309).
    ``bool_and``/``min``/``max`` ignore NULL inputs, so probe expressions are
    wrapped in ``when(value is not null, probe)`` making null rows contribute
    NULL (ignored) instead of false.  For float columns NaN counts as null
    (pandas ``notnull`` semantics), hence the ``isnan`` guards.
    """
    c = df[name]
    a = f"c{i}__"
    exprs = []

    if isinstance(dtype, _FRACTIONAL_TYPES):
        valid = F.when(~F.isnan(c), c)
        exprs.append(F.count(valid).alias(a + "cnt"))
        exprs.append(F.bool_and(F.when(~F.isnan(c), c == F.floor(c))).alias(a + "intg"))
        exprs.append(F.min(valid).cast("double").alias(a + "mn"))
        exprs.append(F.max(valid).cast("double").alias(a + "mx"))
        return exprs

    exprs.append(F.count(c).alias(a + "cnt"))

    if isinstance(dtype, _INTEGRAL_TYPES):
        exprs.append(F.bool_and(c.isin(0, 1)).alias(a + "b01"))
        exprs.append(F.min(c).cast("long").alias(a + "mn"))
        exprs.append(F.max(c).cast("long").alias(a + "mx"))
    elif isinstance(dtype, T.DecimalType):
        exprs.append(F.bool_and(c == F.floor(c)).alias(a + "intg"))
        exprs.append(F.min(c).cast("double").alias(a + "mn"))
        exprs.append(F.max(c).cast("double").alias(a + "mx"))
    elif isinstance(dtype, _TIMESTAMP_TYPES):
        exprs.append(F.bool_and(c == F.date_trunc("DAY", c)).alias(a + "mid"))
    elif isinstance(dtype, T.StringType):
        # try_cast: ANSI-safe — malformed numeric text yields NULL, mirroring
        # the reference's try/except around astype(float) (RAS.py:314-326)
        d = c.try_cast("double")
        parsed = F.when(
            c.rlike(DATEISH_RE),
            F.coalesce(
                *[F.try_to_timestamp(c, F.lit(fmt)) for fmt in COMPLETE_DATE_FORMATS]
            ),
        )
        exprs.append(
            F.bool_and(
                F.when(c.isNotNull(), F.lower(c).isin(*BOOL_LITERALS))
            ).alias(a + "b01")
        )
        exprs.append(F.bool_and(F.when(c.isNotNull(), d.isNotNull())).alias(a + "isnum"))
        exprs.append(F.bool_and(F.when(d.isNotNull(), d == F.floor(d))).alias(a + "intg"))
        exprs.append(F.min(d).alias(a + "mn"))
        exprs.append(F.max(d).alias(a + "mx"))
        exprs.append(
            F.bool_and(F.when(c.isNotNull(), parsed.isNotNull())).alias(a + "isdate")
        )
        exprs.append(
            F.bool_and(
                F.when(parsed.isNotNull(), parsed == F.date_trunc("DAY", parsed))
            ).alias(a + "mid")
        )
        exprs.append(F.max(F.length(c)).alias(a + "maxlen"))
    elif isinstance(dtype, (T.BooleanType, T.DateType)):
        pass  # dtype alone decides
    else:
        # nested / binary / other: reference-compat mode sizes the stringified
        # value (pandas stringifies objects before the varchar branch,
        # RAS.py:336-339)
        exprs.append(F.max(F.length(c.cast("string"))).alias(a + "maxlen"))
    return exprs


def _int_range(mn: float | int | None, mx: float | int | None) -> str:
    if mn is None or mx is None:
        return "int4"
    return "int4" if mn >= INT4_MIN and mx <= INT4_MAX else "int8"


def _varchar(maxlen: int | None) -> str:
    if maxlen is not None and maxlen > VARCHAR_THRESHOLD:
        return "varchar(65535)"
    return "varchar(256)"


def _decide(
    name: str, dtype: T.DataType, s: dict, compat_nested: bool = True
) -> str:
    """Driver-side decision tree over one column's statistics vector.

    Branch order mirrors RAS.py:294-339: all-null -> bool -> numeric
    (integral -> range) -> date/timestamp -> varchar sizing.
    """
    identifier = name.endswith("_id")  # RAS.py:255

    if not s.get("cnt"):
        return "notype"  # RAS.py:306-307

    if isinstance(dtype, T.BooleanType):
        # str(True).lower() = 'true' is in the bool set (RAS.py:311); with the
        # _id escape the reference falls through to float(True)=1.0 -> int4.
        return "int4" if identifier else "bool"

    if isinstance(dtype, _INTEGRAL_TYPES):
        if s.get("b01") and not identifier:
            return "bool"  # 0/1 columns are swallowed by the bool rule
        return _int_range(s.get("mn"), s.get("mx"))

    if isinstance(dtype, (*_FRACTIONAL_TYPES, T.DecimalType)):
        # str(0.0)='0.0' never matches the bool set, so no bool branch here
        if s.get("intg"):
            return _int_range(s.get("mn"), s.get("mx"))
        return "float8"

    if isinstance(dtype, T.DateType):
        return "date"

    if isinstance(dtype, _TIMESTAMP_TYPES):
        return "date" if s.get("mid") else "timestamp"  # RAS.py:331-334

    if isinstance(dtype, T.StringType):
        if s.get("b01") and not identifier:
            return "bool"
        if s.get("isnum"):  # numeric-before-date, RAS.py:315
            if s.get("intg"):
                return _int_range(s.get("mn"), s.get("mx"))
            return "float8"
        if s.get("isdate"):
            return "date" if s.get("mid") else "timestamp"
        return _varchar(s.get("maxlen"))

    # nested / binary / other
    if compat_nested:
        return _varchar(s.get("maxlen"))
    return dtype.simpleString()


def infer_table_schema(
    df: DataFrame,
    compat_nested: bool = True,
    sample_fraction: float | None = None,
    max_cols_per_pass: int | None = None,
    spread_small_scans: bool = True,
) -> list[ColumnInference] | None:
    """Infer a Redshift type for every column of ``df`` in one Spark job.

    Args:
        df: input DataFrame (columns already normalized).
        compat_nested: True (reference-compat) stringifies nested/binary
            columns into the varchar branch; False reports the native Spark
            type (``array<float>`` etc.) instead.
        sample_fraction: opt-in row sampling.  NOTE: inference semantics are
            forall-quantified (one bad row flips a type), so sampling *changes
            results*; it is off by default and documented as approximate.
        max_cols_per_pass: split very wide tables (1000s of columns) into
            multiple aggregation jobs of at most this many columns each to
            bound codegen size.  Each pass is still one full-scan aggregate.
        spread_small_scans: when the input has far fewer partitions than the
            cluster has cores (single-row-group parquet files are unsplittable
            below one task each), repartition to the default parallelism so
            the probe expressions run on every core.  Only fires when
            partitions < cores/4, i.e. for small or degenerately-laid-out
            inputs where the extra shuffle is cheap; a 100 TB table already
            has orders of magnitude more partitions than cores and is never
            reshuffled.

    Returns None for an empty (0-row) input, matching RAS.py:243-245 where an
    empty file produces no metadata.
    """
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=42)

    if spread_small_scans:
        from .io import spread_small_scan

        df = spread_small_scan(df)

    fields = list(df.schema.fields)
    groups: list[list[tuple[int, T.StructField]]] = []
    if max_cols_per_pass:
        for start in range(0, len(fields), max_cols_per_pass):
            groups.append(
                [(i, f) for i, f in enumerate(fields)][start : start + max_cols_per_pass]
            )
    else:
        groups = [list(enumerate(fields))]

    stats: dict[str, object] = {}
    nrows = None
    for gi, group in enumerate(groups):
        exprs = []
        if gi == 0:
            exprs.append(F.count(F.lit(1)).alias("__nrows"))
        for i, field in group:
            exprs.extend(_stat_exprs(df, i, field.name, field.dataType))
        row: Row = df.agg(*exprs).collect()[0]
        d = row.asDict()
        if gi == 0:
            nrows = d.pop("__nrows")
        stats.update(d)

    if not nrows:
        return None  # empty input => no metadata (RAS.py:243-245)

    results = []
    for i, field in enumerate(fields):
        prefix = f"c{i}__"
        s = {k[len(prefix) :]: v for k, v in stats.items() if k.startswith(prefix)}
        proposed = _decide(field.name, field.dataType, s, compat_nested)
        results.append(
            ColumnInference(field.name, field.dataType.simpleString(), proposed)
        )
    return results


def inference_to_df(spark, inferences: list[ColumnInference]) -> DataFrame:
    """Lift inference results into a small DataFrame (field, spark_type, proposed_type)."""
    schema = T.StructType(
        [
            T.StructField("field", T.StringType(), False),
            T.StructField("spark_type", T.StringType(), False),
            T.StructField("proposed_type", T.StringType(), False),
        ]
    )
    rows = [(ci.name, ci.spark_type, ci.proposed_type) for ci in inferences]
    return spark.createDataFrame(rows, schema)
