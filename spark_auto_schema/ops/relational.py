"""Temporal relational operators Spark lacks as built-ins: as-of join and
time-bucketed range aggregation.

The reference library has no temporal operators at all (its only join is the
schema-diff full outer join, RedshiftAutoSchema.py:217); these extend the
engine for event/feed workloads.

Scale design (100 TB):

* :func:`asof_join` — the classic union + window formulation.  Naive as-of
  implementations (per-key cross join, or a range-condition theta join)
  explode to |L|x|R| per key; the union trick is ONE shuffle of |L|+|R| rows
  partitioned by key, a per-partition sort, and a running ``last(...,
  ignorenulls)`` — linear in input, no pair blowup, AQE-skew-splittable.
* :func:`time_bucket_agg` — truncate-to-bucket then hash aggregate: one
  shuffle keyed on (bucket, dims), map-side partial aggregation first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: each left row picks the latest right row with
    ``right_ts <= left_ts`` (``<`` when ``strict``) for the same ``on`` key.

    Returns all left columns plus each requested right ``value_cols`` (NULL
    when no prior right row exists).  Matches DuckDB's ``ASOF LEFT JOIN``
    semantics, which the driver oracle uses to verify it.

    Implementation: tag both inputs, union, one window per ``on`` key ordered
    by (ts, tag) with right rows sorting before left rows at equal
    timestamps (inclusive semantics), then ``last(value, ignorenulls=True)``
    over the running frame.  One shuffle, no per-key pair explosion.

    Determinism: if multiple right rows share (key, ts), the one sorting
    last by its value struct wins — a total order, stable across runs.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c != on and c != right_ts]

    val_fields = [right_ts] + [c for c in value_cols if c != right_ts]
    val = F.struct(*[F.col(c) for c in val_fields])
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0 if not strict else 1).alias("__tag"),
        val.alias("__v"),
        F.lit(None).cast("string").alias("__lrow_marker"),
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1 if not strict else 0).alias("__tag"),
        F.lit(None).cast(r.schema["__v"].dataType).alias("__v"),
        F.lit("L").alias("__lrow_marker"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
    )
    r = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))

    u = r.unionByName(l)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__tag", "__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__v", ignorenulls=True).over(w))
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    # the matched right timestamp is always emitted, then the value columns
    out_cols += [F.col(f"__m.{c}").alias(c) for c in val_fields]
    return matched.where(F.col("__lrow_marker").isNotNull()).select(*out_cols)


def range_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """Band/range join: match each fact row to the range rows with
    ``lo <= value < hi``.

    The range table is broadcast (range tables — rate tiers, SLA bands,
    histogram bins — are small by nature), so the plan is a broadcast
    nested-loop with the band predicate evaluated stream-side: no shuffle of
    the fact table, no pair blowup beyond |facts| x |matching bands|.  If
    the range table were ever large, pre-bucketing both sides on
    ``floor(value / bucket_width)`` turns this into an equi-join."""
    cond = (facts[value_col] >= ranges[lo_col]) & (facts[value_col] < ranges[hi_col])
    return facts.join(F.broadcast(ranges), cond, how)


def ewma(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Per-key exponentially-weighted moving average of ``value_col`` in
    ``ts_col`` order: ``y_t = alpha * x_t + (1 - alpha) * y_{t-1}``.

    The recursion makes this inexpressible with Spark window aggregates
    (no recursive frame semantics), so it needs an Arrow kernel.  Rather
    than ``groupBy().applyInPandas`` (one Python call per key — per-group
    Arrow overhead dominates when keys are many and small, measured ~5 s of
    pure machinery at 100k rows / 1k keys), the implementation hash-
    partitions by key, sorts within partitions by (key, ts), and streams
    Arrow batches through ONE ``mapInPandas`` call per partition.  A carry
    dict holds the last smoothed value per key so a key whose rows span
    batch boundaries continues its recurrence exactly (the carry is fed to
    pandas ``ewm`` by prepending it as a synthetic first sample).  State is
    O(keys-per-partition) floats; one shuffle total."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            df.schema[key_col],
            df.schema[ts_col],
            df.schema[value_col],
            T.StructField("ewma", T.DoubleType()),
        ]
    )
    sc = df.sparkSession.sparkContext
    # value_col as the final sort key makes the order total even when a key
    # has duplicate timestamps (equal-ts-equal-value ties are order-neutral
    # for the recurrence), so results stay engine-reproducible on any data.
    prepared = (
        df.select(key_col, ts_col, value_col)
        .repartition(sc.defaultParallelism, key_col)
        .sortWithinPartitions(key_col, ts_col, value_col)
    )

    def run(batches):
        import pandas as pd

        carry: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            pieces = []
            for key, g in pdf.groupby(key_col, sort=False):
                x = g[value_col].reset_index(drop=True)
                if key in carry:
                    seeded = pd.concat(
                        [pd.Series([carry[key]]), x], ignore_index=True
                    )
                    y = seeded.ewm(alpha=alpha, adjust=False).mean().iloc[1:]
                    y = y.reset_index(drop=True)
                else:
                    y = x.ewm(alpha=alpha, adjust=False).mean()
                carry[key] = float(y.iloc[-1])
                g = g.copy()
                g["ewma"] = y.round(6).values
                pieces.append(g)
            yield pd.concat(pieces, ignore_index=True)

    return prepared.mapInPandas(run, out_schema)


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_col: str,
    insert_only: bool = False,
) -> DataFrame:
    """Warehouse MERGE (upsert): rows in ``updates`` overwrite the matching
    ``base`` row by ``key_col``; unmatched update rows are inserted;
    unmatched base rows pass through.  ``insert_only`` keeps the base row
    on match (MERGE ... WHEN NOT MATCHED THEN INSERT only).

    Both inputs must share a schema.  Precedence is column-wise total: the
    winning side's whole row is taken (no per-column coalesce surprises
    with legitimate NULL update values — NULLs in an update row overwrite).
    ``updates`` must be key-unique, the standard MERGE precondition (Delta
    raises on multiple matches); duplicate update keys here would fan the
    matching base row out once per duplicate.  Deduplicate upstream
    (e.g. keep the latest by a version column) before merging.

    Scale (100 TB): one full outer hash join on the key.  Update batches
    are normally a small fraction of the base, so AQE broadcast-joins the
    update side and the base is never shuffled; for same-size sides a
    bucketed base table on ``key_col`` makes the merge shuffle-free on the
    base.  This is the dataflow under Delta/Iceberg MERGE INTO, minus the
    transactional file rewrite.
    """
    if set(base.columns) != set(updates.columns):
        raise ValueError("base and updates must share a schema")
    b = base.select(F.struct(*base.columns).alias("__b"), F.col(key_col).alias("__bk"))
    u = updates.select(
        F.struct(*base.columns).alias("__u"), F.col(key_col).alias("__uk")
    )
    joined = b.join(u, F.col("__bk") == F.col("__uk"), "full_outer")
    winner = (
        F.coalesce("__b", "__u") if insert_only else F.coalesce("__u", "__b")
    )
    return joined.select(winner.alias("__r")).select(
        *[F.col(f"__r.{c}").alias(c) for c in base.columns]
    )


def time_bucket_agg(
    df: DataFrame,
    ts_col: str,
    bucket: str,
    aggs: list,
    dims: list[str] | None = None,
) -> DataFrame:
    """Hypertable-style rollup: truncate ``ts_col`` to ``bucket`` (a
    ``date_trunc`` unit: 'hour', 'day', 'week', ...), group by (bucket,
    *dims*), apply ``aggs``.

    One hash-partitioned aggregate with map-side combine; at 100 TB the
    shuffle carries only partial aggregates per (bucket, dims) group.
    """
    dims = dims or []
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    return df.groupBy(b, *[F.col(d) for d in dims]).agg(*aggs)


def apply_tombstones(
    df: DataFrame,
    tombstones: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Targeted-delete (tombstone) application: remove every row of ``df``
    whose key appears in ``tombstones`` — the GDPR/right-to-be-forgotten
    and retention-expiry primitive a copy-on-write lake rewrites with.

    A deletion list is always tiny relative to the corpus, so the anti
    semantics must become a BROADCAST anti-join: the corpus is scanned
    once, never shuffled, and each task drops matches against the
    broadcast key set.  (A shuffle anti-join — the planner default when it
    cannot see the tombstone side is small — would re-shuffle 100 TB to
    delete a few thousand rows.)  Deduplicates the tombstone side first:
    redelivered delete requests are the norm and duplicates would only
    bloat the broadcast.

    Rewriting the retained rows back out (partitioned/bucketed/z-ordered
    as before) is the caller's choice of writer — composing with
    :func:`~spark_auto_schema.io.write_partitioned` limits the rewrite to
    the partitions that actually contained tombstoned keys."""
    t = tombstones.select(*key_cols).dropDuplicates(key_cols)
    return df.join(F.broadcast(t), on=key_cols, how="left_anti")


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_cols: list[str],
    effective_col: str = "effective_ts",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Slowly-changing-dimension type-2 apply: fold a batch of attribute
    updates into a versioned dimension, closing out changed rows and
    appending new versions — the history-preserving alternative to
    :func:`merge_upsert` that warehouse dimensions (customer tiers,
    document licenses, model-card labels) are kept under.

    ``dim`` carries (key, *attr_cols, valid_from, valid_to) with
    ``valid_to IS NULL`` marking the current version.  ``updates`` carries
    (key, *attr_cols, effective_col) and must be key-unique (same MERGE
    precondition as :func:`merge_upsert` — dedup to the latest upstream).
    Per update row:

    * key unknown, or current attrs differ → append a new current version
      ``[effective, NULL)``; a differing existing current row is closed at
      ``effective``.
    * current attrs identical → no-op (idempotent redelivery).

    Closed history rows always pass through untouched.

    Scale (100 TB): history (the bulk of the table) passes through with a
    FILTER only — no join, no shuffle.  The current slice joins the update
    batch full-outer on the key; a day's updates are a small fraction of
    |keys|, so AQE broadcast-joins the batch and the dimension is never
    shuffled.  Attribute comparison is a row-local struct equality (null
    =  null, the SQL IS NOT DISTINCT FROM semantics via ``eqNullSafe``).
    """
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    hist = dim.where(F.col(valid_to_col).isNotNull())
    cur = dim.where(F.col(valid_to_col).isNull())
    c = cur.select(
        F.col(key_col).alias("__ck"),
        attrs.alias("__ca"),
        F.col(valid_from_col).alias("__cf"),
    )
    u = updates.select(
        F.col(key_col).alias("__uk"),
        attrs.alias("__ua"),
        F.col(effective_col).alias("__ue"),
    )
    j = c.join(F.broadcast(u), F.col("__ck") == F.col("__uk"), "full_outer")
    changed = F.col("__uk").isNotNull() & (
        F.col("__ck").isNull() | ~F.col("__ca").eqNullSafe(F.col("__ua"))
    )

    def out(key, a, vf, vt):
        return [key.alias(key_col)] + [
            a.getField(c_).alias(c_) for c_ in attr_cols
        ] + [vf.alias(valid_from_col), vt.alias(valid_to_col)]

    # existing current rows: closed at the update's effective ts when the
    # attrs changed, passed through open otherwise
    kept = j.where(F.col("__ck").isNotNull()).select(
        *out(
            F.col("__ck"),
            F.col("__ca"),
            F.col("__cf"),
            F.when(changed, F.col("__ue")).cast(dim.schema[valid_to_col].dataType),
        )
    )
    # new versions: inserted keys and changed keys open at effective
    new = j.where(changed).select(
        *out(
            F.col("__uk"),
            F.col("__ua"),
            F.col("__ue"),
            F.lit(None).cast(dim.schema[valid_to_col].dataType),
        )
    )
    return hist.select(
        F.col(key_col),
        *[F.col(c_) for c_ in attr_cols],
        F.col(valid_from_col),
        F.col(valid_to_col),
    ).unionByName(kept).unionByName(new)


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time dimension lookup: attach to every fact row the SCD2
    version whose ``[valid_from, valid_to)`` interval contains the fact's
    timestamp (``valid_to IS NULL`` = open/current) — the query-side
    companion of :func:`scd2_apply`, answering "what was this key's state
    WHEN the event happened" instead of joining today's state onto
    yesterday's facts.

    Facts with no covering version (before the key's first version, or an
    unknown key) keep NULL attributes — a left join, so no fact is ever
    dropped by enrichment.  SCD2 intervals are disjoint per key by
    construction, so at most one version matches and the join cannot
    fan out.

    Scale (100 TB): this is an EQUI-join on the key with the interval
    predicate as a residual filter — hash-partitioned on the key like any
    dimension join, never a range/nested-loop join, because the version
    count per key is small (it is a history, not a time series).  A small
    dimension broadcasts under AQE; a large one co-partitions with the
    facts.  No sort, no window, one shuffle per side at most.
    """
    d = dim.select(
        F.col(key_col).alias("__dk"),
        *[F.col(c) for c in attr_cols],
        F.col(valid_from_col).alias("__vf"),
        F.col(valid_to_col).alias("__vt"),
    )
    cond = (
        (facts[key_col] == d["__dk"])
        & (facts[ts_col] >= d["__vf"])
        & (d["__vt"].isNull() | (facts[ts_col] < d["__vt"]))
    )
    return facts.join(d, cond, "left").drop("__dk", "__vf", "__vt")


def interval_join(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval OVERLAP join: all (a, b) row pairs whose half-open time
    intervals ``[a_start, a_end)`` and ``[b_start, b_end)`` intersect
    (``a_start < b_end AND b_start < a_end``).

    The interval-x-interval sibling of :func:`range_join` (point-in-band)
    and :func:`asof_join` (point-to-latest): concurrency analysis, outage
    attribution, and session-overlap questions all reduce to it.  A naive
    theta-join is a cartesian product; the scalable plan buckets TIME:
    explode each interval into the ``bucket_seconds``-wide epochs it
    covers, equi-join on the bucket, then keep a pair only in the FIRST
    bucket the two intervals share (``floor(max(starts) / width)``) —
    exactly-once emission with no distinct, no pair blowup beyond
    co-bucketed candidates, and a plain hash-partitioned equi-join at any
    scale.  Choose ``bucket_seconds`` near the typical interval length:
    too small explodes copies (interval_len/width per row), too large
    degrades toward all-pairs within a bucket.

    Column names must be disjoint between ``a`` and ``b`` (raise
    otherwise); both interval pairs must be castable to epoch seconds
    (timestamp or numeric).  Degenerate empty intervals (start >= end)
    match nothing, by the half-open definition.
    """
    clash = set(a.columns) & set(b.columns)
    if clash:
        raise ValueError(f"interval_join requires disjoint columns; shared: {sorted(clash)}")
    w = float(bucket_seconds)

    def _cover(df: DataFrame, s: str, e: str, out: str) -> DataFrame:
        lo = F.floor(F.col(s).cast("double") / w)
        # cover floor(s/w)..floor(e/w): the end bucket over-covers when e
        # sits exactly on a boundary, which the overlap predicate filters
        hi = F.floor(F.col(e).cast("double") / w)
        return df.where(F.col(s).cast("double") < F.col(e).cast("double")).withColumn(
            out, F.explode(F.sequence(lo, hi))
        )

    ax = _cover(a, a_start, a_end, "__bkt_a")
    bx = _cover(b, b_start, b_end, "__bkt_b")
    sa, ea = F.col(a_start).cast("double"), F.col(a_end).cast("double")
    sb, eb = F.col(b_start).cast("double"), F.col(b_end).cast("double")
    overlap = (sa < eb) & (sb < ea)
    first_shared = F.floor(F.greatest(sa, sb) / w)
    return (
        ax.join(bx, F.col("__bkt_a") == F.col("__bkt_b"))
        .where(overlap & (F.col("__bkt_a") == first_shared))
        .drop("__bkt_a", "__bkt_b")
    )
