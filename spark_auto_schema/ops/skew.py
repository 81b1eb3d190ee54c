"""Skew mitigation: salted two-stage aggregation and salted joins.

At 100 TB a handful of hot keys (a viral document, a default user id, an
empty-string bucket) can put one shuffle partition orders of magnitude above
the rest and stall the stage on a single straggler task.  Two classical
remedies, both exact:

* :func:`salted_aggregate` — split every hot key across ``salt`` partial
  groups (stage 1: groupBy(key, salt) with map-side combine), then merge the
  ``salt`` partials per key (stage 2: groupBy(key)).  Stage 2's input is at
  most ``salt x |distinct keys|`` rows, so no partition can exceed
  ``salt`` rows per key — the straggler is gone.  Works for any aggregate
  with a partial/merge decomposition (count/sum/min/max/avg-as-sum+count).
* :func:`salted_join` — explode the *small* side ``salt`` ways and salt the
  big side's key randomly-but-deterministically (hash of a row id), so one
  hot join key fans out across ``salt`` reducers.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin``) handles much of
this automatically at runtime; these operators are the explicit, plannable
form for when AQE cannot help (aggregations, or joins whose skew AQE's
thresholds miss).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def _salt_col(row_key: Column, salt: int) -> Column:
    """Deterministic pseudo-random salt in [0, salt): hash of a row-unique
    key, NOT rand() — reruns and retried tasks must salt identically."""
    return F.pmod(F.xxhash64(row_key), F.lit(salt)).cast("int")


def salted_aggregate(
    df: DataFrame,
    key_col: str,
    row_key_col: str,
    aggs: dict[str, tuple[str, str]],
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Exact skew-safe aggregation: two-stage groupBy via a salt column.

    ``aggs`` maps output column -> (input column, op) with op in
    {count, sum, min, max}.  Stage 1 computes the op per (key, salt) group;
    stage 2 merges partials per key (count merges with sum).

    ``row_key_col`` is any row-unique column used to derive the deterministic
    salt.  The result equals ``df.groupBy(key_col).agg(...)`` exactly.
    """
    mergers = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    stage1_exprs = []
    for out, (col, op) in aggs.items():
        if op not in mergers:
            raise ValueError(f"unsupported op {op!r} (need partial/merge form)")
        fn = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}[op]
        stage1_exprs.append(fn(col).alias(out))
    stage1 = df.withColumn("__salt", _salt_col(F.col(row_key_col), salt)).groupBy(
        key_col, "__salt"
    ).agg(*stage1_exprs)
    stage2_exprs = [
        mergers[op](out).alias(out) for out, (col, op) in aggs.items()
    ]
    return stage1.groupBy(key_col).agg(*stage2_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    big_row_key: str,
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Exact skew-safe equi-join: replicate the small side ``salt`` ways and
    spread the big side's hot keys across ``salt`` reducers.

    Equivalent to ``big.join(small, on, how)`` for inner/left joins.  The
    small side grows by ``salt``x — keep it the genuinely small side (if it
    fits in a broadcast, broadcast instead; salting is for the mid-size
    dimension that is too big to broadcast but joins a skewed fact)."""
    salted_big = big.withColumn("__salt", _salt_col(F.col(big_row_key), salt))
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = salted_big.join(replicated, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def skew_profile(
    df: DataFrame, key_col: str, top_k: int = 5
) -> DataFrame:
    """Measure key skew before choosing a mitigation: the ``top_k``
    hottest keys with their row counts and corpus share, each row also
    carrying the global skew ratio ``max_count / mean_count`` (1.0 =
    perfectly uniform; 100x = one key holds a hundred partitions' worth).

    Returns ``(key string, n, share, skew_ratio)``, ordered hottest-first
    with a lexicographic key tie-break.

    This is the diagnostic that decides between a plain shuffle,
    :func:`salted_aggregate` / :func:`salted_join`, AQE skew splitting, or
    broadcast — salting uniformly-distributed keys wastes a stage, and
    shuffling a 100x-skewed key stalls one.  Cost: ONE map-side-combined
    aggregate over the data (the shuffle carries per-key partials), then
    key-cardinality-sized work: a 1-row stats aggregate broadcast onto a
    TakeOrdered top-k.  Safe to run on the full 100 TB input.
    """
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = counts.agg(
        F.sum("n").cast("double").alias("__total"),
        F.count(F.lit(1)).cast("double").alias("__nk"),
        F.max("n").cast("double").alias("__mx"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("__total"), 6).alias("share"),
            F.round(F.col("__mx") * F.col("__nk") / F.col("__total"), 4).alias(
                "skew_ratio"
            ),
        )
        .orderBy(F.col("n").desc(), "key")
        .limit(top_k)
    )
