"""Round-6 additions: domain capping, burst collapsing, SCD2 history.

Each test pins semantics an oracle-only check could miss: the pass-through
/ windowed split in domain_cap, burst boundary inclusivity, and SCD2
idempotency + history immutability.
"""

from __future__ import annotations

import datetime

from spark_auto_schema.ops import analytics, corpus, relational


# ------------------------------------------------------------- domain_cap
def test_domain_cap_keeps_under_cap_domains_whole(spark):
    rows = [(i, "hot") for i in range(10)] + [(100 + i, "cold") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = corpus.domain_cap(df, "source", cap=4)
    got = {r["source"]: 0 for r in out.collect()}
    by = [(r["source"]) for r in out.collect()]
    assert by.count("cold") == 3  # under cap: untouched
    assert by.count("hot") == 4  # over cap: exactly cap survivors


def test_domain_cap_is_deterministic_and_content_addressed(spark):
    rows = [(i, "d") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(r["doc_id"] for r in corpus.domain_cap(df, "source", 5).collect())
    b = sorted(
        r["doc_id"]
        for r in corpus.domain_cap(
            df.repartition(7, "doc_id"), "source", 5
        ).collect()
    )
    assert a == b  # partitioning-invariant survivor set


def test_domain_cap_priority_column_wins(spark):
    rows = [(1, "d", 0.1), (2, "d", 0.9), (3, "d", 0.5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, q double")
    out = corpus.domain_cap(df, "source", cap=2, priority_col="q")
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 3]


def test_domain_cap_under_cap_side_has_no_window_sort(spark):
    """The pass-through side must be an anti-join, not a window: a plan
    with every row flowing through row_number would sort the whole corpus
    at 100 TB.  The broadcast over-list appears in the plan; the
    under-cap branch contributes no Window node."""
    rows = [(i, f"s{i % 100}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = corpus.domain_cap(df, "source", cap=1000)  # nothing over cap
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
    # all rows under cap -> result equals input
    assert out.count() == 200


# --------------------------------------------------------- collapse_bursts
def test_collapse_bursts_merges_within_gap(spark):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0),
        (1, t0 + datetime.timedelta(seconds=10)),  # same burst (<30)
        (1, t0 + datetime.timedelta(seconds=45)),  # 35s after prev: break
        (2, t0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = analytics.collapse_bursts(df, "user_id", "ts", gap_seconds=30)
    got = sorted(
        (r["user_id"], r["n_events"]) for r in out.collect()
    )
    assert got == [(1, 1), (1, 2), (2, 1)]


def test_collapse_bursts_gap_boundary_is_a_break(spark):
    """An event exactly gap_seconds after its predecessor starts a NEW
    burst (>= semantics) — the same closed/open convention as
    session_windows, pinned here so the oracle SQL can't drift."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, t0), (1, t0 + datetime.timedelta(seconds=30))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = analytics.collapse_bursts(df, "user_id", "ts", gap_seconds=30)
    assert out.count() == 2


def test_collapse_bursts_span_and_counts(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, t0 + datetime.timedelta(seconds=s)) for s in (0, 5, 9, 100)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r["burst_start"], r["burst_end"], r["n_events"])
        for r in analytics.collapse_bursts(df, "user_id", "ts", 30).collect()
    }
    assert out == {
        (t0, t0 + datetime.timedelta(seconds=9), 3),
        (t0 + datetime.timedelta(seconds=100), t0 + datetime.timedelta(seconds=100), 1),
    }


def test_collapse_bursts_single_exchange(spark):
    """lag, running-sum, and the burst aggregate all share the hash
    partitioning on the key: exactly one Exchange in the plan."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(i % 5, t0 + datetime.timedelta(seconds=i)) for i in range(100)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    import io
    from contextlib import redirect_stdout

    out = analytics.collapse_bursts(df, "user_id", "ts", 30)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("simple")
    assert buf.getvalue().count("Exchange") == 1


# -------------------------------------------------------------- scd2_apply
def _dim(spark):
    d = datetime.datetime
    rows = [
        # k=1: one closed + one current version
        (1, "bronze", d(2020, 1, 1), d(2021, 1, 1)),
        (1, "silver", d(2021, 1, 1), None),
        # k=2: current only
        (2, "gold", d(2020, 6, 1), None),
    ]
    return spark.createDataFrame(
        rows, "k long, tier string, valid_from timestamp, valid_to timestamp"
    )


def test_scd2_change_closes_and_appends(spark):
    d = datetime.datetime
    upd = spark.createDataFrame(
        [(1, "gold", d(2022, 1, 1))], "k long, tier string, effective_ts timestamp"
    )
    out = relational.scd2_apply(_dim(spark), upd, "k", ["tier"]).collect()
    rows = sorted(
        (r["k"], r["tier"], r["valid_from"], r["valid_to"]) for r in out
    )
    assert rows == [
        (1, "bronze", d(2020, 1, 1), d(2021, 1, 1)),  # history untouched
        (1, "gold", d(2022, 1, 1), None),  # new current
        (1, "silver", d(2021, 1, 1), d(2022, 1, 1)),  # closed at effective
        (2, "gold", d(2020, 6, 1), None),  # unrelated key untouched
    ]


def test_scd2_identical_update_is_noop(spark):
    d = datetime.datetime
    upd = spark.createDataFrame(
        [(2, "gold", d(2022, 1, 1))], "k long, tier string, effective_ts timestamp"
    )
    base = _dim(spark)
    out = relational.scd2_apply(base, upd, "k", ["tier"])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, base.collect()))


def test_scd2_new_key_inserts_open_version(spark):
    d = datetime.datetime
    upd = spark.createDataFrame(
        [(9, "bronze", d(2022, 1, 1))], "k long, tier string, effective_ts timestamp"
    )
    out = relational.scd2_apply(_dim(spark), upd, "k", ["tier"])
    got = [r for r in out.collect() if r["k"] == 9]
    assert len(got) == 1
    assert got[0]["valid_from"] == d(2022, 1, 1) and got[0]["valid_to"] is None


def test_scd2_null_attr_equality_is_null_safe(spark):
    """NULL attr == NULL attr must be a no-op (IS NOT DISTINCT FROM), not
    a perpetual re-versioning on every redelivery."""
    d = datetime.datetime
    dim = spark.createDataFrame(
        [(1, None, d(2020, 1, 1), None)],
        "k long, tier string, valid_from timestamp, valid_to timestamp",
    )
    upd = spark.createDataFrame(
        [(1, None, d(2022, 1, 1))], "k long, tier string, effective_ts timestamp"
    )
    assert relational.scd2_apply(dim, upd, "k", ["tier"]).count() == 1


# ---------------------------------------------------- property invariants
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 6), st.sampled_from(["a", "b", None])),
        min_size=0,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    upd=st.lists(
        st.tuples(st.integers(0, 8), st.sampled_from(["a", "b", "c", None])),
        min_size=0,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
)
def test_scd2_apply_is_idempotent_and_conserves_history(spark, data, upd):
    """Random dimensions + random key-unique update batches: (1) applying
    the same batch twice equals applying it once (redelivery idempotency —
    the second apply sees identical current attrs everywhere), and
    (2) closed rows only ever accumulate: every input row's (key,
    valid_from) survives into the output."""
    import datetime

    d0 = datetime.datetime(2020, 1, 1)
    eff = datetime.datetime(2022, 1, 1)
    dim = spark.createDataFrame(
        [(k, v, d0, None) for k, v in data],
        "k long, tier string, valid_from timestamp, valid_to timestamp",
    )
    updates = spark.createDataFrame(
        [(k, v, eff) for k, v in upd],
        "k long, tier string, effective_ts timestamp",
    )
    once = relational.scd2_apply(dim, updates, "k", ["tier"])
    twice = relational.scd2_apply(once, updates, "k", ["tier"])
    key = lambda row: tuple(repr(v) for v in row)
    a = sorted(map(tuple, once.collect()), key=key)
    b = sorted(map(tuple, twice.collect()), key=key)
    assert a == b
    # conservation: every (k, valid_from) of the input survives
    in_keys = {(k, d0) for k, _ in data}
    out_keys = {(r["k"], r["valid_from"]) for r in once.collect()}
    assert in_keys <= out_keys


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    sizes=st.lists(st.integers(0, 9), min_size=1, max_size=5),
    cap=st.integers(1, 10),
)
def test_domain_cap_respects_cap_and_is_a_subset(spark, sizes, cap):
    rows = [
        (d * 100 + i, f"dom{d}") for d, n in enumerate(sizes) for i in range(n)
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = corpus.domain_cap(df, "source", cap)
    got = [(r["doc_id"], r["source"]) for r in out.collect()]
    assert set(got) <= set(rows)  # survivors are input rows
    from collections import Counter

    per = Counter(s for _, s in got)
    for d, n in enumerate(sizes):
        assert per.get(f"dom{d}", 0) == min(n, cap)


# ---------------------------------------------------------------- zone_map
def test_zone_map_per_file_stats_are_exact(spark, tmp_path):
    """Two files with disjoint known ranges: the zone map must report each
    file's exact min/max/null-count — the invariant a pruner relies on."""
    from spark_auto_schema.io import zone_map

    a = spark.createDataFrame([(1,), (5,), (None,)], "v long")
    b = spark.createDataFrame([(100,), (200,)], "v long")
    a.coalesce(1).write.parquet(str(tmp_path / "a"))
    b.coalesce(1).write.parquet(str(tmp_path / "b"))
    df = spark.read.parquet(str(tmp_path / "a"), str(tmp_path / "b"))
    zm = {r["file"].split("/")[-2]: r for r in zone_map(df, ["v"]).collect()}
    assert zm["a"]["v_min"] == 1 and zm["a"]["v_max"] == 5
    assert zm["a"]["v_nulls"] == 1 and zm["a"]["n_rows"] == 3
    assert zm["b"]["v_min"] == 100 and zm["b"]["v_max"] == 200


def test_zone_map_identifies_skippable_files(spark, tmp_path):
    """The point of zone maps: for predicate v > 150, file 'a' ([1,5]) is
    provably skippable from stats alone."""
    from spark_auto_schema.io import zone_map

    spark.createDataFrame([(1,), (5,)], "v long").coalesce(1).write.parquet(
        str(tmp_path / "a")
    )
    spark.createDataFrame([(100,), (200,)], "v long").coalesce(1).write.parquet(
        str(tmp_path / "b")
    )
    df = spark.read.parquet(str(tmp_path / "a"), str(tmp_path / "b"))
    zm = zone_map(df, ["v"])
    from pyspark.sql import functions as F

    skippable = [
        r["file"].split("/")[-2]
        for r in zm.where(F.col("v_max") <= 150).collect()
    ]
    assert skippable == ["a"]


def test_zone_map_is_one_aggregate(spark, tmp_path):
    from spark_auto_schema.io import zone_map
    import io as _io
    from contextlib import redirect_stdout

    spark.range(100).write.mode("overwrite").parquet(str(tmp_path / "t"))
    zm = zone_map(spark.read.parquet(str(tmp_path / "t")), ["id"])
    buf = _io.StringIO()
    with redirect_stdout(buf):
        zm.explain("simple")
    assert buf.getvalue().count("Exchange") == 1  # single file-keyed agg


# ------------------------------------------------------ blocked_fuzzy_pairs
def test_blocked_fuzzy_pairs_finds_near_matches(spark):
    from pyspark.sql import functions as F

    from spark_auto_schema.ops import dedup

    rows = [
        (1, "smith john"),
        (2, "smith jon"),  # dist 1 from id 1? "john"->"jon" = 1 deletion
        (3, "smith joan"),  # dist 1 from 1 ("h"->"a"... actually check)
        (4, "zmith john"),  # different block (first char differs)
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    out = dedup.blocked_fuzzy_pairs(
        df, "id", "name", block=F.substring("name", 1, 6), max_distance=1
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in out}
    assert (1, 2) in got and got[(1, 2)] == 1
    # id 4 shares no block with 1 despite dist 1: blocking recall tradeoff
    assert not any(4 in p for p in got)


def test_blocked_fuzzy_pairs_null_blocks_dropped(spark):
    from pyspark.sql import functions as F

    from spark_auto_schema.ops import dedup

    rows = [(1, None), (2, None), (3, "abc")]
    df = spark.createDataFrame(rows, "id long, name string")
    out = dedup.blocked_fuzzy_pairs(
        df, "id", "name", block=F.substring("name", 1, 2), max_distance=5
    )
    # NULL names -> NULL blocks -> excluded, not matched to each other
    assert out.count() == 0


def test_blocked_fuzzy_pairs_is_an_equi_join(spark):
    """The blocking key must plan as a hash equi-join — a nested-loop or
    cartesian here is the O(n^2) explosion blocking exists to avoid."""
    import io as _io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from spark_auto_schema.ops import dedup

    df = spark.createDataFrame(
        [(i, f"name{i:04d}") for i in range(100)], "id long, name string"
    )
    out = dedup.blocked_fuzzy_pairs(
        df, "id", "name", block=F.substring("name", 1, 7), max_distance=1
    )
    buf = _io.StringIO()
    with redirect_stdout(buf):
        out.explain("simple")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
