"""Unit tests for ops/analytics.py, ops/relational.merge_upsert, and
ops/text.bigram_pmi on small hand-computable inputs — the oracle-vs-Spark
value check at sf0.01 lives in the driver gate / tools/check_correctness.py;
these pin the SEMANTICS (ordering rules, clamping, NULL precedence) that a
matching pair of wrong implementations could otherwise agree on."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from spark_auto_schema.ops import analytics, relational, text


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour, 0, 0)


@pytest.fixture(scope="module")
def funnel_events(spark):
    # u1: full ordered funnel; u2: purchase BEFORE click (breaks at click->
    # purchase? no — breaks at purchase); u3: signup only; u4: click first,
    # then signup (never enters the funnel beyond stage 1? no — no signup
    # precedence violation: signup exists, click after signup? click at d1
    # < signup at d2 -> chain breaks at stage 2).
    rows = [
        (1, _ts(1), "signup"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        (2, _ts(1), "signup"), (2, _ts(3), "click"), (2, _ts(2), "purchase"),
        (3, _ts(1), "signup"),
        (4, _ts(2), "signup"), (4, _ts(1), "click"), (4, _ts(3), "purchase"),
        (5, _ts(1), "click"), (5, _ts(2), "purchase"),
    ]
    return spark.createDataFrame(rows, "user_id int, ts timestamp, etype string")


def test_funnel_strict_ordering(spark, funnel_events):
    out = analytics.funnel_counts(
        funnel_events, "user_id", "ts", "etype", ["signup", "click", "purchase"]
    )
    got = {r["stage"]: r["n_users"] for r in out.collect()}
    # signup: u1,u2,u3,u4.  click-after-signup: u1,u2.  purchase-after-
    # click: u1 only (u2's purchase precedes its click).
    assert got == {"signup": 4, "click": 2, "purchase": 1}


def test_funnel_requires_two_stages(spark, funnel_events):
    with pytest.raises(ValueError):
        analytics.funnel_counts(funnel_events, "user_id", "ts", "etype", ["signup"])


def test_cohort_retention_offset0_equals_cohort_size(spark):
    # two cohorts: users 1-2 first seen week of Jan 1, user 3 week of Jan 8.
    rows = [
        (1, _ts(2)), (1, _ts(9)), (1, _ts(16)),
        (2, _ts(3)), (2, _ts(17)),
        (3, _ts(10)), (3, _ts(16)),
    ]
    e = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = analytics.cohort_retention(e, "user_id", "ts", bucket="week")
    got = {
        (r["cohort_week"].isoformat(), r["week_offset"]): r["n_users"]
        for r in out.collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,  # u1+u2
        ("2024-01-01", 1): 1,  # u1
        ("2024-01-01", 2): 2,  # u1+u2
        ("2024-01-08", 0): 1,  # u3
        ("2024-01-08", 1): 1,  # u3
    }


def test_cohort_retention_rejects_unknown_bucket(spark):
    e = spark.createDataFrame([(1, _ts(1))], "user_id int, ts timestamp")
    with pytest.raises(ValueError):
        analytics.cohort_retention(e, "user_id", "ts", bucket="fortnight")


def test_histogram_clamps_max_and_counts_all(spark):
    df = spark.createDataFrame([(float(v),) for v in range(11)], "x double")
    out = analytics.value_histogram(df, "x", nbins=5).collect()
    by_bin = {r["bin"]: r for r in out}
    # range [0,10], width 2: value 10 must clamp into bin 4, not bin 5
    assert set(by_bin) == {0, 1, 2, 3, 4}
    assert sum(r["n"] for r in out) == 11
    assert by_bin[4]["n"] == 3  # 8, 9, 10
    assert by_bin[0]["lo"] == 0.0 and by_bin[0]["hi"] == 2.0
    assert by_bin[4]["lo"] == 8.0 and by_bin[4]["hi"] == 10.0


def test_zscore_outliers_flags_only_the_spike(spark):
    vals = [10.0] * 20 + [11.0] * 20 + [1000.0]
    df = spark.createDataFrame([("k", v) for v in vals], "k string, v double")
    out = analytics.zscore_outliers(df, "k", "v", threshold=2.5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 41 and r["n_outliers"] == 1
    mu = sum(vals) / len(vals)
    sd = math.sqrt(sum((x - mu) ** 2 for x in vals) / (len(vals) - 1))
    assert r["avg_value"] == round(mu, 4)
    assert r["stddev_value"] == round(sd, 4)


def test_merge_upsert_update_insert_passthrough_and_null_overwrite(spark):
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, s string, v double",
    )
    updates = spark.createDataFrame(
        [(2, "B", None), (4, "d", 40.0)], "k int, s string, v double"
    )
    got = {
        r["k"]: (r["s"], r["v"])
        for r in relational.merge_upsert(base, updates, "k").collect()
    }
    # row 2 fully replaced (NULL v overwrites 20.0 — whole-row precedence),
    # row 4 inserted, rows 1/3 pass through untouched
    assert got == {1: ("a", 10.0), 2: ("B", None), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_insert_only_keeps_base_on_match(spark):
    base = spark.createDataFrame([(1, "a")], "k int, s string")
    updates = spark.createDataFrame([(1, "X"), (2, "b")], "k int, s string")
    got = {
        r["k"]: r["s"]
        for r in relational.merge_upsert(base, updates, "k", insert_only=True).collect()
    }
    assert got == {1: "a", 2: "b"}


def test_merge_upsert_rejects_schema_mismatch(spark):
    base = spark.createDataFrame([(1, "a")], "k int, s string")
    updates = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError):
        relational.merge_upsert(base, updates, "k")


def test_bigram_pmi_ranks_exclusive_pair_above_promiscuous(spark):
    # "aa bb" always co-occur (exclusive pair -> high PMI); "cc" pairs with
    # many different partners (low PMI per pair).  min_count=2 prunes noise.
    docs = [
        ("aa bb cc dd",),
        ("aa bb cc ee",),
        ("aa bb cc ff",),
        ("aa bb cc gg",),
    ]
    df = spark.createDataFrame(docs, "text string")
    out = text.bigram_pmi(df, text_col="text", min_count=2, k=10).collect()
    pairs = [(r["w1"], r["w2"]) for r in out]
    assert ("aa", "bb") in pairs and ("bb", "cc") in pairs
    pmi = {(r["w1"], r["w2"]): r["pmi"] for r in out}
    # P(aa)=P(bb)=4/16, P(aa bb)=4/12 -> PMI=ln((4/12)/(1/16)) > 0 and the
    # aa->bb bond equals bb->cc (both deterministic); no pair with count<2
    assert all(r["n"] >= 2 for r in out)
    assert pmi[("aa", "bb")] == pmi[("bb", "cc")]
    assert pmi[("aa", "bb")] == round(math.log((4 / 12) / ((4 / 16) * (4 / 16))), 4)


def test_bigram_pmi_tokenization_matches_top_terms(spark):
    # punctuation stripped, case folded — "Aa," and "aa" are the same
    # token, so (aa, bb) occurs twice; (bb, aa) occurs once and min_count=2
    # prunes it
    df = spark.createDataFrame([("Aa, bb! Aa, bb!",)], "text string")
    out = text.bigram_pmi(df, text_col="text", min_count=2, k=10).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("aa", "bb")}


def test_histogram_and_zscore_broadcast_small_sides(spark):
    """Plan audit: the 1-row stats frames must reach the fact stream as
    broadcasts — no shuffle of the fact table for stats attachment."""
    df = spark.createDataFrame([("k", float(v)) for v in range(100)], "k string, v double")
    hist_plan = analytics.value_histogram(df, "v")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in hist_plan or "BroadcastExchange" in hist_plan
    z_plan = analytics.zscore_outliers(df, "k", "v")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in z_plan


def test_cohort_retention_day_bucket(spark):
    rows = [
        (1, _ts(1, 1)), (1, _ts(2, 5)),   # cohort Jan 1, active day 0 and 1
        (2, _ts(2, 9)), (2, _ts(2, 23)),  # cohort Jan 2, two events same day
    ]
    e = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = analytics.cohort_retention(e, "user_id", "ts", bucket="day")
    got = {
        (r["cohort_day"].isoformat(), r["day_offset"]): r["n_users"]
        for r in out.collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-02", 0): 1,
    }


def test_zscore_constant_key_reports_zero_outliers(spark):
    """stddev 0 -> every z NULL; the key must report 0 outliers, not NULL
    (the same three-valued-logic trap the funnel fix covers)."""
    df = spark.createDataFrame([("k", 5.0)] * 10 + [("m", 1.0), ("m", 2.0)],
                               "k string, v double")
    out = {r["k"]: r["n_outliers"] for r in
           analytics.zscore_outliers(df, "k", "v").collect()}
    assert out["k"] == 0 and out["m"] == 0


def test_histogram_constant_column_degenerates_consistently(spark):
    """All-constant input: mx == mn, so the raw bin is NULL (try_divide)
    and NULL-skipping least clamps every row into the last bin with
    zero-width edges — no ANSI divide-by-zero error."""
    df = spark.createDataFrame([(7.0,)] * 5, "x double")
    out = analytics.value_histogram(df, "x", nbins=4).collect()
    assert len(out) == 1
    r = out[0]
    assert r["bin"] == 3 and r["n"] == 5
    assert r["lo"] == 7.0 and r["hi"] == 7.0


def test_histogram_excludes_null_values(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,), (None,)], "x double"
    )
    out = analytics.value_histogram(df, "x", nbins=2).collect()
    assert sum(r["n"] for r in out) == 3  # NULLs excluded, not last-binned


def test_funnel_stage_name_with_quote(spark):
    rows = [(1, _ts(1), "sign'up"), (1, _ts(2), "buy")]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, etype string")
    out = analytics.funnel_counts(df, "user_id", "ts", "etype", ["sign'up", "buy"])
    got = {r["stage"]: r["n_users"] for r in out.collect()}
    assert got == {"sign'up": 1, "buy": 1}


# ----------------------------------------------------------------- PSI drift
def test_psi_identical_snapshots_score_zero(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    rows = analytics.psi_drift(df, df, "v", nbins=10).collect()
    assert len(rows) == 10
    assert all(r["psi_term"] == 0.0 for r in rows)
    assert sum(r["base_n"] for r in rows) == 100


def test_psi_detects_planted_shift(spark):
    base = spark.createDataFrame([(float(i % 50),) for i in range(500)], "v double")
    curr = spark.createDataFrame(
        [(float(i % 50) + 30.0,) for i in range(500)], "v double"
    )
    rows = analytics.psi_drift(base, curr, "v", nbins=10).collect()
    assert sum(r["psi_term"] for r in rows) > 0.25  # "drifted" by rule of thumb


def test_psi_out_of_range_current_clamps_to_edge_bins(spark):
    """Bin edges belong to the baseline; current values outside [min, max]
    must land in bin 0 / nbins-1, never vanish."""
    base = spark.createDataFrame([(float(i),) for i in range(10, 20)], "v double")
    curr = spark.createDataFrame([(-100.0,), (0.0,), (100.0,)], "v double")
    rows = {r["bin"]: r for r in analytics.psi_drift(base, curr, "v", nbins=5).collect()}
    assert sum(r["curr_n"] for r in rows.values()) == 3
    assert rows[0]["curr_n"] == 2 and rows[4]["curr_n"] == 1


def test_psi_empty_bin_gets_epsilon_floor(spark):
    base = spark.createDataFrame([(0.0,), (10.0,)], "v double")
    curr = spark.createDataFrame([(0.0,), (0.1,), (9.9,), (10.0,)], "v double")
    rows = {r["bin"]: r for r in analytics.psi_drift(base, curr, "v", nbins=10).collect()}
    assert len(rows) == 10  # full spine, empty bins included
    # bin 5 is empty on both sides: floored proportions, zero term
    assert rows[5]["base_n"] == 0 and rows[5]["curr_n"] == 0
    assert rows[5]["base_p"] == pytest.approx(1e-6)
    assert rows[5]["psi_term"] == 0.0


# ------------------------------------------------------------ SCD2 lookup
@pytest.fixture(scope="module")
def scd2_dim(spark):
    # key 1: two versions [d1, d3), [d3, open); key 2: one open version
    return spark.createDataFrame(
        [
            (1, "bronze", _ts(1), _ts(3)),
            (1, "gold", _ts(3), None),
            (2, "silver", _ts(2), None),
        ],
        "k int, tier string, valid_from timestamp, valid_to timestamp",
    )


def test_scd2_lookup_picks_version_valid_at_fact_time(spark, scd2_dim):
    facts = spark.createDataFrame(
        [(10, 1, _ts(2)), (11, 1, _ts(3)), (12, 1, _ts(9)), (13, 2, _ts(5))],
        "fid int, k int, ts timestamp",
    )
    out = {
        r["fid"]: r["tier"]
        for r in relational.scd2_lookup(facts, scd2_dim, "k", "ts", ["tier"]).collect()
    }
    # boundary: valid_to is EXCLUSIVE, valid_from INCLUSIVE -> d3 is gold
    assert out == {10: "bronze", 11: "gold", 12: "gold", 13: "silver"}


def test_scd2_lookup_uncovered_facts_keep_null(spark, scd2_dim):
    facts = spark.createDataFrame(
        [(20, 1, _ts(1) - dt.timedelta(days=1)), (21, 99, _ts(5))],
        "fid int, k int, ts timestamp",
    )
    rows = relational.scd2_lookup(facts, scd2_dim, "k", "ts", ["tier"]).collect()
    assert len(rows) == 2  # left join: nothing dropped
    assert all(r["tier"] is None for r in rows)


def test_scd2_lookup_is_equi_join_not_nested_loop(spark, scd2_dim):
    facts = spark.createDataFrame([(1, 1, _ts(2))], "fid int, k int, ts timestamp")
    plan = (
        relational.scd2_lookup(facts, scd2_dim, "k", "ts", ["tier"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------- MAD outliers
def test_mad_outliers_resists_masking_where_zscore_fails(spark):
    """The motivating case: several extreme values inflate the stddev so
    much that classic z-score misses them, while median/MAD flags all."""
    vals = [10.0] * 20 + [11.0] * 20 + [1000.0, 2000.0, 3000.0]
    df = spark.createDataFrame([("k", v) for v in vals], "k string, v double")
    mad = analytics.mad_outliers(df, "k", "v", threshold=3.5).collect()[0]
    assert mad["n_outliers"] == 3
    assert mad["median_value"] == pytest.approx(11.0, abs=0.01)  # 22nd of 43
    z = analytics.zscore_outliers(df, "k", "v", threshold=2.5).collect()[0]
    assert z["n_outliers"] < 3  # stddev dragged by its own outliers


def test_mad_outliers_constant_key_reports_zero(spark):
    df = spark.createDataFrame([("k", 5.0)] * 10, "k string, v double")
    r = analytics.mad_outliers(df, "k", "v").collect()[0]
    assert r["n_outliers"] == 0 and r["mad_value"] == 0.0 and r["n"] == 10


def test_mad_outliers_broadcasts_stat_tables(spark):
    df = spark.createDataFrame(
        [(str(i % 3), float(i)) for i in range(60)], "k string, v double"
    )
    plan = (
        analytics.mad_outliers(df, "k", "v")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2  # median + MAD tables


# ------------------------------------------------------- equi-depth histogram
def test_equidepth_histogram_equalizes_skewed_depths(spark):
    """On a heavily skewed column, equi-WIDTH piles everything into one
    bar; equi-DEPTH must keep every bucket near n/k."""
    vals = [float(i) for i in range(100)] + [1e6] * 4
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = analytics.equidepth_histogram(df, "v", nbins=4).collect()
    assert sorted(r["bin"] for r in rows) == [0, 1, 2, 3]
    assert sum(r["n"] for r in rows) == 104
    assert max(r["n"] for r in rows) <= 104 // 4 + 2  # near-equal depths
    wide = {r["bin"]: r["n"] for r in analytics.value_histogram(df, "v", nbins=4).collect()}
    assert wide[0] == 100  # the equi-width failure mode this op fixes


def test_equidepth_histogram_ties_go_to_lower_bin(spark):
    """Values equal to an edge land in the LOWER bin (inclusive upper
    edge), and duplicate-heavy data may legitimately fatten a bucket."""
    df = spark.createDataFrame([(1.0,)] * 6 + [(2.0,)] * 2, "v double")
    rows = {r["bin"]: r for r in analytics.equidepth_histogram(df, "v", nbins=2).collect()}
    # median edge is 1.0 -> all six 1.0s stay in bin 0
    assert rows[0]["n"] == 6 and rows[1]["n"] == 2


def test_equidepth_histogram_no_sort_no_window(spark):
    df = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    plan = (
        analytics.equidepth_histogram(df, "v", nbins=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "rangepartitioning" not in plan  # no global sort


def test_equidepth_histogram_partitioning_invariance(spark):
    df = spark.createDataFrame(
        [(float((i * 37) % 101),) for i in range(500)], "v double"
    )
    a = sorted(tuple(r) for r in analytics.equidepth_histogram(df, "v", 6).collect())
    b = sorted(
        tuple(r)
        for r in analytics.equidepth_histogram(df.repartition(9), "v", 6).collect()
    )
    assert a == b


# ------------------------------------------------------------------ ks_drift
def test_ks_drift_identical_distribution_is_zero(spark):
    """Same data on both sides: every cumulative fraction matches, all
    ks_terms are 0, and both CDFs end at exactly 1 (the clamp guarantees
    every row lands in a bin)."""
    d = spark.range(1_000).select((F.col("id") % 37).cast("double").alias("v"))
    out = analytics.ks_drift(d, d, "v", nbins=10).orderBy("bin").collect()
    assert len(out) == 10
    assert all(r["ks_term"] == 0.0 for r in out)
    assert out[-1]["base_cum_p"] == 1.0 and out[-1]["curr_cum_p"] == 1.0


def test_ks_drift_detects_location_shift(spark):
    """A pure location shift moves every quantile one way — PSI's per-bin
    densities barely move for a small shift, but the cumulative gap
    accumulates; KS must flag it and the max gap must sit mid-CDF."""
    base = spark.range(10_000).select(
        ((F.col("id") % 100) / F.lit(10.0)).alias("v")
    )
    curr = base.select((F.col("v") + F.lit(2.0)).alias("v"))
    out = analytics.ks_drift(base, curr, "v", nbins=10).collect()
    ks = max(r["ks_term"] for r in out)
    assert ks >= 0.15  # 2-unit shift over a 10-unit range
    # current values above the baseline max clamp into the top bin, so the
    # last cumulative fraction is still exactly 1 on both sides
    last = max(out, key=lambda r: r["bin"])
    assert last["base_cum_p"] == 1.0 and last["curr_cum_p"] == 1.0


def test_ks_drift_monotone_cdfs(spark):
    """Cumulative fractions must be non-decreasing in bin order on both
    sides (catches a broken window frame or bin spine)."""
    base = spark.range(5_000).select((F.col("id") % 71).cast("double").alias("v"))
    curr = spark.range(5_000).select(
        ((F.col("id") * 13) % 97).cast("double").alias("v")
    )
    rows = analytics.ks_drift(base, curr, "v", nbins=8).orderBy("bin").collect()
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt["base_cum_p"] >= prev["base_cum_p"]
        assert nxt["curr_cum_p"] >= prev["curr_cum_p"]


# -------------------------------------------------------------- rank_transform
def test_rank_transform_semantics(spark):
    """percent_rank per key: ties share a rank, a singleton key reads 0,
    the max reads 1, and a monotone rescaling of values changes nothing."""
    rows = [("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 40.0), ("b", 7.0)]
    d = spark.createDataFrame(rows, "k string, v double")
    out = analytics.rank_transform(d, "k", "v")
    got = sorted((r["k"], r["v"], r["pct_rank"]) for r in out.collect())
    assert got == [
        ("a", 10.0, 0.0),
        ("a", 20.0, round(1 / 3, 6)),
        ("a", 20.0, round(1 / 3, 6)),
        ("a", 40.0, 1.0),
        ("b", 7.0, 0.0),
    ]
    scaled = analytics.rank_transform(
        d.select("k", (F.col("v") * 100 + 5).alias("v")), "k", "v"
    )
    assert sorted(r["pct_rank"] for r in scaled.collect()) == sorted(
        r["pct_rank"] for r in out.collect()
    )


# -------------------------------------------------------- correlation_matrix
def test_correlation_matrix_known_relationships(spark):
    """A column correlates 1.0 with its own affine image, -1.0 with its
    negation, and NULL against a constant (undefined variance)."""
    d = spark.range(100).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2 + 3).cast("double").alias("y"),
        (-F.col("id")).cast("double").alias("z"),
        F.lit(5.0).alias("c"),
    )
    got = {
        (r["col_a"], r["col_b"]): r["corr"]
        for r in analytics.correlation_matrix(d, ["x", "y", "z", "c"]).collect()
    }
    assert got[("x", "y")] == 1.0
    assert got[("x", "z")] == -1.0
    assert got[("x", "c")] is None
    assert len(got) == 6


# ----------------------------------------------------------- transition_counts
def test_transition_counts_sequence_semantics(spark):
    """Known sequences: transitions count adjacent pairs in time order,
    first events contribute nothing, single-event keys vanish, and each
    prev_state's probabilities sum to 1."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: A -> B -> B -> C ; user 2: A -> C ; user 3: A alone
    for i, (u, s) in enumerate(
        [(1, "A"), (1, "B"), (1, "B"), (1, "C"), (2, "A"), (2, "C"), (3, "A")]
    ):
        rows.append((u, t0 + dt.timedelta(minutes=i), s, i))
    d = spark.createDataFrame(rows, "user_id long, ts timestamp, state string, eid long")
    got = {
        (r["prev_state"], r["next_state"]): (r["n"], r["p"])
        for r in analytics.transition_counts(
            d, "user_id", "ts", "state", tiebreak_col="eid"
        ).collect()
    }
    assert got == {
        ("A", "B"): (1, 0.5),
        ("A", "C"): (1, 0.5),
        ("B", "B"): (1, 0.5),
        ("B", "C"): (1, 0.5),
    }
    from collections import defaultdict

    sums = defaultdict(float)
    for (prev, _), (_, p) in got.items():
        sums[prev] += p
    assert all(abs(s - 1.0) < 1e-9 for s in sums.values())


def test_expectation_suite_single_pass_and_verdicts(spark):
    """Clean frame passes every expectation; each seeded defect flips
    exactly its own constraint; unknown kinds raise."""
    import pytest
    from pyspark.sql import functions as F

    from spark_auto_schema.ops import analytics

    clean = spark.createDataFrame(
        [(1, "O", 10.0), (2, "F", 20.0), (3, "P", 30.0)], "id long, st string, v double"
    )
    exp = [
        ("not_null", "id"),
        ("unique", "id"),
        ("min_at_least", "v", 0.0),
        ("max_at_most", "v", 100.0),
        ("accepted_values", "st", ["O", "F", "P"]),
        ("row_count_at_least", 2),
    ]
    rows = {r["constraint"]: r for r in analytics.expectation_suite(clean, exp).collect()}
    assert len(rows) == 6 and all(r["passed"] for r in rows.values())

    dirty = spark.createDataFrame(
        [(1, "O", -5.0), (1, "X", 20.0), (None, "F", 200.0)],
        "id long, st string, v double",
    )
    bad = {r["constraint"]: r["passed"] for r in analytics.expectation_suite(dirty, exp).collect()}
    assert not bad["not_null(id)"]
    assert not bad["unique(id)"]
    assert not bad["min_at_least(v,0.0)"]
    assert not bad["max_at_most(v,100.0)"]
    assert not bad["accepted_values(st,[O,F,P])"]
    assert bad["row_count_at_least(2)"]

    # nulls count as accepted_values violations, and the whole suite is
    # ONE aggregate: a single-column frame with a null must fail cleanly
    null_enum = spark.createDataFrame([("O",), (None,)], "st string")
    (r,) = analytics.expectation_suite(null_enum, [("accepted_values", "st", ["O"])]).collect()
    assert not r["passed"] and abs(r["observed"] - 0.5) < 1e-9

    with pytest.raises(ValueError):
        analytics.expectation_suite(clean, [("nope", "id")])


def test_pagerank_uniform_cycle_and_dangling_mass(spark):
    """A symmetric cycle ranks uniformly; a dangling sink redistributes its
    mass instead of leaking it (ranks always sum to 1); a sink fed by all
    nodes outranks its feeders."""
    from spark_auto_schema.ops import analytics

    cycle = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)], "src string, dst string, n long"
    )
    r = {x["node"]: x["rank"] for x in analytics.pagerank(cycle).collect()}
    assert all(abs(v - 1 / 3) < 1e-6 for v in r.values())

    # b is dangling (no out-edges): total mass must still be 1
    chain = spark.createDataFrame([("a", "b", 1)], "src string, dst string, n long")
    ranks = analytics.pagerank(chain, iters=5).collect()
    assert abs(sum(x["rank"] for x in ranks) - 1.0) < 1e-5
    rb = {x["node"]: x["rank"] for x in ranks}
    assert rb["b"] > rb["a"]

    star = spark.createDataFrame(
        [("a", "hub", 3), ("b", "hub", 1), ("c", "hub", 2), ("hub", "a", 1)],
        "src string, dst string, n long",
    )
    rs = {x["node"]: x["rank"] for x in analytics.pagerank(star).collect()}
    assert rs["hub"] == max(rs.values())


def test_expectation_suite_verdict_survives_rounding_saturation(spark):
    """The verdict must come from EXACT counts: a single violation in 4M
    rows is a fraction below 5e-7, which rounds to 0.0/1.0 in the
    reported observed metric — the gate must still fail."""
    from pyspark.sql import functions as F

    from spark_auto_schema.ops import analytics

    n = 4_000_000
    big = spark.range(n).select(
        F.when(F.col("id") == 0, None).otherwise(F.col("id")).alias("k"),
        # one duplicate pair: ids 1 and 2 both map to 1
        F.when(F.col("id") == 2, F.lit(1)).otherwise(F.col("id")).alias("u"),
        F.when(F.col("id") == 3, F.lit("X")).otherwise(F.lit("O")).alias("st"),
    )
    rows = {
        r["constraint"]: r
        for r in analytics.expectation_suite(
            big,
            [
                ("not_null", "k"),
                ("unique", "u"),
                ("accepted_values", "st", ["O"]),
            ],
        ).collect()
    }
    nn = rows["not_null(k)"]
    assert nn["observed"] == 0.0 and nn["passed"] is False
    uq = rows["unique(u)"]
    assert uq["observed"] == 1.0 and uq["passed"] is False
    av = rows["accepted_values(st,[O])"]
    assert av["observed"] == 1.0 and av["passed"] is False


def test_recency_weighted_stats_half_life_law(spark):
    """A row exactly one half-life older than the newest weighs 0.5 and
    the newest weighs 1.0; weighted_value is the weight-proportional
    mean; an all-new group has effective_fraction 1.0."""
    import datetime as dt

    from spark_auto_schema.ops import analytics

    t0 = dt.datetime(2024, 1, 15, 0, 0, 0)
    rows = [
        (1, t0, "a", 10.0),                          # newest: w = 1
        (2, t0 - dt.timedelta(days=7), "a", 30.0),   # one half-life: w = 0.5
        (3, t0, "b", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = {r["grp"]: r for r in analytics.recency_weighted_stats(
        df, half_life_days=7.0).collect()}
    a = got["a"]
    assert a["n_events"] == 2
    assert a["weighted_count"] == 1.5
    assert a["weighted_value"] == round((10.0 * 1 + 30.0 * 0.5) / 1.5, 6)
    assert a["effective_fraction"] == 0.75
    b = got["b"]
    assert (b["weighted_count"], b["effective_fraction"]) == (1.0, 1.0)
