"""Law tests for the round-13 operators: streaming drop-rate alerting
(LateDataRateMonitor), the broadcast-join centroid-assignment path's
driver query, topic-mixture drift between snapshots (batch op +
streaming TopicDriftMonitor), and the per-window lateness-mix profiler
(LatenessProfiler).

Each test pins an invariant the DuckDB mirror cannot express (callback
firing semantics, checkpointed-restart state carry-over, plan-shape
selection) — the mirror pins values, these pin the semantics.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark):
    from spark_auto_schema.io import read_table

    return read_table(spark, "/root/testdata/sf0.001", "embeddings").cache()


def _stage(spark, d, rows, name, mt):
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, day, hour), 1) for day, hour in rows],
        "ts timestamp, k int",
    )
    p = os.path.join(d, name)
    df.coalesce(1).write.mode("overwrite").parquet(p + "_tmp")
    f = glob.glob(p + "_tmp/part-*.parquet")[0]
    shutil.move(f, p)
    shutil.rmtree(p + "_tmp")
    os.utime(p, (mt, mt))


def _stream(spark, d):
    return (
        spark.readStream.schema("ts timestamp, k int")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


# ------------------------------------------------- LateDataRateMonitor
def test_late_rate_monitor_fires_exactly_final_crossings(spark, tmp_path):
    """The fired set must equal the set of windows whose FINAL drop rate
    crosses the threshold — no false mid-drain fires (admitted counts are
    final before totals drain, so mid-drain rates only underestimate) and
    no missed windows (the last totals batch evaluates every window).
    Staging reuses the round-12 watermark fixture: day-8 12:00 is the
    only dropped row (its day window closed under the batch-1 filter
    watermark), so day 8 alerts at rate 1.0 and nothing else fires."""
    from spark_auto_schema.streaming import LateDataRateMonitor

    d = str(tmp_path / "drops")
    os.makedirs(d)
    _stage(spark, d, [(1, 0), (2, 0), (3, 0)], "f0.parquet", 1000)
    _stage(spark, d, [(10, 0)], "f1.parquet", 2000)
    _stage(spark, d, [(10, 1)], "f2.parquet", 3000)
    _stage(spark, d, [(9, 18), (8, 12), (11, 0)], "f3.parquet", 4000)

    alerts = []
    mon = LateDataRateMonitor(
        threshold=0.5,
        on_alert=lambda w, drop, tot, rate: alerts.append(
            (w.day, drop, tot, rate)
        ),
        window_duration="1 day",
        delay="1 hour",
    )
    mon.drain(_stream(spark, d), state_partitions=4)
    assert alerts == [(8, 1, 1, 1.0)]
    rep = {r["window_start"].day: r for r in mon.report(spark).collect()}
    assert set(rep) == {1, 2, 3, 8, 9, 10, 11}
    assert rep[8]["n_late_dropped"] == 1 and rep[8]["alert"] is True
    for day in (1, 2, 3, 9, 11):
        assert rep[day]["n_late_dropped"] == 0 and rep[day]["alert"] is False
    assert rep[10]["n_admitted"] == 2
    # the fired set IS the final-crossing set
    fired_days = {w.day for w in mon.fired}
    final_crossing = {
        r["window_start"].day
        for r in mon.report(spark).where(F.col("alert")).collect()
    }
    assert fired_days == final_crossing == {8}


def test_late_rate_monitor_refires_only_on_worsening(spark, tmp_path):
    """A window that crosses the threshold fires once, then again only if
    its rate WORSENS (another straggler lands) — never twice at the same
    level.  Day-2's window closes after f1's watermark; two late day-2
    rows arrive in separate later batches, so the rate goes 1/2 (fire at
    0.5... actually 1 dropped of 2 total) then 2/3 — two fires with
    strictly increasing rates."""
    from spark_auto_schema.streaming import LateDataRateMonitor

    d = str(tmp_path / "drops")
    os.makedirs(d)
    _stage(spark, d, [(2, 0)], "f0.parquet", 1000)
    _stage(spark, d, [(10, 0)], "f1.parquet", 2000)  # wm -> day 9 23:00
    _stage(spark, d, [(10, 1)], "f2.parquet", 3000)
    _stage(spark, d, [(2, 6)], "f3.parquet", 4000)  # late: dropped, 1/2
    _stage(spark, d, [(2, 12)], "f4.parquet", 5000)  # late: dropped, 2/3

    alerts = []
    mon = LateDataRateMonitor(
        threshold=0.4,
        on_alert=lambda w, drop, tot, rate: alerts.append((w.day, rate)),
    )
    mon.drain(_stream(spark, d), state_partitions=4)
    day2 = [a for a in alerts if a[0] == 2]
    assert day2 == [(2, 0.5), (2, 2 / 3)]
    rates = [r for _, r in day2]
    assert rates == sorted(rates) and len(set(rates)) == len(rates)


def test_late_rate_monitor_checkpointed_restart_carries_state(
    spark, tmp_path
):
    """The same monitor instance draining twice over a shared checkpoint
    (the round-12 restart fixture): the recovered watermark keeps
    dropping stragglers, already-processed files are not re-read, and
    the instance's admitted/totals dicts accumulate across drains so
    post-restart rates are computed over the FULL history."""
    from spark_auto_schema.streaming import LateDataRateMonitor

    d = str(tmp_path / "drops")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(d)
    _stage(spark, d, [(1, 0), (2, 0)], "f0.parquet", 1000)
    _stage(spark, d, [(10, 0)], "f1.parquet", 2000)

    mon = LateDataRateMonitor(threshold=0.5)
    mon.drain(_stream(spark, d), state_partitions=4, checkpoint_dir=ckpt)
    assert all(
        r["n_late_dropped"] == 0 for r in mon.report(spark).collect()
    )
    # restart: a day-2 straggler behind the RECOVERED watermark + fresh rows
    _stage(spark, d, [(10, 1)], "f2.parquet", 3000)
    _stage(spark, d, [(2, 12), (11, 0)], "f3.parquet", 4000)
    mon.drain(_stream(spark, d), state_partitions=4, checkpoint_dir=ckpt)
    rep = {r["window_start"].day: r for r in mon.report(spark).collect()}
    # day-2: 1 admitted (pre-restart) of 2 total -> rate 0.5, alert
    assert rep[2]["n_events"] == 2 and rep[2]["n_admitted"] == 1
    assert rep[2]["alert"] is True
    assert {w.day for w in mon.fired} == {2}
    # day-10 both rows admitted across the restart boundary
    assert rep[10]["n_admitted"] == 2 and rep[10]["alert"] is False


def test_late_rate_monitor_validates_threshold(spark):
    from spark_auto_schema.streaming import LateDataRateMonitor

    with pytest.raises(ValueError):
        LateDataRateMonitor(threshold=0.0)
    with pytest.raises(ValueError):
        LateDataRateMonitor(threshold=1.5)


# ------------------------------------------------- centroid_assign_join
def test_centroid_assign_join_query_runs_join_path(spark):
    """The driver query's 300 centroids at the testdata's d=64 sit above
    the literal-node budget (300 * 65 = 19500 > 8192), so its plan must
    be the broadcast-join argmin (the whole point: a driver anchor for
    the non-literal path), and every vector must be assigned exactly
    once."""
    from spark_auto_schema.registry.pipeline_r13 import (
        _CAJ_NLIST,
        _q_centroid_assign_join,
    )
    from spark_auto_schema.ops import similarity

    assert _CAJ_NLIST * 65 > similarity._LITERAL_ASSIGN_NODE_BUDGET
    out = _q_centroid_assign_join(spark, "/root/testdata/sf0.001")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan
    rows = out.collect()
    assert len(rows) == len({r["vec_id"] for r in rows}) == 500
    # hash-sample centroids are corpus members: each centroid's own vector
    # is at distance 0 from itself, so 300 of the assignments have
    # sq_dist exactly 0.0
    assert sum(1 for r in rows if r["sq_dist"] == 0.0) >= 300


# ------------------------------------------------- round-12 ADVICE fixes
def test_quantile_sketch_contract_rejects_degenerate_grid(spark):
    """grid=1 used to ZeroDivisionError at the probs ladder; grid<=0
    built an empty grid — both now raise the explicit ValueError the
    other parameter guards use."""
    from spark_auto_schema.ops import scoring

    df = spark.createDataFrame([(1.0, "a")], "v double, g string")
    for bad in (1, 0, -3):
        with pytest.raises(ValueError, match="grid"):
            scoring.quantile_sketch_contract(df, "v", "g", grid=bad)


def test_quantile_sketch_contract_quotes_value_col(spark):
    """Column names needing backticks (dots) must work on BOTH the exact
    Column-API side and the interpolated approx_percentile expression."""
    from spark_auto_schema.ops import scoring

    df = spark.createDataFrame(
        [(float(i), "a") for i in range(50)], ["the.value", "g"]
    )
    rows = scoring.quantile_sketch_contract(
        df, "the.value", "g", grid=5
    ).collect()
    assert len(rows) == 1 and rows[0]["grid_within_bound"] is True


def test_mix_weights_binding_is_exact_recomputation(spark):
    """binding now uses EXACT equality with the budget min (the absolute
    1e-9 epsilon sat below one ulp at realistic token magnitudes, so it
    only ever matched the exact recomputation anyway — the flag's
    documented semantics made true in code): exactly the argmin
    source(s) carry the flag, even at 1e12-scale token counts."""
    from spark_auto_schema.ops import corpus

    surv = spark.createDataFrame(
        [
            ("a", 3_000_000_000_000),
            ("b", 1_000_000_000_001),
            ("c", 2_000_000_000_000),
        ],
        "source string, tokens_kept_near long",
    )
    out = {
        r["source"]: r
        for r in corpus.post_dedup_mix_weights(
            surv, {"a": 0.5, "b": 0.25, "c": 0.25}
        ).collect()
    }
    # ratios: a 6e12, b ~4.000000000004e12, c 8e12 -> b binds alone
    assert out["b"]["binding"] is True
    assert out["a"]["binding"] is False and out["c"]["binding"] is False
    assert out["b"]["rate"] == 1.0
    corpus.release_caches()


# ------------------------------------------------- topic_share_drift
def test_topic_share_drift_localizes_planted_move(spark):
    """Planted drift: two well-separated topics at (0,10) and (10,0);
    snapshot A is 10/10, snapshot B is 5/15 — the diff must localize the
    move to exactly the two clusters with deltas -0.25/+0.25, shares
    summing to 1 per side and deltas to 0."""
    from spark_auto_schema.ops import similarity

    t0 = [(i, [0.0 + i * 0.001, 10.0]) for i in range(10)]
    t1 = [(100 + i, [10.0, 0.0 + i * 0.001]) for i in range(10)]
    a = spark.createDataFrame(t0 + t1, "vec_id long, embedding array<double>")
    b = spark.createDataFrame(
        t0[:5] + t1 + [(200 + i, [10.0, 0.5 + i * 0.001]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    rows = similarity.topic_share_drift(a, b, nlist=2).collect()
    assert len(rows) == 2
    by_delta = sorted(rows, key=lambda r: r["share_delta"])
    assert by_delta[0]["share_delta"] == -0.25
    assert by_delta[1]["share_delta"] == 0.25
    assert sum(r["share_a"] for r in rows) == 1.0
    assert sum(r["share_b"] for r in rows) == 1.0
    assert abs(sum(r["share_delta"] for r in rows)) < 1e-9
    assert {r["n_a"] for r in rows} == {10} and sorted(
        r["n_b"] for r in rows
    ) == [5, 15]


def test_topic_share_drift_rejects_small_snapshot_a(spark):
    from spark_auto_schema.ops import similarity

    a = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="fewer than nlist"):
        similarity.topic_share_drift(a, a, nlist=4)


def test_topic_share_drift_l1_matches_mix_drift_convention(spark):
    """Cross-op law: sum of |share_delta| over clusters equals the L1
    distance corpus.mix_drift reports for the same assignment treated as
    a categorical column — the two drift dials agree by construction."""
    from spark_auto_schema.io import read_table
    from spark_auto_schema.ops import corpus, similarity
    from pyspark.sql import functions as F2

    embs = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    a = embs.where(F2.col("vec_id") % 2 == 0)
    b = embs.where(F2.col("vec_id") % 3 == 0)
    drift = similarity.topic_share_drift(a, b, nlist=8).collect()
    l1_topic = round(sum(abs(r["share_delta"]) for r in drift), 5)

    init = (
        a.select("vec_id", "embedding")
        .orderBy(F2.md5(F2.col("vec_id").cast("string")), F2.col("vec_id"))
        .limit(8)
        .collect()
    )
    cents = [
        (i, [float(x) for x in r["embedding"]]) for i, r in enumerate(init)
    ]
    assign = lambda df: similarity._assign_nearest(
        df, cents, "embedding", "vec_id", metric="cos", keep_vec=False
    ).withColumn("grp", F2.lit("all"))
    md = corpus.mix_drift(assign(a), assign(b), "grp", "cluster").collect()
    assert len(md) == 1
    assert round(md[0]["l1_distance"], 5) == l1_topic


# ------------------------------------------------- LatenessProfiler
def test_lateness_profiler_buckets_planted_lags(spark, tmp_path):
    """Planted lags against a known frontier: batch 0 sets the frontier
    at day-10 00:00; batch 1 delivers rows 30 min, 5 h, 3 d and 9 d
    behind it — one row per ladder bucket, counted under the right
    day window.  The frontier-setting row itself reads lag 0 (le_1h)."""
    from spark_auto_schema.streaming import LatenessProfiler

    d = str(tmp_path / "drops")
    os.makedirs(d)
    _stage(spark, d, [(10, 0)], "f0.parquet", 1000)
    # lags vs day-10 00:00: 30min (d9 23:30 is hour-granular -> use 23h),
    # stage() only does (day, hour): d9 23h -> 1h lag (le_1h boundary),
    # d9 19h -> 5h (le_1d), d7 0h -> 3d (le_7d), d1 0h -> 9d (gt_7d)
    _stage(spark, d, [(9, 23), (9, 19), (7, 0), (1, 0)], "f1.parquet", 2000)

    prof = LatenessProfiler(ts_col="ts", window_duration="1 day")
    prof.drain(_stream(spark, d))
    got = {
        (r["window_start"].day, r["bucket"]): r["n_events"]
        for r in prof.report(spark).collect()
    }
    assert got == {
        (10, "le_1h"): 1,  # the frontier row, lag 0
        (9, "le_1h"): 1,   # exactly 1 h behind: boundary inclusive
        (9, "le_1d"): 1,
        (7, "le_7d"): 1,
        (1, "gt_7d"): 1,
    }


def test_lateness_profiler_frontier_never_regresses(spark, tmp_path):
    """A late batch (all rows behind the frontier) must not pull the
    frontier back: rows in it are bucketed against the PRIOR frontier,
    and counts accumulate across batches into the same windows."""
    from spark_auto_schema.streaming import LatenessProfiler

    d = str(tmp_path / "drops")
    os.makedirs(d)
    _stage(spark, d, [(10, 0)], "f0.parquet", 1000)
    _stage(spark, d, [(2, 0)], "f1.parquet", 2000)  # 8 d behind -> gt_7d
    _stage(spark, d, [(2, 1)], "f2.parquet", 3000)  # still vs day-10
    prof = LatenessProfiler()
    prof.drain(_stream(spark, d))
    got = {
        (r["window_start"].day, r["bucket"]): r["n_events"]
        for r in prof.report(spark).collect()
    }
    assert got == {(10, "le_1h"): 1, (2, "gt_7d"): 2}


# ------------------------------------------------- TopicDriftMonitor
def test_topic_drift_monitor_fires_on_planted_shift(spark, tmp_path):
    """Planted topic move: baseline is a 50/50 mix of two well-separated
    topics; batch files replay (a) the same 50/50 mix (score ~0, quiet)
    then (b) a 100/0 batch (L1 = |1-0.5| + |0-0.5| = 1.0, fires).  The
    callback carries the batch id and the exact L1."""
    from spark_auto_schema.streaming import TopicDriftMonitor

    t0 = [(i, [0.0 + i * 0.001, 10.0]) for i in range(10)]
    t1 = [(100 + i, [10.0, 0.0 + i * 0.001]) for i in range(10)]
    baseline = spark.createDataFrame(
        t0 + t1, "vec_id long, embedding array<double>"
    )
    d = str(tmp_path / "drops")
    os.makedirs(d)
    mixed = spark.createDataFrame(
        t0[5:] + t1[5:], "vec_id long, embedding array<double>"
    )
    skewed = spark.createDataFrame(
        [(200 + i, [0.0 + i * 0.001, 10.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    for i, df in enumerate((mixed, skewed)):
        p = os.path.join(d, f"f{i}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(p + "_tmp")
        f = glob.glob(p + "_tmp/part-*.parquet")[0]
        shutil.move(f, p)
        shutil.rmtree(p + "_tmp")
        os.utime(p, (1000 + i * 1000, 1000 + i * 1000))

    fires = []
    mon = TopicDriftMonitor(
        baseline,
        nlist=2,
        threshold=0.5,
        on_drift=lambda bid, score: fires.append((bid, score)),
    )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    mon.attach(stream).awaitTermination()
    assert [b for b, _ in fires] == [1]
    assert abs(fires[0][1] - 1.0) < 1e-12
    scores = {bid: s for bid, s, _ in mon.history}
    assert scores[0] == 0.0 and scores[1] == fires[0][1]


def test_topic_drift_monitor_validates_inputs(spark):
    from spark_auto_schema.streaming import TopicDriftMonitor

    base = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="threshold"):
        TopicDriftMonitor(base, threshold=0.0)
    with pytest.raises(ValueError, match="fewer than nlist"):
        TopicDriftMonitor(base, nlist=4)


# ------------------------------------------- quantized_assign_agreement
def test_quantized_agreement_perfect_on_boundary_vectors(spark):
    """Vectors whose components sit exactly on quantization code points
    dequantize to themselves, so agreement must be exactly 1.0 per
    cluster — the contract's fixed point (per-dimension lo/hi map to
    codes 0 and levels-1 exactly, and these vectors use only lo/hi)."""
    from spark_auto_schema.ops import similarity

    pts = [(i, [0.0, 1.0] if i % 2 else [1.0, 0.0]) for i in range(20)]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    rows = similarity.quantized_assign_agreement(df, nlist=2).collect()
    assert len(rows) == 2
    assert all(r["agreement"] == 1.0 and r["n_match"] == r["n_vecs"] for r in rows)
    assert sum(r["n_vecs"] for r in rows) == 20


def test_quantized_agreement_detects_planted_scatter(spark):
    """A vector whose quantization error pushes it across the cluster
    boundary must be counted as a mismatch in its FLOAT cluster's row —
    asserted as a CONCRETE expected mismatch count, so a
    quantized_assign_agreement that (wrongly) reported perfect agreement
    fails here (r13-ADVICE: the prior version's assertions held
    vacuously).  Construction with TRAINED cents [0,5] / [10,5] and
    levels=2: the probe [4.8, 5.0] is cosine-closer to [10,5] (angle
    46.2 deg vs c1's 26.6 deg, c0's 90 deg) -> float cluster 1, but its
    x-code floors to lo (floor(0.48 + 0.5) = 0) so the dequantized
    vector is exactly [0,5] = c0 -> qa cluster 0: one planted, certain
    mismatch; the base vectors are quantization fixed points and always
    match."""
    from spark_auto_schema.ops import similarity
    from spark_auto_schema.ops.similarity import _assign_nearest, _quant_coded

    cents = [(0, [0.0, 5.0]), (1, [10.0, 5.0])]
    df = spark.createDataFrame(
        [(1, [0.0, 5.0]), (2, [10.0, 5.0]), (3, [4.8, 5.0])],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["cluster"]: r
        for r in similarity.quantized_assign_agreement(
            df, levels=2, cents=cents
        ).collect()
    }
    # recompute the expectation from the op's own building blocks: the
    # float-side and dequantized-side assignments of every vector
    ref = {
        r["vec_id"]: r["cluster"]
        for r in _assign_nearest(
            df, cents, "embedding", "vec_id", metric="cos", keep_vec=False
        ).collect()
    }
    dv = (
        _quant_coded(df, "embedding", "vec_id", 2)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "dq"))),
                lambda s: s["dq"],
            ).alias("__dvec")
        )
    )
    qa = {
        r["vec_id"]: r["cluster"]
        for r in _assign_nearest(
            dv, cents, "__dvec", "vec_id", metric="cos", keep_vec=False
        ).collect()
    }
    # the planted geometry: probe lands float-side in cluster 1, snaps
    # to cluster 0 dequantized — the scatter is certain, not incidental
    assert ref[3] == 1 and qa[3] == 0
    assert ref[1] == qa[1] == 0 and ref[2] == qa[2] == 1
    # the op's per-cluster rows must equal the recounted expectation:
    # cluster 0 = {v1} all matching; cluster 1 = {v2, v3} with exactly
    # ONE mismatch (the probe)
    assert (out[0]["n_vecs"], out[0]["n_match"]) == (1, 1)
    assert (out[1]["n_vecs"], out[1]["n_match"]) == (2, 1)
    assert out[1]["agreement"] == 0.5


def test_quantized_agreement_matches_manual_recount(spark, emb):
    """Cross-check on real data: the per-cluster (n_vecs, n_match) must
    equal a manual recount from the two assignment frames the op is
    defined over — the aggregate cannot drift from its own definition."""
    from spark_auto_schema.ops import similarity
    from spark_auto_schema.ops.similarity import (
        _assign_nearest,
        _quant_coded,
    )

    out = {
        r["cluster"]: (r["n_vecs"], r["n_match"])
        for r in similarity.quantized_assign_agreement(emb, nlist=4).collect()
    }
    init = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(4)
        .collect()
    )
    cents = [
        (i, [float(x) for x in r["embedding"]]) for i, r in enumerate(init)
    ]
    ref = {
        r["vec_id"]: r["cluster"]
        for r in _assign_nearest(
            emb, cents, "embedding", "vec_id", metric="cos", keep_vec=False
        ).collect()
    }
    dv = (
        _quant_coded(emb, "embedding", "vec_id", 256)
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "dq"))),
                lambda s: s["dq"],
            ).alias("__dvec")
        )
    )
    qa = {
        r["vec_id"]: r["cluster"]
        for r in _assign_nearest(
            dv, cents, "__dvec", "vec_id", metric="cos", keep_vec=False
        ).collect()
    }
    manual: dict = {}
    for vid, c in ref.items():
        n, m = manual.get(c, (0, 0))
        manual[c] = (n + 1, m + (1 if qa[vid] == c else 0))
    assert out == manual


# --------------------------------------------- restart law tests (r14)
def test_lateness_profiler_checkpointed_restart_rederives_frontier(
    spark, tmp_path
):
    """Process-restart semantics (r13-verdict item 4): a FRESH profiler
    instance resuming from the same checkpoint processes only new files,
    its frontier re-derives from the first post-restart batch, and the
    combined profile (pre-restart report + post-restart report) equals
    the uninterrupted run's — the fixture re-plants the frontier row in
    the post-restart data so the re-derived frontier matches and buckets
    stay consistent."""
    from spark_auto_schema.streaming import LatenessProfiler

    d = str(tmp_path / "drops")
    d2 = str(tmp_path / "control")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(d)
    os.makedirs(d2)
    batches = [
        ([(10, 0)], "f0.parquet", 1000),
        ([(9, 19)], "f1.parquet", 2000),  # 5 h behind -> le_1d
    ]
    post = [
        ([(10, 0), (7, 0)], "f2.parquet", 3000),  # frontier re-plant + 3 d
        ([(1, 0)], "f3.parquet", 4000),  # 9 d behind -> gt_7d
    ]
    for rows, name, mt in batches:
        _stage(spark, d, rows, name, mt)
    prof_a = LatenessProfiler()
    prof_a.drain(_stream(spark, d), checkpoint_dir=ckpt)
    pre = dict(prof_a.counts)
    assert prof_a.frontier is not None

    # process restart: new instance, frontier None, counts empty
    for rows, name, mt in post:
        _stage(spark, d, rows, name, mt)
    prof_b = LatenessProfiler()
    assert prof_b.frontier is None
    prof_b.drain(_stream(spark, d), checkpoint_dir=ckpt)
    # only the new files were read (pre-restart windows absent from B
    # except where post-restart rows landed), and the frontier
    # re-derived to the SAME day-10 00:00 value
    assert prof_b.frontier == prof_a.frontier

    # uninterrupted control over the identical file sequence
    for rows, name, mt in batches + post:
        _stage(spark, d2, rows, name, mt)
    ctrl = LatenessProfiler()
    ctrl.drain(_stream(spark, d2))
    combined: dict = dict(pre)
    for k, v in prof_b.counts.items():
        combined[k] = combined.get(k, 0) + v
    assert combined == ctrl.counts
    got = {
        (r["window_start"].day, r["bucket"]): r["n_events"]
        for r in ctrl.report(spark).collect()
    }
    assert got == {
        (10, "le_1h"): 2,
        (9, "le_1d"): 1,
        (7, "le_7d"): 1,
        (1, "gt_7d"): 1,
    }


def test_lateness_profiler_uncheckpointed_redrain_is_noop(spark, tmp_path):
    """The += accumulation is guarded by the last-seen batch id: an
    uncheckpointed second drain over the SAME directory (which restarts
    at batch 0 and re-reads every file) must leave the profile unchanged
    instead of double-counting every window (r13-ADVICE)."""
    from spark_auto_schema.streaming import LatenessProfiler

    d = str(tmp_path / "drops")
    os.makedirs(d)
    _stage(spark, d, [(10, 0)], "f0.parquet", 1000)
    _stage(spark, d, [(9, 19), (7, 0)], "f1.parquet", 2000)
    prof = LatenessProfiler()
    prof.drain(_stream(spark, d))
    first = dict(prof.counts)
    assert sum(first.values()) == 3
    prof.drain(_stream(spark, d))  # same files, batch ids restart at 0
    assert prof.counts == first


def test_topic_drift_monitor_checkpointed_restart_fire_parity(
    spark, tmp_path
):
    """Process-restart semantics (r13-verdict item 4): a RECONSTRUCTED
    monitor (same baseline frame, same params) resuming from the same
    checkpoint re-derives the identical frozen baseline shares, processes
    only the post-restart files, and fires exactly where an uninterrupted
    run fires — batch ids continue monotonically across the restart, so
    fired batch ids and L1 scores match the control run exactly."""
    from spark_auto_schema.streaming import TopicDriftMonitor

    t0 = [(i, [0.0 + i * 0.001, 10.0]) for i in range(10)]
    t1 = [(100 + i, [10.0, 0.0 + i * 0.001]) for i in range(10)]
    baseline = spark.createDataFrame(
        t0 + t1, "vec_id long, embedding array<double>"
    )
    mixed = spark.createDataFrame(
        t0[5:] + t1[5:], "vec_id long, embedding array<double>"
    )
    skewed = spark.createDataFrame(
        [(200 + i, [0.0 + i * 0.001, 10.0]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )

    def stage_vec(dirname, df, name, mt):
        p = os.path.join(dirname, name)
        df.coalesce(1).write.mode("overwrite").parquet(p + "_tmp")
        f = glob.glob(p + "_tmp/part-*.parquet")[0]
        shutil.move(f, p)
        shutil.rmtree(p + "_tmp")
        os.utime(p, (mt, mt))

    def stream_vec(dirname):
        return (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(dirname)
        )

    d = str(tmp_path / "drops")
    d2 = str(tmp_path / "control")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(d)
    os.makedirs(d2)

    # pre-restart: quiet mixed batch only
    stage_vec(d, mixed, "f0.parquet", 1000)
    fires_a: list = []
    mon_a = TopicDriftMonitor(
        baseline, nlist=2, threshold=0.5,
        on_drift=lambda b, s: fires_a.append((b, s)),
    )
    mon_a.attach(stream_vec(d), checkpoint_dir=ckpt).awaitTermination()
    assert fires_a == [] and len(mon_a.history) == 1

    # restart: reconstruct from the same baseline, resume the checkpoint
    stage_vec(d, skewed, "f1.parquet", 2000)
    fires_b: list = []
    mon_b = TopicDriftMonitor(
        baseline, nlist=2, threshold=0.5,
        on_drift=lambda b, s: fires_b.append((b, s)),
    )
    assert mon_b.baseline_shares == mon_a.baseline_shares
    mon_b.attach(stream_vec(d), checkpoint_dir=ckpt).awaitTermination()
    # only the new file was processed, under the CONTINUED batch id
    assert len(mon_b.history) == 1 and mon_b.history[0][0] == 1

    # uninterrupted control: same file sequence, no restart
    stage_vec(d2, mixed, "f0.parquet", 1000)
    stage_vec(d2, skewed, "f1.parquet", 2000)
    fires_c: list = []
    mon_c = TopicDriftMonitor(
        baseline, nlist=2, threshold=0.5,
        on_drift=lambda b, s: fires_c.append((b, s)),
    )
    mon_c.attach(stream_vec(d2)).awaitTermination()
    assert fires_b == fires_c == [(1, fires_c[0][1])]
    assert abs(fires_b[0][1] - 1.0) < 1e-12


def test_topic_drift_monitor_rejects_empty_baseline_with_cents(spark):
    """Trained `cents` + an empty baseline used to ZeroDivisionError in
    the share division; now an explicit ValueError (r13-ADVICE)."""
    from spark_auto_schema.streaming import TopicDriftMonitor

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="zero assigned rows"):
        TopicDriftMonitor(
            empty, cents=[(0, [1.0, 0.0]), (1, [0.0, 1.0])]
        )


def test_topic_share_drift_empty_snapshot_emits_zero_shares(spark):
    """With trained `cents` and an EMPTY snapshot A the share_a side is
    0/0 — pinned to emit 0.0 (not NULL): every share_delta then reads
    'everything in B is new', and no null ever reaches the driver hash
    (r13-ADVICE)."""
    from spark_auto_schema.ops import similarity

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    b = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    rows = similarity.topic_share_drift(
        empty, b, cents=[(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    ).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["share_a"] == 0.0 and r["n_a"] == 0
        assert r["share_b"] == 0.5
        assert r["share_delta"] == 0.5
