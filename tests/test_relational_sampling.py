"""Tests for the temporal relational operators (as-of join, time buckets)
and the deterministic sampling family."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from spark_auto_schema.io import read_table
from spark_auto_schema.ops import relational, sampling, similarity

SF_DIR = "/root/testdata/sf0.001"


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


# ---------------------------------------------------------------- asof_join
@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "l1"),
            (1, _ts("2024-01-01 12:00:00"), "l2"),
            (2, _ts("2024-01-01 09:00:00"), "l3"),
            (3, _ts("2024-01-01 09:00:00"), "l4"),  # key with no right rows
        ],
        "k long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 10.0),
            (1, _ts("2024-01-01 11:00:00"), 20.0),
            (1, _ts("2024-01-01 13:00:00"), 30.0),  # after every left row
            (2, _ts("2024-01-01 09:00:00"), 40.0),  # exactly at left ts
        ],
        "k long, rts timestamp, val double",
    )
    return left, right


def test_asof_join_backward(spark, asof_frames):
    left, right = asof_frames
    out = relational.asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts", value_cols=["val"]
    )
    got = {r["tag"]: (r["rts"], r["val"]) for r in out.collect()}
    assert got["l1"] == (_ts("2024-01-01 09:30:00"), 10.0)
    assert got["l2"] == (_ts("2024-01-01 11:00:00"), 20.0)
    # inclusive: right row at exactly left ts matches
    assert got["l3"] == (_ts("2024-01-01 09:00:00"), 40.0)
    # no prior right row -> NULLs, left row still present
    assert got["l4"] == (None, None)
    assert out.count() == left.count()


def test_asof_join_strict(spark, asof_frames):
    left, right = asof_frames
    out = relational.asof_join(
        left,
        right,
        on="k",
        left_ts="ts",
        right_ts="rts",
        value_cols=["val"],
        strict=True,
    )
    got = {r["tag"]: r["val"] for r in out.collect()}
    # strict: the equal-timestamp right row no longer matches
    assert got["l3"] is None
    assert got["l1"] == 10.0


def test_asof_join_one_shuffle_no_pair_blowup(spark, asof_frames):
    left, right = asof_frames
    out = relational.asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts", value_cols=["val"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + window: no join operator at all in the physical plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # one hash partitioning (+AQE read)


def test_time_bucket_agg(spark):
    e = read_table(spark, SF_DIR, "events")
    out = relational.time_bucket_agg(
        e, "ts", "day", dims=["event_type"], aggs=[F.count(F.lit(1)).alias("n")]
    )
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == e.count()
    days = [r["bucket_ts"] for r in out.select("bucket_ts").distinct().collect()]
    assert all(d.hour == 0 and d.minute == 0 for d in days)


# ----------------------------------------------------------------- sampling
def test_hash_sample_deterministic_and_sized(spark):
    d = read_table(spark, SF_DIR, "documents")
    s1 = {r["doc_id"] for r in sampling.hash_sample(d, "doc_id", 0.2).collect()}
    s2 = {
        r["doc_id"]
        for r in sampling.hash_sample(d.repartition(7), "doc_id", 0.2).collect()
    }
    assert s1 == s2  # content-keyed: partitioning-independent
    n = d.count()
    assert 0.1 * n < len(s1) < 0.3 * n
    # monotone: a smaller fraction's sample nests inside a larger one's
    s_small = {r["doc_id"] for r in sampling.hash_sample(d, "doc_id", 0.05).collect()}
    assert s_small <= s1


def test_stratified_sample_exact_sizes(spark):
    o = read_table(spark, SF_DIR, "orders")
    frac = 0.1
    samp = sampling.stratified_sample(o, "o_orderstatus", "o_orderkey", frac)
    import math

    want = {
        r["o_orderstatus"]: math.ceil(r["n"] * frac)
        for r in o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {
        r["o_orderstatus"]: r["n"]
        for r in samp.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_split_train_eval_partitions(spark):
    d = read_table(spark, SF_DIR, "documents")
    train, ev = sampling.split_train_eval(d, "doc_id", 0.25)
    train_ids = {r["doc_id"] for r in train.select("doc_id").collect()}
    eval_ids = {r["doc_id"] for r in ev.select("doc_id").collect()}
    all_ids = {r["doc_id"] for r in d.select("doc_id").collect()}
    assert train_ids | eval_ids == all_ids
    assert train_ids & eval_ids == set()
    # eval side is the hash_sample of the same fraction
    hs = {r["doc_id"] for r in sampling.hash_sample(d, "doc_id", 0.25).collect()}
    assert eval_ids == hs


def test_fraction_threshold_bounds():
    assert sampling.fraction_threshold(0.0) == "0000"
    # fraction 1.0 must sort above every 4-char hex prefix ("10000" would
    # lexicographically keep only prefixes '0000'..'1000' ~= 6.25%)
    assert sampling.fraction_threshold(1.0) == "g"
    assert all("%04x" % v < "g" for v in (0, 0xFFFF))
    with pytest.raises(ValueError):
        sampling.fraction_threshold(1.5)


def test_fraction_one_keeps_everything(spark):
    d = read_table(spark, SF_DIR, "documents")
    assert sampling.hash_sample(d, "doc_id", 1.0).count() == d.count()
    train, ev = sampling.split_train_eval(d, "doc_id", eval_fraction=1.0)
    assert train.count() == 0 and ev.count() == d.count()


# ---------------------------------------------------------------- ivf / ann
def test_ivf_topk_recall(spark):
    emb = read_table(spark, SF_DIR, "embeddings").cache()
    exact = [r["vec_id"] for r in similarity.cosine_topk(emb, 0, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in similarity.ivf_topk(emb, 0, k=10, nlist=16, nprobe=5).collect()
    ]
    # weakly-correlated synthetic vectors: expect decent but not perfect recall
    assert len(set(exact) & set(approx)) >= 5
    # every approx hit must carry the exact cosine (reranking is exact)
    exact_all = {
        r["vec_id"]: r["cos_sim"]
        for r in similarity.cosine_topk(emb, 0, k=emb.count()).collect()
    }
    got = {
        r["vec_id"]: r["cos_sim"]
        for r in similarity.ivf_topk(emb, 0, k=10, nlist=16, nprobe=5).collect()
    }
    for vid, sim in got.items():
        assert sim == exact_all[vid]


def test_ivf_centroid_count_fixed_wrt_corpus_size(spark):
    # the coarse quantizer must NOT grow with the corpus: same nlist on a
    # corpus twice the size yields the same number of centroids (the premise
    # of "broadcast the centroid table" at 100 TB)
    emb = read_table(spark, SF_DIR, "embeddings")
    bigger = emb.unionByName(
        emb.withColumn("vec_id", F.col("vec_id") + 100000)
    )
    from spark_auto_schema.ops.similarity import norm

    def n_cents(df, nlist):
        return (
            df.select(
                F.col("vec_id").alias("cid"),
                F.col("embedding").alias("cvec"),
                norm(F.col("embedding")).alias("cn"),
            )
            .orderBy(F.md5(F.col("cid").cast("string")), F.col("cid"))
            .limit(nlist)
            .count()
        )

    assert n_cents(emb, 32) == 32 == n_cents(bigger, 32)
    # and the operator still answers correctly on the doubled corpus
    res = similarity.ivf_topk(bigger, 0, k=5, nlist=32, nprobe=4)
    assert res.count() == 5


def test_label_blocked_near_dup_exact(spark):
    import numpy as np

    emb = read_table(spark, SF_DIR, "embeddings").cache()
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in similarity.label_blocked_near_dup(emb, threshold=0.3).collect()
    }
    rows = emb.collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(
            (r["vec_id"], np.array(r["embedding"], dtype=np.float64))
        )
    want = {}
    for vecs in by_label.values():
        for i, (ia, va) in enumerate(vecs):
            for ib, vb in vecs[i + 1 :]:
                cs = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 4)
                if cs >= 0.3:
                    key = (min(ia, ib), max(ia, ib))
                    want[key] = cs
    assert got == want


# -------------------------------------------------------------------- skew
def test_salted_aggregate_matches_plain(spark):
    e = read_table(spark, SF_DIR, "events")
    from spark_auto_schema.ops import skew

    salted = {
        r["event_type"]: (r["n"], r["sv"], r["mn"], r["mx"])
        for r in skew.salted_aggregate(
            e,
            key_col="event_type",
            row_key_col="event_id",
            aggs={
                "n": ("event_id", "count"),
                "sv": ("value", "sum"),
                "mn": ("value", "min"),
                "mx": ("value", "max"),
            },
            salt=4,
        ).collect()
    }
    plain = {
        r["event_type"]: (r["n"], r["sv"], r["mn"], r["mx"])
        for r in e.groupBy("event_type")
        .agg(
            F.count("event_id").alias("n"),
            F.sum("value").alias("sv"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert set(salted) == set(plain)
    for k in plain:
        assert salted[k][0] == plain[k][0]
        assert abs(salted[k][1] - plain[k][1]) < 1e-6
        assert salted[k][2:] == plain[k][2:]


def test_salted_join_matches_plain(spark):
    from spark_auto_schema.ops import skew

    c = read_table(spark, SF_DIR, "customer").select("c_custkey", "c_nationkey")
    n = read_table(spark, SF_DIR, "nation").select("n_nationkey", "n_name")
    plain = c.join(n, c["c_nationkey"] == n["n_nationkey"]).select(
        "c_custkey", "n_name"
    )
    n2 = n.withColumnRenamed("n_nationkey", "c_nationkey")
    salted = skew.salted_join(
        c, n2, on="c_nationkey", big_row_key="c_custkey", salt=4
    ).select("c_custkey", "n_name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    assert salted.count() == plain.count()


# -------------------------------------------------------------------- ewma
def test_ewma_matches_numpy(spark):
    e = read_table(spark, SF_DIR, "events").limit(2000)
    got = relational.ewma(e, "user_id", "ts", "value", alpha=0.3).collect()
    by_user = {}
    for r in sorted(e.select("user_id", "ts", "value").collect(),
                    key=lambda r: (r["user_id"], r["ts"])):
        by_user.setdefault(r["user_id"], []).append(r["value"])
    expect = {}
    for uid, vals in by_user.items():
        y = None
        out = []
        for x in vals:
            y = x if y is None else 0.3 * x + 0.7 * y
            out.append(round(y, 6))
        expect[uid] = out
    got_by_user = {}
    for r in sorted(got, key=lambda r: (r["user_id"], r["ts"])):
        got_by_user.setdefault(r["user_id"], []).append(r["ewma"])
    assert set(got_by_user) == set(expect)
    for uid in expect:
        assert got_by_user[uid] == pytest.approx(expect[uid], abs=1e-6)


def test_range_join_matches_manual(spark):
    e = read_table(spark, SF_DIR, "events").select("event_id", "value")
    tiers = spark.createDataFrame(
        [("low", 0.0, 100.0), ("high", 100.0, 1e9)], "tier string, lo double, hi double"
    )
    got = {r["event_id"]: r["tier"] for r in
           relational.range_join(e, tiers, "value", "lo", "hi").collect()}
    for r in e.collect():
        want = "low" if 0 <= r["value"] < 100 else ("high" if r["value"] >= 100 else None)
        assert got.get(r["event_id"]) == want
    plan = relational.range_join(e, tiers, "value", "lo", "hi")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # fact side never shuffles


def test_weighted_sample_deterministic_and_biased(spark):
    d = read_table(spark, SF_DIR, "documents").withColumn(
        "w", F.length("text").cast("double")
    )
    s1 = {r["doc_id"] for r in sampling.weighted_sample(d, "doc_id", "w", 100).collect()}
    s2 = {
        r["doc_id"]
        for r in sampling.weighted_sample(
            d.repartition(13), "doc_id", "w", 100
        ).collect()
    }
    assert s1 == s2 and len(s1) == 100  # partitioning-invariant row set
    # weight-proportional: the sampled docs must be longer on average
    mean_all = d.agg(F.avg("w")).collect()[0][0]
    mean_sample = (
        d.where(F.col("doc_id").isin(list(s1))).agg(F.avg("w")).collect()[0][0]
    )
    assert mean_sample > mean_all
    # zero/negative weights never win
    d0 = d.withColumn("w", F.when(F.col("doc_id") < 10, -1.0).otherwise(F.col("w")))
    s3 = {r["doc_id"] for r in sampling.weighted_sample(d0, "doc_id", "w", 100).collect()}
    assert all(i >= 10 for i in s3)


def test_weighted_sample_uniform_draw_rarely_ties(spark):
    """The A-ES uniform u must be wide enough that equal-weight rows
    virtually never share a rank key — at the old 4-hex-digit width (65,536
    values) a 10k-row equal-weight frame collides ~53% of the time per pair
    (birthday bound ~ n^2 / 2*65536 >> 1), biasing the key_col tie-break
    toward low keys.  With the 8-hex-digit draw the expected number of
    colliding pairs at n=10k is n^2 / 2^33 ~= 0.01, so we assert zero
    duplicate u values among 10k equal-weight keys."""
    d = spark.range(10_000).select(F.col("id").alias("doc_id"))
    u = sampling._hash_prefix_int(F.col("doc_id"))
    n_distinct = d.select(u.alias("u")).distinct().count()
    assert n_distinct == 10_000


def test_salted_join_absorbs_data_skew_wallclock(spark):
    """Data-level proof the salting WORKS, not just that it plans: joining a
    99%-one-key fact through salted_join must run within ~2x the wall-clock
    of a uniformly-keyed fact of the SAME row count (plus a sub-second noise
    floor).  Without salting, the hot key collapses onto one reducer and the
    stage runs at single-task speed; with salt=16 the hot key fans out
    across reducers and the schedule is balanced regardless of the key
    distribution.  Broadcast and AQE skew-splitting are disabled so the
    measurement isolates the manual salting path (the one used when AQE's
    thresholds miss or the engine must plan deterministically)."""
    import time

    from spark_auto_schema.ops import skew

    rows, nkeys, salt = 300_000, 1_000, 16
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}

    def fact(skewed: bool):
        uniform_key = F.pmod(F.col("id"), nkeys)
        key = (
            F.when(F.pmod(F.col("id"), 100) < 99, F.lit(0)).otherwise(uniform_key)
            if skewed
            else uniform_key
        )
        return spark.range(rows).select(
            key.cast("long").alias("k"), F.col("id").alias("rid")
        )

    dim = spark.range(nkeys).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("v")
    )

    def run(skewed: bool) -> float:
        t0 = time.perf_counter()
        out = skew.salted_join(fact(skewed), dim, on="k", big_row_key="rid", salt=salt)
        [r] = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.pmod(F.xxhash64("v"), F.lit(1_000_003))).alias("s"),
        ).collect()
        assert r["n"] == rows
        return time.perf_counter() - t0

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        run(False)  # warm codegen/JIT for this plan shape
        uniform_t = min(run(False), run(False))
        skewed_t = min(run(True), run(True))
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert skewed_t <= 2.0 * uniform_t + 1.0, (
        f"salted join on 99%-one-key data took {skewed_t:.2f}s vs "
        f"{uniform_t:.2f}s uniform — salting failed to absorb the skew"
    )


def test_skew_profile_measures_hot_key(spark):
    """skew_profile must surface the hot key first with the right share
    and a skew_ratio of max/mean over per-key counts."""
    from spark_auto_schema.ops import skew

    rows = [("hot",)] * 90 + [("a",)] * 5 + [("b",)] * 4 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    out = skew.skew_profile(df, "k", top_k=2).collect()
    assert [r["key"] for r in out] == ["hot", "a"]
    assert out[0]["n"] == 90
    assert out[0]["share"] == 0.9
    # 4 keys, 100 rows -> mean 25; max 90 -> ratio 3.6, same on every row
    assert {r["skew_ratio"] for r in out} == {3.6}


def test_skew_profile_uniform_keys_ratio_one(spark):
    from spark_auto_schema.ops import skew

    df = spark.createDataFrame([(str(i % 10),) for i in range(100)], "k string")
    out = skew.skew_profile(df, "k", top_k=10).collect()
    assert len(out) == 10
    assert all(r["skew_ratio"] == 1.0 and r["n"] == 10 for r in out)


# -------------------------------------------------------------- kfold_assign
def test_kfold_assign_exhaustive_disjoint_deterministic(spark):
    """Every row gets exactly one fold in [0, k); the assignment is a pure
    function of the key (identical across repartitionings); and folds are
    roughly balanced (each within 2x of n/k at n=1000)."""
    d = spark.range(1_000).select(F.col("id").alias("doc_id"))
    out = sampling.kfold_assign(d, "doc_id", k=5)
    sizes = {r["fold"]: r["n"] for r in out.groupBy("fold").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(sizes) == {0, 1, 2, 3, 4}
    assert sum(sizes.values()) == 1_000
    assert all(100 <= n <= 400 for n in sizes.values())
    a = {(r["doc_id"], r["fold"]) for r in out.collect()}
    b = {
        (r["doc_id"], r["fold"])
        for r in sampling.kfold_assign(d.repartition(7), "doc_id", k=5).collect()
    }
    assert a == b
    with pytest.raises(ValueError):
        sampling.kfold_assign(d, "doc_id", k=1)


# -------------------------------------------------------- time_embargo_split
def test_time_embargo_split_boundaries(spark):
    """Rows exactly on the boundaries: train end is EXCLUSIVE (a row at
    cutoff - embargo is embargoed), eval start is INCLUSIVE (a row at
    cutoff is eval)."""
    rows = [
        (1, _ts("2024-01-16 23:59:59")),  # train (just before gap)
        (2, _ts("2024-01-17 00:00:00")),  # embargo (== cutoff - 3 days)
        (3, _ts("2024-01-18 12:00:00")),  # embargo (inside gap)
        (4, _ts("2024-01-20 00:00:00")),  # eval (== cutoff)
        (5, _ts("2024-01-25 00:00:00")),  # eval
    ]
    d = spark.createDataFrame(rows, "id long, ts timestamp")
    got = {
        r["id"]: r["split"]
        for r in sampling.time_embargo_split(
            d, "ts", cutoff="2024-01-20 00:00:00", embargo="3 days"
        ).collect()
    }
    assert got == {1: "train", 2: "embargo", 3: "embargo", 4: "eval", 5: "eval"}


# ------------------------------------------------------------- interval_join
def test_interval_join_matches_bruteforce(spark):
    """The bucketed exactly-once plan must equal the brute-force theta join
    on intervals spanning zero, one, and many buckets, including
    boundary-touching (no match under half-open semantics) and degenerate
    empty intervals (never match)."""
    a_rows = [
        (1, 0.0, 10.0),
        (2, 95.0, 205.0),    # spans 3 buckets at width 100
        (3, 400.0, 400.0),   # empty: start == end
        (4, 500.0, 600.0),
    ]
    b_rows = [
        (10, 5.0, 7.0),      # inside a1
        (11, 10.0, 20.0),    # touches a1 at 10.0: NO match (half-open)
        (12, 0.0, 1000.0),   # overlaps everything non-empty
        (13, 200.0, 300.0),  # overlaps a2 tail
        (14, 390.0, 410.0),  # would hit a3 were it non-empty
    ]
    a = spark.createDataFrame(a_rows, "aid long, s double, e double")
    b = spark.createDataFrame(b_rows, "bid long, bs double, be double")
    got = {
        (r["aid"], r["bid"])
        for r in relational.interval_join(
            a, b, "s", "e", "bs", "be", bucket_seconds=100
        ).collect()
    }
    # the inequality predicate only means "intersects" for NON-empty
    # intervals, so the ground truth filters empties like the operator does
    brute = {
        (r["aid"], r["bid"])
        for r in a.where(F.col("s") < F.col("e"))
        .join(
            b.where(F.col("bs") < F.col("be")),
            (F.col("s") < F.col("be")) & (F.col("bs") < F.col("e")),
        )
        .collect()
    }
    assert got == brute
    assert (1, 11) not in got          # boundary touch is not overlap
    assert all(x[0] != 3 for x in got)  # empty interval matches nothing
    assert (2, 12) in got and (2, 13) in got


def test_interval_join_emits_each_pair_once(spark):
    """A pair sharing MANY buckets must appear exactly once (the
    first-shared-bucket gate, not a distinct)."""
    a = spark.createDataFrame([(1, 0.0, 1000.0)], "aid long, s double, e double")
    b = spark.createDataFrame([(2, 0.0, 1000.0)], "bid long, bs double, be double")
    out = relational.interval_join(a, b, "s", "e", "bs", "be", bucket_seconds=10)
    assert out.count() == 1


def test_interval_join_rejects_shared_columns(spark):
    a = spark.createDataFrame([(1, 0.0, 1.0)], "id long, s double, e double")
    with pytest.raises(ValueError, match="disjoint"):
        relational.interval_join(a, a, "s", "e", "s", "e")


# ---------------------------------------------------------- exact_k_per_group
def test_exact_k_per_group_counts_and_nesting(spark):
    """Every group with >= k rows yields exactly k; smaller groups keep all
    rows; a group's k-sample is a subset of its (k+1)-sample (monotone
    growth, so enlarging an eval set never churns it); and the selection is
    partitioning-invariant."""
    rows = [("a", i) for i in range(10)] + [("b", 100 + i) for i in range(3)]
    df = spark.createDataFrame(rows, "g string, id long")
    k3 = sampling.exact_k_per_group(df, "g", "id", 3)
    counts = {r["g"]: r["n"] for r in k3.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"a": 3, "b": 3}
    ids3 = {(r["g"], r["id"]) for r in k3.collect()}
    ids4 = {(r["g"], r["id"]) for r in sampling.exact_k_per_group(df, "g", "id", 4).collect()}
    assert ids3 < ids4
    ids3_repart = {
        (r["g"], r["id"])
        for r in sampling.exact_k_per_group(df.repartition(8), "g", "id", 3).collect()
    }
    assert ids3 == ids3_repart
    with pytest.raises(ValueError):
        sampling.exact_k_per_group(df, "g", "id", 0)


def test_contrastive_negatives_laws(spark):
    """Determinism across partitionings; no self-negatives; pairs are pure
    functions of (id, rank) — adding corpus rows never changes a pair
    whose bucket representative survives; at most k per anchor."""
    from pyspark.sql import functions as F

    from spark_auto_schema.ops import sampling

    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    a = sampling.contrastive_negatives(docs, k=4, num_buckets=16).collect()
    b = sampling.contrastive_negatives(
        docs.repartition(7), k=4, num_buckets=16
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(r["neg_id"] != r["doc_id"] for r in a)
    per_anchor = {}
    for r in a:
        per_anchor.setdefault(r["doc_id"], []).append(r["neg_rank"])
    assert all(len(v) <= 4 for v in per_anchor.values())
    # stability under growth: adding rows can only change a pair whose
    # bucket ELECTED a new (md5-smaller) representative — every pair whose
    # representative survived the growth is byte-identical
    grown = docs.unionByName(
        spark.range(200, 300).select(F.col("id").alias("doc_id"))
    )
    g = sampling.contrastive_negatives(grown, k=4, num_buckets=16).collect()
    g_reps = {r["neg_id"] for r in g}
    old_pairs = {(r["doc_id"], r["neg_rank"]): r["neg_id"] for r in a}
    for r in g:
        if r["doc_id"] < 200 and r["neg_id"] < 200:
            # an original representative means the bucket minimum did not
            # move => the original run must have produced this exact pair
            assert old_pairs[(r["doc_id"], r["neg_rank"])] == r["neg_id"]
    assert g_reps  # growth still elects representatives


def test_dsir_importance_weights_favor_target_like_docs(spark):
    """A raw doc written in the target slice's vocabulary must out-weigh a
    raw doc written in off-target vocabulary; the draw is deterministic;
    the cut returns min(n, |docs|) rows."""
    from pyspark.sql import functions as F

    from spark_auto_schema.ops import sampling

    rows = (
        # target slice: vocabulary A
        [(i, "t", "alpha beta gamma delta alpha beta") for i in range(10)]
        # raw pool: one doc in vocabulary A, one in vocabulary B
        + [(100, "r", "alpha beta gamma alpha beta gamma"),
           (101, "r", "omega psi chi omega psi chi")]
    )
    df = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    out = sampling.dsir_importance_sample(
        df, target=F.col("grp") == "t", n=50, num_buckets=256
    )
    got = {r["doc_id"]: r for r in out.collect()}
    sampling.release_caches()
    assert len(got) == 12  # n exceeds the pool: everything selected
    assert got[100]["log_weight"] > got[101]["log_weight"]
    again = {r["doc_id"]: r["gumbel_score"] for r in sampling.dsir_importance_sample(
        df, target=F.col("grp") == "t", n=50, num_buckets=256
    ).collect()}
    sampling.release_caches()
    assert again == {k: v["gumbel_score"] for k, v in got.items()}
