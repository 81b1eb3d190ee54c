"""Tests for the round-6 curation operators: cluster-safe splitting,
canonical survivor selection, per-group quantile gating, HLL sharded
uniques, and the Z-order layout writer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_auto_schema.ops import analytics, dedup, sampling

SF_DIR = "/root/testdata/sf0.001"


def _cluster_fixture(spark):
    """6 docs: {1,2,3} one near-dup cluster, {5,6} another, 4 unclustered."""
    docs = spark.createDataFrame(
        [
            (1, "aaaa"),
            (2, "aaaa bbbb"),
            (3, "aaaa bbbb cccc"),
            (4, "standalone"),
            (5, "xx"),
            (6, "xx yy"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    clusters = dedup.dedup_clusters(pairs)
    return docs, clusters


def test_cluster_safe_split_never_straddles(spark):
    docs, clusters = _cluster_fixture(spark)
    out = sampling.cluster_safe_split(docs, "doc_id", clusters, 0.5)
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(rows) == 6
    # whole clusters share a side
    assert rows[1] == rows[2] == rows[3]
    assert rows[5] == rows[6]
    # every assignment is one of the two labels
    assert set(rows.values()) <= {"train", "eval"}


def test_cluster_safe_split_matches_rep_hash(spark):
    """A clustered doc's side equals what split_train_eval gives its
    representative id — the draw is per-cluster, not per-doc."""
    docs, clusters = _cluster_fixture(spark)
    out = sampling.cluster_safe_split(docs, "doc_id", clusters, 0.3)
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    reps = spark.createDataFrame([(1,), (4,), (5,)], "doc_id long")
    train, _ = sampling.split_train_eval(reps, "doc_id", 0.3)
    train_reps = {r["doc_id"] for r in train.collect()}
    assert (rows[3] == "train") == (1 in train_reps)
    assert (rows[4] == "train") == (4 in train_reps)
    assert (rows[6] == "train") == (5 in train_reps)


def test_canonical_survivors_keeps_best_and_singletons(spark):
    docs, clusters = _cluster_fixture(spark)
    surv = dedup.canonical_survivors(docs, "doc_id", clusters, F.length("text"))
    kept = sorted(r["doc_id"] for r in surv.collect())
    # longest member of {1,2,3} is 3; of {5,6} is 6; 4 is a singleton
    assert kept == [3, 4, 6]


def test_canonical_survivors_tie_breaks_by_id(spark):
    docs = spark.createDataFrame(
        [(10, "same"), (11, "same"), (12, "other")], "doc_id long, text string"
    )
    clusters = dedup.dedup_clusters(
        spark.createDataFrame([(10, 11)], "id_a long, id_b long")
    )
    surv = dedup.canonical_survivors(docs, "doc_id", clusters, F.length("text"))
    assert sorted(r["doc_id"] for r in surv.collect()) == [10, 12]


def test_threshold_by_group_is_per_group(spark):
    """Group A's scores are an order of magnitude below group B's — a
    global median would drop all of A; the per-group gate keeps A's own
    upper half."""
    rows = [("a", float(v)) for v in [1, 2, 3, 4]] + [
        ("b", float(v)) for v in [100, 200, 300, 400]
    ]
    df = spark.createDataFrame(rows, "g string, score double")
    out = analytics.threshold_by_group(df, "g", "score", 0.5)
    got = sorted((r["g"], r["score"]) for r in out.collect())
    # median of [1,2,3,4] = 2.5 (interpolated); keep 3,4 / 300,400
    assert got == [("a", 3.0), ("a", 4.0), ("b", 300.0), ("b", 400.0)]


def test_threshold_by_group_approx_matches_exact_here(spark):
    rows = [("a", float(v)) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, score double")
    exact = analytics.threshold_by_group(df, "g", "score", 0.9).count()
    approx = analytics.threshold_by_group(df, "g", "score", 0.9, approx=True).count()
    # percentile_approx is exact at this cardinality; both keep the top ~10
    assert abs(exact - approx) <= 1


def test_sharded_distinct_counts_union_is_consistent(spark):
    rows = [(i % 4, f"u{i % 57}") for i in range(2000)]
    df = spark.createDataFrame(rows, "shard int, user string")
    out = {
        r["shard"]: r["n_unique"]
        for r in analytics.sharded_distinct_counts(df, "shard", "user").collect()
    }
    # 57 uniques overall; every shard sees a subset.  HLL at lg_k=14 is
    # exact at this cardinality (sparse mode).
    assert out["__all__"] == 57
    for s in ("0", "1", "2", "3"):
        assert 0 < out[s] <= 57
    # union estimate >= any shard estimate (monotone under union)
    assert out["__all__"] >= max(v for k, v in out.items() if k != "__all__")


def test_sharded_distinct_single_aggregate_per_level(spark):
    """The sketch build is ONE hash aggregate over the facts; the union is
    an aggregate over |shards| rows — no re-scan, no distinct shuffle of
    raw keys."""
    rows = [(i % 4, f"u{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "shard int, user string")
    plan = analytics.sharded_distinct_counts(df, "shard", "user")._jdf.queryExecution().executedPlan().toString()
    assert "hll_sketch_agg" in plan or "HllSketchAgg" in plan
    # no expand/distinct-aggregate path
    assert "Expand" not in plan


def test_zorder_layout_skips_on_both_columns(spark, tmp_path):
    """The Z-ordered layout must make per-file min/max spans narrow on BOTH
    interleaved columns: for a selective range predicate on EITHER column,
    the fraction of files whose [min,max] span intersects the predicate —
    exactly what a parquet reader must open — is well below 1, while a
    single-column sorted layout prunes on its sort column only."""
    from spark_auto_schema.io import read_table, write_range_partitioned, write_zordered

    li = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    lo_o, hi_o, lo_p, hi_p = li.agg(
        F.min("l_orderkey"), F.max("l_orderkey"), F.min("l_partkey"), F.max("l_partkey")
    ).collect()[0]
    zpath, spath = str(tmp_path / "zo"), str(tmp_path / "single")
    write_zordered(li, zpath, "l_orderkey", "l_partkey", num_files=16)
    write_range_partitioned(li, spath, "l_orderkey", num_files=16)

    def frac_files_touched(path, col, lo, hi):
        spans = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
            .collect()
        )
        hit = sum(1 for r in spans if r["hi"] >= lo and r["lo"] <= hi)
        return hit / len(spans), len(spans)

    # a ~10%-of-value-space range predicate on each dimension
    def band(lo, hi):
        w = (hi - lo) // 10 or 1
        mid = lo + (hi - lo) // 2
        return mid, mid + w

    o_lo, o_hi = band(lo_o, hi_o)
    p_lo, p_hi = band(lo_p, hi_p)

    z_on_o, nf = frac_files_touched(zpath, "l_orderkey", o_lo, o_hi)
    z_on_p, _ = frac_files_touched(zpath, "l_partkey", p_lo, p_hi)
    s_on_o, _ = frac_files_touched(spath, "l_orderkey", o_lo, o_hi)
    s_on_p, _ = frac_files_touched(spath, "l_partkey", p_lo, p_hi)
    assert nf > 8  # enough files for pruning fractions to mean anything
    # single-column layout: near-perfect on its sort column, useless on the other
    assert s_on_o <= 0.25
    assert s_on_p > 0.9
    # z-order: prunes meaningfully on BOTH dimensions (the whole point) —
    # each ~10% band should touch at most ~60% of files even on 16 coarse
    # files, and substantially beat the single-column layout's non-sort dim
    assert z_on_o <= 0.7, z_on_o
    assert z_on_p <= 0.7, z_on_p
    assert z_on_p < s_on_p

    # correctness: roundtrip preserves the rowset
    assert spark.read.parquet(zpath).count() == li.count()


def test_zorder_key_interleaves_bits(spark):
    from spark_auto_schema.io import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "a int, b int"
    ).select(zorder_key(F.col("a"), F.col("b")).alias("z"))
    got = [r["z"] for r in df.collect()]
    # interleave(3=0b11, 5=0b101) = a bits at even positions, b at odd:
    # a: 1->bit0, 1->bit2 ; b: 1->bit1, 0->bit3, 1->bit5 => 0b100111 = 39
    assert got == [0, 1, 2, 39]


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Spark's runtime bloom-filter join injection (the row-level
    complement of partition pruning): when one join side carries a
    selective filter, the optimizer builds a bloom filter over its join
    keys and pushes a might_contain probe into the OTHER side's scan, so
    most probe rows die before the shuffle.  At 100 TB this is the
    difference between shuffling the whole fact table and shuffling the
    ~selectivity fraction that can possibly match.  Production thresholds
    (10 MB creation side / 10 GB application side) are scaled down to fire
    on test-sized data — the rewrite itself is what's under proof."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        # force a shuffle join: broadcast joins skip runtime filters (the
        # broadcast build side already prunes at the probe)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(200_000).select(
            (F.col("id") % 10_000).alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        dim = spark.range(10_000).select(
            F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("v")
        ).where(F.col("k") % 100 == 0)  # selective: 1% of keys survive
        j = big.join(dim, on="k")
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan or "bloom_filter_agg" in plan, plan[:2000]
        assert j.count() == 2_000
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _deinterleave(z: int) -> tuple[int, int]:
    a = b = 0
    for i in range(32):
        a |= ((z >> (2 * i)) & 1) << i
        b |= ((z >> (2 * i + 1)) & 1) << i
    return a, b


def test_zorder_key_roundtrips_under_hypothesis(spark):
    """interleave is a bijection: deinterleaving the key recovers both
    inputs exactly, across the full [0, 2^31) domain — including values
    whose top bit would hit the long sign bit under a 32-bit interleave
    (the overflow class a 16-bit-only test cannot see)."""
    from hypothesis import given, settings, strategies as st

    vals = st.integers(min_value=0, max_value=2**31 - 1)

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.tuples(vals, vals), min_size=1, max_size=20))
    def check(pairs):
        from spark_auto_schema.io import zorder_key

        df = spark.createDataFrame(pairs, "a long, b long").select(
            "a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")
        )
        for r in df.collect():
            assert _deinterleave(r["z"]) == (r["a"], r["b"])

    check()


def test_cluster_safe_split_no_leak_under_hypothesis(spark):
    """For arbitrary pair graphs, cluster_safe_split never assigns two
    transitively-connected docs to different sides."""
    from hypothesis import given, settings, strategies as st

    ids = st.integers(min_value=1, max_value=30)

    @settings(max_examples=15, deadline=None)
    @given(st.lists(st.tuples(ids, ids), min_size=1, max_size=25))
    def check(raw_pairs):
        pairs = [(a, b) for a, b in raw_pairs if a != b]
        if not pairs:
            return
        docs = spark.createDataFrame(
            [(i, f"doc {i}") for i in range(1, 31)], "doc_id long, text string"
        )
        cl = dedup.dedup_clusters(
            spark.createDataFrame(pairs, "id_a long, id_b long")
        )
        out = sampling.cluster_safe_split(docs, "doc_id", cl, 0.5)
        side = {r["doc_id"]: r["split"] for r in out.collect()}
        # union-find ground truth in plain python
        parent = {i: i for i in range(1, 31)}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            parent[find(a)] = find(b)
        for a, b in pairs:
            assert side[a] == side[b], (a, b, side[a], side[b])
        dedup.release_caches()

    check()


def test_apply_tombstones_is_broadcast_anti_join(spark):
    from spark_auto_schema.ops import relational

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], "k long, v string"
    )
    # redelivered tombstones: duplicates must not matter
    tombs = spark.createDataFrame([(3,), (7,), (3,)], "k long")
    out = relational.apply_tombstones(df, tombs, ["k"])
    kept = {r["k"] for r in out.collect()}
    assert len(kept) == 98 and 3 not in kept and 7 not in kept
    plan_str = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_str and "LeftAnti" in plan_str


def test_compact_parquet_hits_target_file_count(spark, tmp_path):
    from spark_auto_schema.io import compact_parquet, read_table

    src = str(tmp_path / "fragmented")
    li = read_table(spark, SF_DIR, "lineitem")
    li.repartition(50).write.parquet(src)  # 50 tiny files
    assert len(list((tmp_path / "fragmented").glob("*.parquet"))) == 50

    dst = str(tmp_path / "compacted")
    # target sized so the whole dataset fits a couple of files
    n = compact_parquet(spark, src, dst, target_file_bytes=512 * 1024)
    got_files = len(list((tmp_path / "compacted").glob("*.parquet")))
    assert got_files == n < 50
    # rowset preserved exactly
    back = spark.read.parquet(dst)
    assert back.count() == li.count()
    assert back.select(F.sum("l_quantity")).first()[0] == li.select(
        F.sum("l_quantity")
    ).first()[0]


def test_cluster_safe_split_fraction_edges(spark):
    docs, clusters = _cluster_fixture(spark)
    all_train = sampling.cluster_safe_split(docs, "doc_id", clusters, 0.0)
    assert {r["split"] for r in all_train.collect()} == {"train"}
    all_eval = sampling.cluster_safe_split(docs, "doc_id", clusters, 1.0)
    assert {r["split"] for r in all_eval.collect()} == {"eval"}


def test_canonical_survivors_tolerates_stale_cluster_rows(spark):
    """A cluster table referencing ids no longer in the corpus (docs were
    hard-deleted since clustering) must not resurrect or drop rows: the
    left join simply never matches the stale ids."""
    docs = spark.createDataFrame(
        [(1, "aa"), (2, "aa bb")], "doc_id long, text string"
    )
    # cluster {1,2,99}: 99 was deleted from the corpus after clustering
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (99, 1)], "id long, cluster_id long"
    )
    surv = dedup.canonical_survivors(docs, "doc_id", clusters, F.length("text"))
    assert [r["doc_id"] for r in surv.collect()] == [2]


def test_threshold_by_group_quantile_edges(spark):
    rows = [("a", float(v)) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, score double")
    # q=0: threshold is the min — everything passes
    assert analytics.threshold_by_group(df, "g", "score", 0.0).count() == 10
    # q=1: threshold is the max — only the max passes
    top = analytics.threshold_by_group(df, "g", "score", 1.0).collect()
    assert [r["score"] for r in top] == [10.0]


def test_apply_tombstones_empty_list_is_noop(spark):
    from spark_auto_schema.ops import relational

    df = spark.createDataFrame([(i,) for i in range(10)], "k long")
    tombs = spark.createDataFrame([], "k long")
    assert relational.apply_tombstones(df, tombs, ["k"]).count() == 10


def test_compact_parquet_large_target_gives_single_file(spark, tmp_path):
    from spark_auto_schema.io import compact_parquet

    src = str(tmp_path / "src")
    spark.range(1000).write.parquet(src)
    n = compact_parquet(spark, src, str(tmp_path / "dst"), 10**9)
    assert n == 1
    assert len(list((tmp_path / "dst").glob("*.parquet"))) == 1


def test_binary_signatures_width_and_determinism(spark):
    from spark_auto_schema.io import read_table
    from spark_auto_schema.ops import similarity

    emb = read_table(spark, SF_DIR, "embeddings")
    d = len(emb.first()["embedding"])
    sigs = similarity.binary_signatures(emb)
    row = sigs.first()
    assert len(row["sig"]) == (d + 31) // 32
    # every word fits 32 unsigned bits — nothing near the long sign bit
    assert all(0 <= w < 2**32 for w in row["sig"])
    # partitioning-invariant: same signatures from a reshuffled input
    again = {
        r["vec_id"]: r["sig"]
        for r in similarity.binary_signatures(emb.repartition(7)).collect()
    }
    assert {r["vec_id"]: r["sig"] for r in sigs.collect()} == again


def test_hamming_topk_orders_and_excludes_query(spark):
    from spark_auto_schema.io import read_table
    from spark_auto_schema.ops import similarity

    emb = read_table(spark, SF_DIR, "embeddings")
    got = similarity.hamming_topk(emb, query_id=0, k=10).collect()
    assert len(got) == 10
    assert all(r["vec_id"] != 0 for r in got)
    dists = [r["hamming"] for r in got]
    assert dists == sorted(dists)
    # an identical vector is at distance 0 of itself: self-query sanity
    # via a doctored copy of vector 0 under a new id
    twin = emb.where(F.col("vec_id") == 0).select(
        F.lit(999_999).alias("vec_id"), "embedding", "label"
    )
    got2 = similarity.hamming_topk(emb.unionByName(twin), query_id=999_999, k=1)
    assert got2.first()["hamming"] == 0  # finds the original at distance 0


def test_pipeline_end_to_end_stage_invariants(spark):
    """The composed pipeline's output must respect each stage's contract:
    every language keeps at most ~half its docs (median gate), no
    content-duplicate survives, and splits are disjoint."""
    import __spark_entry__ as entry

    out = entry.queries()["pipeline_end_to_end"](spark, SF_DIR)
    rows = out.collect()
    assert len(rows) >= 2
    assert {r["split"] for r in rows} <= {"train", "eval"}
    total_kept = sum(r["n_docs"] for r in rows)
    from spark_auto_schema.io import read_table

    n_docs = read_table(spark, SF_DIR, "documents").count()
    # median gate keeps ~half, dedup and split never add rows
    assert 0 < total_kept <= n_docs * 0.6
    dedup.release_caches()


def test_winsorize_clips_only_the_tails(spark):
    from spark_auto_schema.ops import analytics

    rows = [("a", float(v)) for v in range(1, 101)]
    df = spark.createDataFrame(rows, "g string, v double")
    w = analytics.winsorize(df, "g", "v", 0.1, 0.9)
    got = {r["v"]: r["v_winsorized"] for r in w.collect()}
    # p10 of 1..100 (interpolated) = 10.9, p90 = 90.1
    assert got[1.0] == 10.9 and got[5.0] == 10.9
    assert got[100.0] == 90.1 and got[95.0] == 90.1
    assert got[50.0] == 50.0  # interior untouched
    assert len(got) == 100  # no rows dropped


def test_waterfill_allocation_laws(spark):
    """Allocations sum to the budget when it binds; below-level groups
    keep everything; budget >= total caps nothing; a hand-checked level."""
    from pyspark.sql import functions as F

    from spark_auto_schema.ops import corpus

    sizes = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 100), ("d", 200)],
        "src string, n long",
    )
    # total=330, budget=165: a,b kept (30), remaining 135 split over c,d
    # -> level 67.5; allocations 10+20+67.5+67.5 = 165
    rows = {
        r["src"]: r
        for r in corpus.waterfill_allocation(sizes, "src", "n", 0.5).collect()
    }
    assert rows["a"]["allocation"] == 10.0 and not rows["a"]["capped"]
    assert rows["b"]["allocation"] == 20.0 and not rows["b"]["capped"]
    assert rows["c"]["allocation"] == 67.5 and rows["c"]["capped"]
    assert rows["d"]["allocation"] == 67.5 and rows["d"]["capped"]
    assert abs(sum(r["allocation"] for r in rows.values()) - 165.0) < 1e-6

    # budget >= total: level undefined, every group keeps its size
    full = corpus.waterfill_allocation(sizes, "src", "n", 2.0).collect()
    assert all(not r["capped"] and r["allocation"] == r["n_tokens"] for r in full)

    # uniform sizes at binding budget: everyone capped at the same level
    uni = spark.createDataFrame([("x", 100), ("y", 100)], "src string, n long")
    r = corpus.waterfill_allocation(uni, "src", "n", 0.5).collect()
    assert all(x["allocation"] == 50.0 and x["capped"] for x in r)


def test_heavy_hitters_sketch_exact_when_vocab_fits(spark):
    """With the vocabulary inside the sketch capacity the counts are exact
    (equal to the groupBy wordcount) and the threshold is respected."""
    from pyspark.sql import functions as F

    from spark_auto_schema.ops import text as text_ops

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b c d"), (3, "a a e")],
        "doc_id long, text string",
    )
    got = {(r["term"], r["n"]) for r in text_ops.heavy_hitters_sketch(docs, 3).collect()}
    exact = {
        (r["term"], r["n"])
        for r in (
            docs.select(F.explode(F.split("text", " ")).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") >= 3)
            .collect()
        )
    }
    assert got == exact == {("a", 6), ("b", 3)}


def test_heavy_hitters_sketch_fails_loudly_below_error_bound(spark):
    """When min_count is within the sketch's a-priori error bound
    (3.5 * T / max_items_tracked) the threshold contract is not
    guaranteed — the query must raise, never silently return
    lower-bound counts."""
    import pytest

    from spark_auto_schema.ops import text as text_ops

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(20)))], "doc_id long, text string"
    )
    # T=20, M=10 -> bound = floor(7.0) = 7; min_count=5 violates it
    with pytest.raises(Exception, match="error bound"):
        text_ops.heavy_hitters_sketch(
            docs, min_count=5, max_items_tracked=10
        ).collect()
    # min_count=8 clears the bound: the query runs (estimates above the
    # bound are trustworthy, so whatever survives the threshold is real
    # up to the guaranteed error — here we only assert the guard opens)
    text_ops.heavy_hitters_sketch(docs, min_count=8, max_items_tracked=10).collect()


def test_heavy_hitters_sketch_derives_capacity_from_corpus_size(spark):
    """max_items_tracked=None sizes the sketch as 2*ceil(3.5*T/min_count)
    (floor 4096), so the guard provably passes at ANY corpus size — the
    same (corpus, min_count) that hard-errors under a fixed small
    capacity succeeds in auto mode, and corpus_tokens_hint replays that
    sizing without the counting scan (round-8 verdict item)."""
    import pytest

    from pyspark.sql import functions as F

    from spark_auto_schema.ops import text as text_ops

    docs = spark.createDataFrame(
        [(1, " ".join(["hot"] * 5 + [f"t{i}" for i in range(15)]))],
        "doc_id long, text string",
    )
    # T=20: fixed capacity 10 puts min_count=5 inside the error bound...
    with pytest.raises(Exception, match="error bound"):
        text_ops.heavy_hitters_sketch(
            docs, min_count=5, max_items_tracked=10
        ).collect()
    # ...auto mode derives a capacity the guard accepts, and counts are
    # exact (vocab 16 << 4096)
    auto = {(r["term"], r["n"])
            for r in text_ops.heavy_hitters_sketch(docs, 5).collect()}
    assert auto == {("hot", 5)}
    # the hint path (the documented 100 TB mode — no counting scan)
    # produces the identical result
    hinted = {(r["term"], r["n"])
              for r in text_ops.heavy_hitters_sketch(
                  docs, 5, corpus_tokens_hint=20).collect()}
    assert hinted == auto
