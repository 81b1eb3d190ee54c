"""Law tests for the round-14 operators: the two-level coarse-quantizer
assignment tier of ``_assign_nearest`` (r13-verdict item 2 — the O(n*k)
fan-out and the unbounded centroid broadcast at corpus-driven nlist),
and paragraph-granular dedup provenance.

Each test pins an invariant the DuckDB mirror cannot express (tier
cutover selection, bit-identity across tiers, plan-shape guarantees,
probe monotonicity) — the mirror pins values, these pin the semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark):
    from spark_auto_schema.io import read_table

    return read_table(spark, "/root/testdata/sf0.001", "embeddings").cache()


@pytest.fixture(scope="module")
def cents200(emb):
    init = (
        emb.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(200)
        .collect()
    )
    return [
        (i, [float(x) for x in r["embedding"]]) for i, r in enumerate(init)
    ]


def _plan_counts(df) -> dict:
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    return {
        k: p.count(k)
        for k in (
            "BroadcastNestedLoopJoin",
            "BroadcastHashJoin",
            "CartesianProduct",
        )
    }


# ------------------------------------------------ two-level assignment
def test_two_level_full_probe_bit_identical_to_flat_join(emb, cents200):
    """probe >= m must return the EXACT assignment, bit-identical to the
    flat broadcast-join path (same score doubles, same (d, cid)
    tie-break) — for both metrics.  This is the exactness arm of the
    r13-verdict's done-criterion for the pruned assignment."""
    from spark_auto_schema.ops import similarity as S

    for metric in ("l2", "cos"):
        flat = {
            r["vec_id"]: (r["cluster"], r["__score"])
            for r in S._assign_nearest(
                emb, cents200, "embedding", "vec_id",
                metric=metric, keep_vec=False,
            ).collect()
        }
        two = {
            r["vec_id"]: (r["cluster"], r["__score"])
            for r in S._assign_nearest(
                emb, cents200, "embedding", "vec_id",
                metric=metric, keep_vec=False, probe=10**9,
            ).collect()
        }
        assert flat == two, metric


def test_two_level_full_probe_bit_identical_to_literal(emb, cents200):
    """Three-way tier agreement: with the literal-node budget raised so
    the plan-literal argmin takes 200 centroids, its results must equal
    the two-level full-probe results bit-for-bit — the whole tier
    ladder computes ONE function."""
    from spark_auto_schema.ops import similarity as S

    orig = S._LITERAL_ASSIGN_NODE_BUDGET
    S._LITERAL_ASSIGN_NODE_BUDGET = 10**9
    try:
        lit = {
            r["vec_id"]: (r["cluster"], r["__score"])
            for r in S._assign_nearest(
                emb, cents200, "embedding", "vec_id",
                metric="cos", keep_vec=False,
            ).collect()
        }
    finally:
        S._LITERAL_ASSIGN_NODE_BUDGET = orig
    two = {
        r["vec_id"]: (r["cluster"], r["__score"])
        for r in S._assign_nearest(
            emb, cents200, "embedding", "vec_id",
            metric="cos", keep_vec=False, probe=10**9,
        ).collect()
    }
    assert lit == two


def test_two_level_score_monotone_in_probe(emb, cents200):
    """Growing the probe set can only IMPROVE (never worsen) each
    vector's score: probe p2 > p1 implies score_p2 <= score_p1 per
    vector, and probe = m reaches the exact flat-join score.  This is
    the agreement-bound arm of the done-criterion, stated as a law
    instead of a flaky threshold."""
    from spark_auto_schema.ops import similarity as S

    exact = {
        r["vec_id"]: r["__score"]
        for r in S._assign_nearest(
            emb, cents200, "embedding", "vec_id",
            metric="l2", keep_vec=False,
        ).collect()
    }
    prev = None
    for p in (1, 3, 7, 15):
        cur = {
            r["vec_id"]: r["__score"]
            for r in S._assign_nearest(
                emb, cents200, "embedding", "vec_id",
                metric="l2", keep_vec=False, probe=p,
            ).collect()
        }
        assert set(cur) == set(exact)
        for v, s in cur.items():
            assert s >= exact[v]  # pruned never beats exhaustive
            if prev is not None:
                assert s <= prev[v]  # more probes never hurt
        prev = cur
    assert prev == exact  # probe = m (=15 for k=200) is exhaustive


def test_two_level_bnlj_coarse_matches_literal_coarse(emb, cents200):
    """The coarse stage is itself path-selected (row-local literal
    transform under the node budget, m-row BNLJ + collect_list agg
    above it); both must pick identical probe sets — pinned by equal
    final assignments at a pruned probe where a probe-set flip would
    change results."""
    from spark_auto_schema.ops import similarity as S

    a = {
        r["vec_id"]: (r["cluster"], r["__score"])
        for r in S._assign_nearest(
            emb, cents200, "embedding", "vec_id",
            metric="cos", keep_vec=False, probe=3,
        ).collect()
    }
    orig = S._LITERAL_ASSIGN_NODE_BUDGET
    S._LITERAL_ASSIGN_NODE_BUDGET = 10  # force BNLJ coarse
    try:
        b = {
            r["vec_id"]: (r["cluster"], r["__score"])
            for r in S._assign_nearest(
                emb, cents200, "embedding", "vec_id",
                metric="cos", keep_vec=False, probe=3,
            ).collect()
        }
    finally:
        S._LITERAL_ASSIGN_NODE_BUDGET = orig
    assert a == b


def test_two_level_plan_shapes(emb, cents200):
    """Plan pins for the three two-level variants: (a) literal coarse is
    ZERO-shuffle up to the refine — no BNLJ, refine is a broadcast hash
    EQUI-join; (b) above the coarse node budget the m-row BNLJ appears;
    (c) over the byte budget the refine hint is dropped (AQE may still
    pick broadcast for a small frame — the pin is that no nested-loop
    or cartesian ever appears)."""
    from spark_auto_schema.ops import similarity as S

    c = _plan_counts(
        S._assign_nearest(
            emb, cents200, "embedding", "vec_id",
            metric="l2", keep_vec=False, probe=4,
        )
    )
    assert c["BroadcastNestedLoopJoin"] == 0
    assert c["BroadcastHashJoin"] >= 1
    assert c["CartesianProduct"] == 0

    orig = S._LITERAL_ASSIGN_NODE_BUDGET
    S._LITERAL_ASSIGN_NODE_BUDGET = 10
    try:
        c = _plan_counts(
            S._assign_nearest(
                emb, cents200, "embedding", "vec_id",
                metric="l2", keep_vec=False, probe=4,
            )
        )
    finally:
        S._LITERAL_ASSIGN_NODE_BUDGET = orig
    assert c["BroadcastNestedLoopJoin"] >= 1  # the m-row coarse fan-out
    assert c["CartesianProduct"] == 0

    origB = S._CENTROID_BROADCAST_BYTE_BUDGET
    S._CENTROID_BROADCAST_BYTE_BUDGET = 10
    try:
        c = _plan_counts(
            S._assign_nearest(
                emb, cents200, "embedding", "vec_id",
                metric="l2", keep_vec=False, probe=4,
            )
        )
    finally:
        S._CENTROID_BROADCAST_BYTE_BUDGET = origB
    assert c["BroadcastNestedLoopJoin"] == 0
    assert c["CartesianProduct"] == 0


def test_two_level_auto_cutover_budgets(emb, cents200):
    """_assign_nearest must route to the two-level tier on its own when
    (a) the centroid COUNT exceeds _TWO_LEVEL_CENTROID_BUDGET or (b) the
    estimated centroid-frame BYTES exceed the broadcast budget — and the
    auto default probe must equal ceil(m/4) explicitly passed."""
    from spark_auto_schema.ops import similarity as S

    origK = S._TWO_LEVEL_CENTROID_BUDGET
    S._TWO_LEVEL_CENTROID_BUDGET = 100  # k=200 now above it
    try:
        auto = {
            r["vec_id"]: (r["cluster"], r["__score"])
            for r in S._assign_nearest(
                emb, cents200, "embedding", "vec_id",
                metric="cos", keep_vec=False,
            ).collect()
        }
    finally:
        S._TWO_LEVEL_CENTROID_BUDGET = origK
    # m = ceil(sqrt(200)) = 15 -> default probe = ceil(15/4) = 4
    explicit = {
        r["vec_id"]: (r["cluster"], r["__score"])
        for r in S._assign_nearest(
            emb, cents200, "embedding", "vec_id",
            metric="cos", keep_vec=False, probe=4,
        ).collect()
    }
    assert auto == explicit

    origB = S._CENTROID_BROADCAST_BYTE_BUDGET
    S._CENTROID_BROADCAST_BYTE_BUDGET = 1000  # 200 * (64*8+16) >> 1000
    try:
        byte_auto = {
            r["vec_id"]: (r["cluster"], r["__score"])
            for r in S._assign_nearest(
                emb, cents200, "embedding", "vec_id",
                metric="cos", keep_vec=False,
            ).collect()
        }
    finally:
        S._CENTROID_BROADCAST_BYTE_BUDGET = origB
    assert byte_auto == explicit


def test_two_level_below_budget_path_unchanged(emb, cents200):
    """Sub-budget calls (no probe, k and bytes within budgets) must take
    the EXACT flat/literal tiers — the r14 registry adjudication ('no
    policy pins: sub-budget arithmetic is the identical code path')
    depends on this.  Pinned by plan shape: k=200 at d=64 is above the
    literal node budget and below both two-level budgets, so the plan
    must be the single flat BNLJ with NO equi-join refine."""
    from spark_auto_schema.ops import similarity as S

    assert len(cents200) <= S._TWO_LEVEL_CENTROID_BUDGET
    assert S._centroid_bytes(cents200) <= S._CENTROID_BROADCAST_BYTE_BUDGET
    c = _plan_counts(
        S._assign_nearest(
            emb, cents200, "embedding", "vec_id",
            metric="l2", keep_vec=False,
        )
    )
    assert c["BroadcastNestedLoopJoin"] >= 1
    assert c["BroadcastHashJoin"] == 0
    assert c["CartesianProduct"] == 0


# ------------------------------------- centroid_assign_two_level query
def test_two_level_query_constants_match_implementation():
    """The oracle SQL bakes in the group size / group count / probe the
    Spark tier derives internally from k — pin the registry's derivation
    against the implementation's formulas so a drive-by change to either
    (probe fraction, sqrt grouping, ceil arithmetic) fails here instead
    of hash-failing a driver round later."""
    import math

    from spark_auto_schema.ops import similarity as S
    from spark_auto_schema.registry.pipeline_r14 import (
        _CATL_GSZ,
        _CATL_K,
        _CATL_M,
        _CATL_NGROUPS,
        _CATL_PROBE,
        _CATL_SAMPLE,
    )

    k = _CATL_SAMPLE * (_CATL_SAMPLE - 1) // 2
    assert _CATL_K == k and k > S._TWO_LEVEL_CENTROID_BUDGET
    m = math.isqrt(k - 1) + 1
    gsz = -(-k // m)
    assert (_CATL_M, _CATL_GSZ) == (m, gsz)
    assert _CATL_NGROUPS == -(-k // gsz)
    assert _CATL_PROBE == max(
        1, math.ceil(_CATL_NGROUPS * S._TWO_LEVEL_DEFAULT_PROBE_FRAC)
    )


def test_two_level_query_runs_pruned_tier(spark):
    """The driver query's 1540 pairwise-mean centroids exceed the
    two-level budget at EVERY scale factor (the codebook size is a
    constant, not corpus-driven), so its plan must be the pruned tier —
    literal coarse (zero BNLJ) + broadcast hash equi-join refine — and
    every vector assigned exactly once."""
    from spark_auto_schema.registry.pipeline_r14 import (
        _q_centroid_assign_two_level,
    )

    out = _q_centroid_assign_two_level(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert len(rows) == len({r["vec_id"] for r in rows}) == 500


# ------------------------------------------- paragraph dedup provenance
def test_paragraph_provenance_planted_stages(spark):
    """Planted three-way fixture at 8-word segment granularity: doc 1 and
    doc 2 open with the IDENTICAL paragraph (doc 2's copy is an exact
    segment drop attributed to (1,0)); doc 3 opens with a period-3
    cyclic variant — DIFFERENT text but the SAME 3-shingle set, so its
    MinHash signature collides and Jaccard is 1.0: a near drop among
    exact survivors, attributed to the numerically smallest partner
    (1,0).  Every filler segment is unique and must be kept with NULL
    winners."""
    from spark_auto_schema.ops import dedup

    cyc1 = "w1 w2 w3 w1 w2 w3 w1 w2"
    cyc2 = "w2 w3 w1 w2 w3 w1 w2 w3"
    fill = lambda tag: " ".join(f"{tag}{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, cyc1 + " " + fill("a"), "s1"),
            (2, cyc1 + " " + fill("b"), "s1"),
            (3, cyc2 + " " + fill("c"), "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r["doc_id"], r["seg_idx"]): r
        for r in dedup.paragraph_dedup_provenance(docs).collect()
    }
    assert len(out) == 6
    assert out[(1, 0)]["stage"] == "kept"
    assert out[(2, 0)]["stage"] == "exact"
    assert (
        out[(2, 0)]["winner_doc_id"],
        out[(2, 0)]["winner_seg_idx"],
    ) == (1, 0)
    assert out[(3, 0)]["stage"] == "near"
    assert (
        out[(3, 0)]["winner_doc_id"],
        out[(3, 0)]["winner_seg_idx"],
    ) == (1, 0)
    for key in ((1, 1), (2, 1), (3, 1)):
        r = out[key]
        assert r["stage"] == "kept"
        assert r["winner_doc_id"] is None and r["winner_seg_idx"] is None
    assert out[(1, 0)]["source"] == "s1" and out[(3, 0)]["source"] == "s2"


def test_paragraph_provenance_invariants_on_real_corpus(spark):
    """Structural laws on the real documents table: one row per segment;
    kept rows carry NULL winners; every exact/near winner is numerically
    SMALLER than its victim (the keep-lowest rule is what makes the
    attribution deterministic); and no cartesian product appears in the
    plan."""
    from spark_auto_schema.io import read_table
    from spark_auto_schema.ops import dedup

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    df = dedup.paragraph_dedup_provenance(docs)
    rows = df.collect()
    assert len(rows) == len({(r["doc_id"], r["seg_idx"]) for r in rows})
    for r in rows:
        if r["stage"] == "kept":
            assert r["winner_doc_id"] is None and r["winner_seg_idx"] is None
        else:
            assert r["winner_doc_id"] is not None
            assert (r["winner_doc_id"], r["winner_seg_idx"]) < (
                r["doc_id"],
                r["seg_idx"],
            )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


# ------------------------------------------- two_level_probe_sweep
def test_probe_sweep_monotone_and_exact_anchor(spark, emb, cents200):
    """The agreement curve must be monotone nondecreasing in probe, the
    appended full-probe row must be EXACT (agreement 1.0 — the law that
    anchors the whole curve), and n_vecs must be the corpus size on
    every row."""
    from spark_auto_schema.ops import similarity as S

    rows = sorted(
        S.two_level_probe_sweep(emb, cents200, probes=(1, 3, 7)).collect(),
        key=lambda r: r["probe"],
    )
    assert [r["probe"] for r in rows] == [1, 3, 7, 15]  # 15 = n_groups
    assert all(r["n_vecs"] == 500 for r in rows)
    matches = [r["n_match"] for r in rows]
    assert matches == sorted(matches)
    assert rows[-1]["agreement"] == 1.0 and rows[-1]["n_match"] == 500


def test_probe_sweep_matches_assign_nearest_per_probe(spark, emb, cents200):
    """Cross-op bit-consistency: the sweep's n_match at probe p must
    equal a manual recount from _assign_nearest(probe=p) vs the
    exhaustive assignment — the contract cannot drift from the tier it
    prices (the quantized_assign_agreement recount pattern)."""
    from spark_auto_schema.ops import similarity as S

    rows = {
        r["probe"]: r["n_match"]
        for r in S.two_level_probe_sweep(
            emb, cents200, probes=(2, 5)
        ).collect()
    }
    exact = {
        r["vec_id"]: r["cluster"]
        for r in S._assign_nearest(
            emb, cents200, "embedding", "vec_id",
            metric="l2", keep_vec=False, probe=10**9,
        ).collect()
    }
    for p in (2, 5):
        pruned = {
            r["vec_id"]: r["cluster"]
            for r in S._assign_nearest(
                emb, cents200, "embedding", "vec_id",
                metric="l2", keep_vec=False, probe=p,
            ).collect()
        }
        manual = sum(1 for v in exact if pruned[v] == exact[v])
        assert rows[p] == manual, p


# ------------------------------------------- quantizer lifecycle
def test_quantizer_roundtrip_bit_exact(spark, emb, cents200, tmp_path):
    """save_centroids -> load_centroids must return the EXACT input list
    (cids and double values bit-for-bit — parquet stores doubles
    exactly), and an assignment through the loaded codebook must equal
    one through the original list — cluster ids stay comparable across
    the persistence boundary."""
    from spark_auto_schema.ops import similarity as S

    p = str(tmp_path / "codebook")
    S.save_centroids(cents200, p, spark)
    loaded = S.load_centroids(spark, p)
    assert loaded == sorted(cents200)
    a = {
        r["vec_id"]: (r["cluster"], r["__score"])
        for r in S._assign_nearest(
            emb, cents200, "embedding", "vec_id",
            metric="cos", keep_vec=False,
        ).collect()
    }
    b = {
        r["vec_id"]: (r["cluster"], r["__score"])
        for r in S._assign_nearest(
            emb, loaded, "embedding", "vec_id",
            metric="cos", keep_vec=False,
        ).collect()
    }
    assert a == b


def test_quantizer_load_validates_artifact(spark, tmp_path):
    """A corrupted codebook must raise, not silently skew every
    downstream share: empty artifact, duplicate cids, and ragged vector
    dimensions each get an explicit ValueError."""
    import pytest as _pytest

    from spark_auto_schema.ops import similarity as S

    with _pytest.raises(ValueError, match="empty"):
        S.save_centroids([], str(tmp_path / "x"), spark)

    schema = "cid int, cvec array<double>"
    empty = str(tmp_path / "empty")
    spark.createDataFrame([], schema).write.parquet(empty)
    with _pytest.raises(ValueError, match="empty"):
        S.load_centroids(spark, empty)

    dup = str(tmp_path / "dup")
    spark.createDataFrame(
        [(0, [1.0]), (0, [2.0])], schema
    ).write.parquet(dup)
    with _pytest.raises(ValueError, match="duplicate"):
        S.load_centroids(spark, dup)

    ragged = str(tmp_path / "ragged")
    spark.createDataFrame(
        [(0, [1.0]), (1, [1.0, 2.0])], schema
    ).write.parquet(ragged)
    with _pytest.raises(ValueError, match="ragged"):
        S.load_centroids(spark, ragged)


# ------------------------------------------- probe knob plumbing
def test_probe_knob_passthrough_family(spark, emb, cents200):
    """The probe knob surfaced on the assignment consumers must (a) at
    probe >= n_groups reproduce the default EXACT results bit-for-bit
    (the two-level full-probe law lifted to the op level), and (b) at a
    pruned probe still return one verdict per vector.  Covers
    semantic_dedup, topic_shares, and kmeans_assign; the other
    consumers route through the same two arguments."""
    from spark_auto_schema.ops import similarity as S

    full = 10**9  # clamped to n_groups internally
    base = {
        r["vec_id"]: (r["cluster"], r["kept"])
        for r in S.semantic_dedup(emb, threshold=0.8, nlist=16).collect()
    }
    viaknob = {
        r["vec_id"]: (r["cluster"], r["kept"])
        for r in S.semantic_dedup(
            emb, threshold=0.8, nlist=16, probe=full
        ).collect()
    }
    assert base == viaknob
    pruned = S.semantic_dedup(emb, threshold=0.8, nlist=16, probe=1).collect()
    assert len(pruned) == 500

    ts = {
        r["cluster"]: r["n_vecs"]
        for r in S.topic_shares(emb, nlist=8).collect()
    }
    tsk = {
        r["cluster"]: r["n_vecs"]
        for r in S.topic_shares(emb, nlist=8, probe=full).collect()
    }
    assert ts == tsk

    init = sorted(cents200)[:32]
    ka = {
        r["vec_id"]: (r["cluster"], r["sq_dist"])
        for r in S.kmeans_assign(emb, init).collect()
    }
    kak = {
        r["vec_id"]: (r["cluster"], r["sq_dist"])
        for r in S.kmeans_assign(emb, init, probe=full).collect()
    }
    assert ka == kak
