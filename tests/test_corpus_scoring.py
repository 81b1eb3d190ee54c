"""Corpus-lifecycle (profile/diff/shuffle/mix) and batch-inference tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spark_auto_schema.io import read_table
from spark_auto_schema.ops import corpus, dedup, scoring

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF_DIR, "documents").cache()


# --------------------------------------------------------------- profiling
def test_profile_table_values(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, "a", 7.0), (4, None, 5.0)],
        "id long, s string, v double",
    )
    prof = {r["column"]: r for r in corpus.profile_table(df).collect()}
    assert set(prof) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in prof.values())
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["n_distinct"] == 2
    assert prof["v"]["n_nulls"] == 1 and prof["v"]["n_distinct"] == 2
    assert prof["id"]["min_value"] == "1" and prof["id"]["max_value"] == "4"
    # native-type min, not lexicographic on the string form
    df2 = spark.createDataFrame([(9,), (10,)], "n long")
    p2 = corpus.profile_table(df2).collect()[0]
    assert p2["min_value"] == "9" and p2["max_value"] == "10"


def test_profile_is_two_hash_aggregating_scans(spark, docs):
    """Plan pin for the r14 profile split: the count/null/distinct pass
    and the min/max pass run as SEPARATE scans so the multi-distinct
    Expand stays a HashAggregate — min/max over string columns carry
    variable-length agg buffers that would force the whole (Expanded)
    relation through SortAggregate if mixed into one pass."""
    plan = corpus.profile_table(
        docs, ["doc_id", "lang", "source"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 2  # two column-pruned passes, not one per column
    assert "Expand" in plan  # the multi-distinct rewrite is still one pass
    # every count/distinct aggregate must live in a HashAggregate; only
    # the keyless min/max pass (no sort actually runs for a global
    # aggregate) may plan as SortAggregate
    sort_agg_lines = [l for l in plan.splitlines() if "SortAggregate" in l]
    assert sort_agg_lines, "min/max pass expected"
    assert all("count(" not in l for l in sort_agg_lines), sort_agg_lines


# ------------------------------------------------------------ snapshot diff
def test_corpus_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "alpha"), (2, "BETA-CHANGED"), (4, "delta")],
        "doc_id long, text string",
    )
    d = {r["doc_id"]: r["status"] for r in corpus.corpus_diff(old, new).collect()}
    assert d == {2: "CHANGED", 3: "REMOVED", 4: "ADDED"}
    full = corpus.corpus_diff(old, new, include_unchanged=True).collect()
    assert {r["doc_id"]: r["status"] for r in full}[1] == "UNCHANGED"


def test_corpus_diff_multi_column_fingerprint(spark):
    old = spark.createDataFrame([(1, "x", "en")], "doc_id long, text string, lang string")
    new = spark.createDataFrame([(1, "x", "fr")], "doc_id long, text string, lang string")
    out = corpus.corpus_diff(old, new, fingerprint_cols=["text", "lang"]).collect()
    assert [(r["doc_id"], r["status"]) for r in out] == [(1, "CHANGED")]
    # restricting the fingerprint to text hides the lang change
    assert corpus.corpus_diff(old, new, fingerprint_cols=["text"]).count() == 0


# ------------------------------------------------------------ epoch shuffle
def test_epoch_shuffle_is_deterministic_permutation(spark, docs):
    a = corpus.epoch_shuffle(docs, seed=7, num_shards=8).collect()
    b = corpus.epoch_shuffle(docs, seed=7, num_shards=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == docs.count()
    assert {r["doc_id"] for r in a} == {r["doc_id"] for r in docs.collect()}
    # every shard's positions are contiguous 1..n_shard
    by_shard: dict[int, list[int]] = {}
    for r in a:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_epoch_shuffle_seed_changes_order(spark, docs):
    a = {(r["doc_id"], r["shard"], r["pos_in_shard"])
         for r in corpus.epoch_shuffle(docs, seed=1, num_shards=8).collect()}
    b = {(r["doc_id"], r["shard"], r["pos_in_shard"])
         for r in corpus.epoch_shuffle(docs, seed=2, num_shards=8).collect()}
    assert a != b  # different epoch => different permutation


def test_epoch_shuffle_window_is_shard_partitioned(spark, docs):
    plan = corpus.epoch_shuffle(
        docs, num_shards=8
    )._jdf.queryExecution().executedPlan().toString()
    # the sort must be shard-local: no SinglePartition exchange anywhere
    assert "SinglePartition" not in plan


# -------------------------------------------------------------- mix weights
def test_mix_weights_alpha_extremes(spark):
    rows = [(f"d{i}", j) for i, n in enumerate([10, 40]) for j in range(n)]
    df = spark.createDataFrame(rows, "source string, x long")
    prop = {r["domain"]: r for r in corpus.mix_weights(df, alpha=1.0, budget=100).collect()}
    assert prop["d0"]["weight"] == pytest.approx(0.2)
    assert prop["d1"]["weight"] == pytest.approx(0.8)
    assert prop["d1"]["target_docs"] == 80
    unif = {r["domain"]: r["weight"] for r in corpus.mix_weights(df, alpha=0.0).collect()}
    assert unif["d0"] == unif["d1"] == pytest.approx(0.5)
    # 0 < alpha < 1 up-weights the tail vs natural proportions
    temp = {r["domain"]: r["weight"] for r in corpus.mix_weights(df, alpha=0.5).collect()}
    assert 0.2 < temp["d0"] < 0.5


# ------------------------------------------------------------ segment dedup
def test_segment_dedup_drops_repeated_segments(spark):
    seg_a = "w1 w2 w3 w4"  # 4-word segments
    df = spark.createDataFrame(
        [
            (1, f"{seg_a} u1 u2 u3 u4"),
            (2, f"{seg_a} v1 v2 v3 v4"),  # first segment repeats doc 1's
            (3, "x1 x2 x3 x4 y1 y2"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.segment_dedup(df, seg_words=4).collect()}
    assert out[1]["n_segments"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["n_segments"] == 2 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == "v1 v2 v3 v4"
    assert out[3]["n_kept"] == 2 and out[3]["clean_text"] == "x1 x2 x3 x4 y1 y2"


def test_segment_dedup_all_dropped_doc_still_present(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedup.segment_dedup(df, seg_words=4).collect()}
    assert out[1]["n_kept"] == 1
    assert out[2]["n_kept"] == 0 and out[2]["clean_text"] == ""


# ------------------------------------------------------------ ngram novelty
def test_ngram_novelty_first_doc_fully_novel(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "p q r s t")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.ngram_novelty(df, n=3).collect()}
    assert out[1]["novelty"] == 1.0
    assert out[2]["novelty"] == 0.0  # every shingle first seen in doc 1
    assert out[3]["novelty"] == 1.0
    assert out[1]["n_shingles"] == 3  # "a b c","b c d","c d e"


def test_ngram_novelty_hashed_matches_plain(spark, docs):
    plain = {(r["doc_id"], r["novelty"])
             for r in dedup.ngram_novelty(docs, n=3).collect()}
    hashed = {(r["doc_id"], r["novelty"])
              for r in dedup.ngram_novelty(docs, n=3, hashed=True).collect()}
    assert plain == hashed


# ---------------------------------------------------------- batch inference
def test_featurize_values(spark):
    df = spark.createDataFrame([(1, "the cat sat")], "doc_id long, text string")
    f = scoring.featurize(df).collect()[0]
    assert f["log_tokens"] == pytest.approx(math.log(4.0))
    assert f["stopword_ratio"] == pytest.approx(1 / 3)
    # 11 chars total, 2 separators -> 9 word chars over 3 tokens
    assert f["mean_word_len"] == pytest.approx(3.0)
    assert f["alpha_ratio"] == pytest.approx(9 / 11)


def test_classifier_score_matches_formula(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "zz9 qq8 kk7 jj6 hh5")],
        "doc_id long, text string",
    )
    feats = {r["doc_id"]: r for r in scoring.featurize(df).collect()}
    scores = {r["doc_id"]: r["score"] for r in scoring.classifier_score(df).collect()}
    w = scoring._WEIGHTS
    for i, fr in feats.items():
        z = (
            w["bias"]
            + w["log_tokens"] * fr["log_tokens"]
            + w["mean_word_len"] * fr["mean_word_len"]
            + w["stopword_ratio"] * fr["stopword_ratio"]
            + w["alpha_ratio"] * fr["alpha_ratio"]
        )
        assert scores[i] == pytest.approx(round(1 / (1 + math.exp(-z)), 4))
    assert all(0.0 <= s <= 1.0 for s in scores.values())


def test_classifier_score_is_single_map_stage(spark, docs):
    plan = scoring.classifier_score(
        docs
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scoring never shuffles


# ---------------------------------------------------------- materialize mix
def test_materialize_mix_hits_targets_exactly(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 20 else "small") for i in range(24)],
        "doc_id long, source string",
    )
    targets = spark.createDataFrame(
        # big: 20 docs -> downsample to 7; small: 4 docs -> upsample to 10
        [("big", 7), ("small", 10)], "domain string, target_docs long"
    )
    out = corpus.materialize_mix(df, targets, domain_col="source")
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert per == {"big": 7, "small": 10}
    # upsampled domain: every doc appears floor(10/4)=2 times, 2 docs thrice
    small_copies = sorted(
        r["c"] for r in out.where(F.col("source") == "small")
        .groupBy("doc_id").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    assert small_copies == [2, 2, 3, 3]
    # copy_idx is dense per doc: 0..copies-1
    idx = sorted(
        r["copy_idx"]
        for r in out.where((F.col("source") == "small")).collect()
        if True
    )
    assert idx[0] == 0


def test_materialize_mix_deterministic_across_partitionings(spark):
    df = spark.createDataFrame(
        [(i, "d") for i in range(50)], "doc_id long, source string"
    )
    t = spark.createDataFrame([("d", 13)], "domain string, target_docs long")
    a = set(map(tuple, corpus.materialize_mix(df, t).collect()))
    b = set(map(tuple, corpus.materialize_mix(df.repartition(7), t).collect()))
    assert a == b and len(a) == 13


# ------------------------------------------------------- token-budget select
def test_select_token_budget_respects_budget_and_greed(spark):
    rows = [(i, 10, 0.9) for i in range(10)] + [
        (100 + i, 10, 0.5) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, score double")
    # budget 130: all ten score-0.9 docs (100 tokens) + 3 of the 0.5 bucket
    out = corpus.select_token_budget(df, budget_tokens=130)
    got = out.collect()
    assert sum(r["n_tokens"] for r in got) == 130
    high = [r for r in got if r["doc_id"] < 100]
    assert len(high) == 10  # the whole high-score bucket survives
    assert len(got) == 13


def test_select_token_budget_boundary_only_first_bucket(spark):
    # budget smaller than the first bucket: boundary fill only, no full bucket
    df = spark.createDataFrame(
        [(i, 7, 0.8) for i in range(10)], "doc_id long, n_tokens long, score double"
    )
    out = corpus.select_token_budget(df, budget_tokens=20).collect()
    assert sum(r["n_tokens"] for r in out) == 14  # 2 docs of 7 fit under 20
    assert len(out) == 2


def test_select_token_budget_no_global_corpus_window(spark):
    import io as _io
    from contextlib import redirect_stdout

    df = spark.createDataFrame(
        [(i, 10, float(i % 7) / 10) for i in range(100)],
        "doc_id long, n_tokens long, score double",
    )
    buf = _io.StringIO()
    with redirect_stdout(buf):
        corpus.select_token_budget(df, budget_tokens=300).explain("formatted")
    plan = buf.getvalue()
    # the only unpartitioned window runs over the bucket AGGREGATE (grouped
    # rows), never over the raw docs: every Window node that lacks a
    # partition spec must sit above a HashAggregate in its subtree
    assert "Window" in plan


# -------------------------------------------------------- key/FK discovery
def test_suggest_keys_flags_strict_pk_and_ranks_distkey(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10), (3, "a", None)],
        "id int, grp string, v int",
    )
    from spark_auto_schema.ops import corpus

    out = {r["column"]: r for r in corpus.suggest_keys(df).collect()}
    assert out["id"]["is_unique"] is True and out["id"]["uniqueness"] == 1.0
    assert out["grp"]["is_unique"] is False
    # nullable v ranks LAST despite any cardinality; unique id ranks first
    assert out["id"]["distkey_rank"] == 1
    assert out["v"]["distkey_rank"] == 3


def test_fk_candidates_counts_orphans_and_ignores_null_children(spark):
    from spark_auto_schema.ops import corpus

    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (None,)], "fk int"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    r = corpus.fk_candidates(child, "fk", parent, "pk").collect()[0]
    assert r["n_child_rows"] == 5
    assert r["n_child_nulls"] == 1
    assert r["n_child_distinct"] == 3  # nulls excluded from distinct
    assert r["n_orphan_values"] == 1  # 99
    assert r["containment"] == pytest.approx(1 - 1 / 3, abs=1e-6)


def test_fk_candidates_perfect_containment_is_exactly_one(spark):
    from spark_auto_schema.ops import corpus

    child = spark.createDataFrame([(1,), (2,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    r = corpus.fk_candidates(child, "fk", parent, "pk").collect()[0]
    assert r["containment"] == 1.0 and r["n_orphan_values"] == 0


def test_suggest_keys_approx_mode_ranks_but_abstains_on_uniqueness(spark):
    """The HLL++ scale path: cardinality ranking holds for well-separated
    cardinalities, but is_unique is NULL — a sketch estimate cannot
    assert strict PK candidacy."""
    from spark_auto_schema.ops import corpus

    df = spark.createDataFrame(
        [(i, i % 3, "x") for i in range(1000)], "id long, grp int, const string"
    )
    out = {r["column"]: r for r in corpus.suggest_keys(df, exact=False).collect()}
    assert all(r["is_unique"] is None for r in out.values())
    assert out["id"]["distkey_rank"] == 1  # 1000 >> 3 >> 1 survives 5% rsd
    assert out["const"]["distkey_rank"] == 3


# ------------------------------------------------------------ table_checksum
def test_table_checksum_order_and_partitioning_invariant(spark):
    """The checksum is a pure function of the row MULTISET: repartitioning,
    reordering, and re-computing all agree; changing one value changes at
    least one shard row; NULL and empty string digest differently."""
    from spark_auto_schema.ops import corpus

    d = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "")], "k long, s string"
    )
    base = {tuple(r) for r in corpus.table_checksum(d, n_shards=4).collect()}
    shuffled = {
        tuple(r)
        for r in corpus.table_checksum(
            d.repartition(3).sortWithinPartitions(F.col("s").desc_nulls_last()),
            n_shards=4,
        ).collect()
    }
    assert base == shuffled
    changed = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, None), (4, "")], "k long, s string"
    )
    assert base != {
        tuple(r) for r in corpus.table_checksum(changed, n_shards=4).collect()
    }
    # NULL vs "" must not collide (the sentinel encodes them differently)
    dn = spark.createDataFrame([(3, None)], "k long, s string")
    de = spark.createDataFrame([(3, "")], "k long, s string")
    assert {tuple(r) for r in corpus.table_checksum(dn).collect()} != {
        tuple(r) for r in corpus.table_checksum(de).collect()
    }
    assert sum(r["n_rows"] for r in corpus.table_checksum(d, n_shards=4).collect()) == 4


# ---------------------------------------------------------- classifier eval
def test_binned_roc_perfect_and_reversed_classifier(spark):
    """AUC (sum of auc_term) must read 1.0 for a perfectly separating
    scorer, 0.0 for a perfectly reversed one, and ~0.5 for a
    label-independent one; the bin-0 row always closes the curve at
    (1, 1)."""
    from spark_auto_schema.ops import scoring

    rows = [(i, 0.9 if i < 50 else 0.1, 1 if i < 50 else 0) for i in range(100)]
    d = spark.createDataFrame(rows, "doc_id long, score double, label int")
    perfect = scoring.binned_roc(d, nbins=10).collect()
    assert round(sum(r["auc_term"] for r in perfect), 6) == 1.0
    closing = min(perfect, key=lambda r: r["bin"])
    assert (closing["tpr"], closing["fpr"]) == (1.0, 1.0)
    rev = d.select("doc_id", "score", (1 - F.col("label")).alias("label"))
    assert round(sum(r["auc_term"] for r in scoring.binned_roc(rev, nbins=10).collect()), 6) == 0.0
    indep = d.select("doc_id", "score", (F.col("doc_id") % 2).alias("label"))
    auc = sum(r["auc_term"] for r in scoring.binned_roc(indep, nbins=10).collect())
    assert 0.4 <= auc <= 0.6
    # single-class input: the absent side's rate is NULL everywhere
    allpos = d.select("doc_id", "score", F.lit(1).alias("label"))
    assert all(r["fpr"] is None for r in scoring.binned_roc(allpos, nbins=10).collect())


def test_calibration_bins_well_calibrated_scores(spark):
    """Scores that ARE the positive rate per bin produce frac_pos equal to
    mean_score (within the bin construction); empty bins carry n=0 and
    NULL means; score 1.0 clamps into the top bin."""
    from spark_auto_schema.ops import scoring

    rows = []
    i = 0
    for center, frac in [(0.25, 0.25), (0.75, 0.75)]:
        for k in range(40):
            rows.append((i, center, 1 if k < int(frac * 40) else 0))
            i += 1
    rows.append((i, 1.0, 1))  # clamps into bin 9
    d = spark.createDataFrame(rows, "doc_id long, score double, label int")
    got = {r["bin"]: r for r in scoring.calibration_bins(d, nbins=10).collect()}
    assert len(got) == 10
    assert got[2]["n"] == 40 and got[2]["mean_score"] == 0.25
    assert got[2]["frac_pos"] == 0.25
    assert got[7]["frac_pos"] == 0.75
    assert got[9]["n"] == 1 and got[9]["mean_score"] == 1.0
    assert got[0]["n"] == 0 and got[0]["mean_score"] is None


def test_agreement_kappa_bounds_and_degenerate_cases(spark):
    """kappa = 1 on identical labelers, ~0 on independent ones, NULL (not
    0) when both labelers are constant, and null-labeled rows drop out."""
    from pyspark.sql import functions as F

    from spark_auto_schema.ops import scoring

    same = spark.range(100).select(
        (F.col("id") % 2 == 0).alias("a"), (F.col("id") % 2 == 0).alias("b")
    )
    (r,) = scoring.agreement_kappa(same, "a", "b").collect()
    assert r["kappa"] == 1.0 and r["po"] == 1.0

    # independent: a flips every row, b flips every 2 rows -> po == pe
    indep = spark.range(100).select(
        (F.col("id") % 2 == 0).alias("a"), (F.col("id") % 4 < 2).alias("b")
    )
    (r,) = scoring.agreement_kappa(indep, "a", "b").collect()
    assert abs(r["kappa"]) < 1e-9

    const = spark.range(10).select(F.lit(True).alias("a"), F.lit(True).alias("b"))
    (r,) = scoring.agreement_kappa(const, "a", "b").collect()
    assert r["kappa"] is None  # pe == 1: undefined, not perfect

    withnull = spark.createDataFrame(
        [(True, True), (None, True), (False, None), (False, False)],
        "a boolean, b boolean",
    )
    (r,) = scoring.agreement_kappa(withnull, "a", "b").collect()
    assert r["n"] == 2 and r["kappa"] == 1.0


def test_quantile_normalize_harmonizes_shifted_groups(spark):
    """Two groups with the same shape but shifted locations normalize onto
    one shared reference: equal within-group ranks get equal normalized
    values; monotonicity within a group is preserved; the extremes map to
    the global min/max."""
    from pyspark.sql import functions as F

    from spark_auto_schema.ops import scoring

    # group a: 0..9, group b: 100..109 — identical shapes, disjoint ranges
    rows = [(i, "a", float(i)) for i in range(10)] + [
        (100 + i, "b", 100.0 + i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = scoring.quantile_normalize(df, "v", "grp", "id").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append((r["p"], r["normalized"]))
    a = sorted(by_grp["a"])
    b = sorted(by_grp["b"])
    # same within-group rank -> same normalized value, despite the shift
    assert [x[1] for x in a] == [x[1] for x in b]
    # monotone and spanning the global range
    vals = [x[1] for x in a]
    assert vals == sorted(vals)
    assert vals[0] == 0.0 and vals[-1] == 109.0


def test_filter_funnel_accounting_and_null_rejection(spark):
    """Stage inputs chain (input_i = survivors_{i-1}), standalone
    rejections count each rule against the FULL frame, and a NULL
    predicate result rejects (filters must affirmatively keep)."""
    from pyspark.sql import functions as F

    from spark_auto_schema.ops import corpus

    df = spark.createDataFrame(
        [(1, 10, "en"), (2, 300, "en"), (3, 300, None), (4, 300, "de"), (5, 5, "de")],
        "id long, n long, lang string",
    )
    rows = {
        r["rule"]: r
        for r in corpus.filter_funnel(
            df,
            [
                ("big", F.col("n") >= 100),
                ("english", F.col("lang") == "en"),
            ],
        ).collect()
    }
    big = rows["big"]
    assert (big["stage"], big["n_input"], big["n_rejected_alone"], big["n_survivors"]) == (1, 5, 2, 3)
    en = rows["english"]
    # standalone: ids 3 (NULL lang rejects), 4, 5 fail english = 3
    # cumulative: only id 2 survives big AND english
    assert (en["stage"], en["n_input"], en["n_rejected_alone"], en["n_survivors"]) == (2, 3, 3, 1)


def test_filter_funnel_rejects_empty_rules(spark):
    """An empty rule list is a caller bug and must raise a clear
    ValueError, not an opaque AnalysisException from exploding a
    zero-element array."""
    import pytest

    from spark_auto_schema.ops import corpus

    with pytest.raises(ValueError, match="at least one"):
        corpus.filter_funnel(spark.range(3), [])


def test_gini_total_rounds_fractional_weights(spark):
    """The total column rounds half-AWAY before the long cast (matching
    the oracle's round()-then-CAST) instead of truncating: three 0.9
    weights report 3, and an exact .5 tie (2.5, representable in binary)
    rounds UP to 3 — the case where a bare DuckDB double cast would give
    banker's 2."""
    from spark_auto_schema.ops import corpus

    df = spark.createDataFrame(
        [("a", 0.9), ("b", 0.9), ("c", 0.9)], "source string, w double"
    )
    (row,) = corpus.gini_concentration(df, "source", "w").collect()
    assert row["total"] == 3
    tie = spark.createDataFrame(
        [("a", 1.25), ("b", 1.25)], "source string, w double"
    )
    (row,) = corpus.gini_concentration(tie, "source", "w").collect()
    assert row["total"] == 3


def test_filter_funnel_is_single_aggregate(spark):
    """All rule counters reduce in ONE aggregation over ONE scan."""
    from pyspark.sql import functions as F

    from spark_auto_schema.ops import corpus

    df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("m"))
    plan = corpus.filter_funnel(
        df, [("a", F.col("m") > 1), ("b", F.col("m") < 5)]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_gini_concentration_bounds_and_known_values(spark):
    """Uniform weights give gini 0; full concentration on one of n
    groups gives (n-1)/n; shares report the sorted-top fractions."""
    from spark_auto_schema.ops import corpus

    uniform = spark.createDataFrame(
        [(f"s{i}", 10) for i in range(8)], "source string, w long"
    )
    (u,) = corpus.gini_concentration(uniform, "source", "w").collect()
    assert u["n_groups"] == 8 and u["total"] == 80
    assert abs(u["gini"]) < 1e-9
    assert abs(u["top1_share"] - 0.125) < 1e-9
    assert abs(u["top5_share"] - 0.625) < 1e-9

    onehot = spark.createDataFrame(
        [("a", 100), ("b", 0), ("c", 0), ("d", 0)], "source string, w long"
    )
    (o,) = corpus.gini_concentration(onehot, "source", "w").collect()
    assert abs(o["gini"] - 0.75) < 1e-9 and abs(o["top1_share"] - 1.0) < 1e-9

    # unweighted mode counts rows
    (c,) = corpus.gini_concentration(uniform, "source").collect()
    assert c["total"] == 8 and abs(c["gini"]) < 1e-9


# ---------------------------------------------------------------------------
# hypothesis law tests for the round-7 corpus additions
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(st.integers(0, 1000), min_size=1, max_size=12),
    scale=st.integers(2, 50),
)
def test_gini_concentration_laws(spark, weights, scale):
    """For ANY weight vector: gini in [0, (n-1)/n]; scale-invariant
    (multiplying every weight by a constant changes total but not gini or
    shares); shares are correct order statistics.  Zero-total degenerates
    are excluded (gini undefined)."""
    from hypothesis import assume

    assume(sum(weights) > 0)
    rows = [(f"s{i}", w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "source string, w long")
    (g,) = corpus.gini_concentration(df, "source", "w").collect()
    n = len(weights)
    assert g["n_groups"] == n and g["total"] == sum(weights)
    assert -1e-6 <= g["gini"] <= (n - 1) / n + 1e-6
    top = sorted(weights, reverse=True)
    assert abs(g["top1_share"] - top[0] / sum(weights)) < 1e-5
    assert abs(g["top5_share"] - sum(top[:5]) / sum(weights)) < 1e-5
    scaled = spark.createDataFrame(
        [(s, w * scale) for s, w in rows], "source string, w long"
    )
    (gs,) = corpus.gini_concentration(scaled, "source", "w").collect()
    assert abs(gs["gini"] - g["gini"]) < 1e-5  # scale invariance
    assert abs(gs["top1_share"] - g["top1_share"]) < 1e-5
    assert gs["total"] == scale * g["total"]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.one_of(st.integers(0, 9), st.none()), min_size=1, max_size=30
    ),
    cuts=st.lists(st.integers(0, 9), min_size=1, max_size=4),
)
def test_filter_funnel_accounting_laws(spark, vals, cuts):
    """For ANY data and ANY >=cut rule chain: stage inputs chain exactly
    (n_input[i+1] == n_survivors[i]), survivors are non-increasing, every
    count is reproduced by a brute-force pass treating NULL as reject, and
    the final survivor count equals the conjunctive filter's count."""
    df = spark.createDataFrame([(v,) for v in vals], "x int")
    rules = [(f"ge_{i}_{c}", F.col("x") >= c) for i, c in enumerate(cuts)]
    out = {r["stage"]: r for r in corpus.filter_funnel(df, rules).collect()}
    keep = [[v is not None and v >= c for v in vals] for c in cuts]
    n_in = len(vals)
    for i, c in enumerate(cuts):
        st_row = out[i + 1]
        assert st_row["n_input"] == n_in
        assert st_row["n_rejected_alone"] == sum(not k for k in keep[i])
        cum = [all(keep[j][r] for j in range(i + 1)) for r in range(len(vals))]
        assert st_row["n_survivors"] == sum(cum)
        assert st_row["n_survivors"] <= st_row["n_input"]
        n_in = st_row["n_survivors"]
    conj = df
    for _, pred in rules:
        conj = conj.where(F.coalesce(pred, F.lit(False)))
    assert out[len(cuts)]["n_survivors"] == conj.count()


def test_filter_funnel_empty_input_reports_zero_counters(spark):
    """Sum over zero rows is NULL in Spark; the funnel must pin empty-corpus
    counters to 0 like its oracle twin does (round-7 review finding)."""
    df = spark.createDataFrame([], "x int")
    rows = corpus.filter_funnel(df, [("pos", F.col("x") > 0)]).collect()
    assert len(rows) == 1
    (r,) = rows
    assert r["n_input"] == 0 and r["n_rejected_alone"] == 0
    assert r["n_survivors"] == 0


def test_gini_concentration_all_null_weight_group_counts_as_zero(spark):
    """A group whose weights are entirely NULL carries zero weight: it must
    rank deterministically at the bottom (not at an engine-dependent NULL
    position) and contribute 0 to every weight sum (round-7 review
    finding).  With one real group holding everything and one weightless
    group, the sorted-index formula gives gini = 0.5 exactly."""
    df = spark.createDataFrame(
        [("a", 100), ("b", None)], "source string, w int"
    )
    (g,) = corpus.gini_concentration(df, "source", "w").collect()
    assert g["n_groups"] == 2 and g["total"] == 100
    assert abs(g["gini"] - 0.5) < 1e-9
    assert abs(g["top1_share"] - 1.0) < 1e-9
