"""Law tests for the round-11 operators: duplicated-span extraction, the
rerank harness, per-source dedup-rate drift, the n-gram/threshold/nprobe/
banding sweeps, and curriculum phases.

Each test pins an algebraic invariant the DuckDB mirror cannot express
(cross-op equalities, monotonicity, planted-structure detection, error
contracts) — the mirror pins values, these pin the semantics.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ dedup_rate_drift
def test_dedup_rate_drift_laws(spark):
    """Known survivorship in each synthetic snapshot: snapshot A has no
    dups (all loss fracs 0), snapshot B duplicates one src1 doc's text
    into src2 (src2 loses 1 of 2 docs TO THE OTHER SOURCE under
    keep-lowest-id); only common sources appear."""
    from spark_auto_schema.ops import dedup

    a = spark.createDataFrame(
        [(1, "s1", "alpha"), (2, "s2", "beta"), (3, "s3", "gamma")],
        "doc_id long, source string, text string",
    )
    b = spark.createDataFrame(
        [(1, "s1", "alpha"), (2, "s2", "beta"), (4, "s2", "alpha")],
        "doc_id long, source string, text string",
    )
    got = {
        r["source"]: r
        for r in dedup.dedup_rate_drift(a, b).collect()
    }
    assert set(got) == {"s1", "s2"}  # s3 absent from B -> excluded
    assert got["s1"]["loss_frac_a"] == 0.0 and got["s1"]["loss_frac_b"] == 0.0
    assert got["s1"]["loss_drift"] == 0.0 and got["s1"]["xloss_drift"] == 0.0
    s2 = got["s2"]
    assert s2["n_docs_a"] == 1 and s2["n_docs_b"] == 2
    assert s2["loss_frac_a"] == 0.0 and s2["loss_frac_b"] == 0.5
    assert s2["loss_drift"] == 0.5
    # the dropped copy's survivor (doc 1) lives in s1 -> lost-to-other
    assert s2["xloss_drift"] == 0.5


# ------------------------------------------------------------ curriculum
def test_curriculum_phases_laws(spark):
    """Distinct uniform scores split evenly into n_phases contiguous
    bands (phase k's max < phase k+1's min); shares sum to 1; an all-tied
    score column collapses into one phase (ties fall DOWN); n_phases < 2
    raises."""
    from spark_auto_schema.ops import corpus

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 101)], "id long, score double"
    )
    rows = sorted(
        corpus.curriculum_phases(df, "score", 4).collect(),
        key=lambda r: r["phase"],
    )
    assert [r["phase"] for r in rows] == [1, 2, 3, 4]
    assert all(r["n_docs"] == 25 for r in rows)
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_score"] < hi["min_score"]
    tied = spark.createDataFrame(
        [(i, 7.0) for i in range(10)], "id long, score double"
    )
    only = corpus.curriculum_phases(tied, "score", 4).collect()
    assert len(only) == 1 and only[0]["phase"] == 1
    assert only[0]["n_docs"] == 10 and only[0]["share"] == 1.0
    with pytest.raises(ValueError, match="n_phases"):
        corpus.curriculum_phases(df, "score", 1)


# ------------------------------------------------------------ ngram sweep
def test_contamination_ngram_sweep_laws(spark):
    """A verbatim eval document planted in the training corpus is caught
    at EVERY n (its grams all hit); a disjoint-vocabulary eval set hits
    at none; overlap at the largest n implies overlap at every smaller n
    (sub-gram containment)."""
    from spark_auto_schema.ops import dedup

    leaked = " ".join(f"w{i}" for i in range(30))
    train = spark.createDataFrame(
        [(1, leaked), (2, "totally different words here only once")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, leaked)], "doc_id long, text string")
    got = {
        r["n"]: r
        for r in dedup.contamination_ngram_sweep(train, ev, ns=(4, 8, 13)).collect()
    }
    assert set(got) == {4, 8, 13}
    for n, r in got.items():
        assert r["eval_hit_rate"] == 1.0, n  # every eval gram is in train
        assert r["n_train_docs_hit"] == 1
        assert r["n_eval_grams"] == 30 - n + 1
    clean_ev = spark.createDataFrame(
        [(101, "zz yy xx vv uu tt ss rr qq pp oo nn mm ll")],
        "doc_id long, text string",
    )
    clean = {
        r["n"]: r
        for r in dedup.contamination_ngram_sweep(
            train, clean_ev, ns=(4, 8, 13)
        ).collect()
    }
    for r in clean.values():
        assert r["eval_hit_rate"] == 0.0 and r["n_train_docs_hit"] == 0
    # containment law on the leaked panel: hits at 13 -> hits at 8 and 4
    assert got[13]["n_eval_grams_hit"] > 0
    assert got[8]["n_eval_grams_hit"] > 0 and got[4]["n_eval_grams_hit"] > 0


# ------------------------------------------------------------ rerank
def test_cross_rerank_laws(spark):
    """The default lexical-F1 scorer promotes full term coverage over
    none; rank_delta sums to zero (a permutation); the scorer seam
    accepts an injected column builder; an empty query raises."""
    from spark_auto_schema.ops import similarity

    pool = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "vec_id long, rrf double"
    )
    docs = spark.createDataFrame(
        [
            (1, "nothing relevant at all in this candidate"),
            (2, "merge window vector"),          # full coverage, short
            (3, "merge of the window"),          # partial coverage
        ],
        "doc_id long, text string",
    )
    got = {
        r["vec_id"]: r
        for r in similarity.cross_rerank(
            pool, docs, ["merge", "window", "vector"]
        ).collect()
    }
    assert got[2]["ce_rank"] == 1 and got[1]["ce_rank"] == 3
    assert got[2]["ce_score"] == 1.0  # Q == D exactly -> F1 = 1
    assert sum(r["rank_delta"] for r in got.values()) == 0
    # injected scorer: constant score -> ce order degrades to id order
    flat = {
        r["vec_id"]: r["ce_rank"]
        for r in similarity.cross_rerank(
            pool, docs, ["merge"], scorer=lambda t: F.lit(0.5)
        ).collect()
    }
    assert flat == {1: 1, 2: 2, 3: 3}
    with pytest.raises(ValueError, match="query_terms"):
        similarity.cross_rerank(pool, docs, [])


# ------------------------------------------------------------ dup spans
def test_dup_span_extract_laws(spark):
    """A 12-token block shared verbatim by two documents is extracted as
    ONE maximal span in each (adjacent duplicated windows merged), with
    the exact block text and its in-doc 1-based start; a corpus of
    unique documents yields no spans."""
    from spark_auto_schema.ops import dedup

    block = " ".join(f"b{i}" for i in range(12))
    df = spark.createDataFrame(
        [
            (1, "unique prefix one two three " + block),
            (2, block + " some unique suffix words here"),
            (3, "entirely unrelated content with no shared windows at all xx yy zz"),
        ],
        "doc_id long, text string",
    )
    got = dedup.dup_span_extract(df, k=8, min_docs=2).collect()
    by_doc = {r["doc_id"]: r for r in got}
    assert set(by_doc) == {1, 2}
    assert by_doc[1]["span_text"] == block and by_doc[2]["span_text"] == block
    assert by_doc[1]["span_start"] == 6  # after the 5-token unique prefix
    assert by_doc[2]["span_start"] == 1
    assert by_doc[1]["n_tokens"] == 12 and by_doc[2]["n_tokens"] == 12
    assert all(r["min_share_docs"] == 2 for r in got)
    uniq = spark.createDataFrame(
        [(i, f"doc {i} " + " ".join(f"u{i}_{j}" for j in range(15)))
         for i in range(4)],
        "doc_id long, text string",
    )
    assert dedup.dup_span_extract(uniq, k=8, min_docs=2).count() == 0


# ------------------------------------------------------------ semantic sweep
def test_semantic_threshold_sweep_matches_semantic_dedup(spark, tmp_path):
    """Shared-pair-stage law: n_dropped at threshold t equals the number
    of rows semantic_dedup(threshold=t) drops, for every sweep value;
    counts are monotone non-increasing in the threshold; unsorted
    thresholds raise."""
    from spark_auto_schema.io import read_table
    from spark_auto_schema.ops import similarity

    embs = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    sweep = {
        r["threshold"]: r
        for r in similarity.semantic_threshold_sweep(
            embs, thresholds=(0.2, 0.3), nlist=16
        ).collect()
    }
    for t in (0.2, 0.3):
        dropped = (
            similarity.semantic_dedup(embs, threshold=t, nlist=16)
            .where(~F.col("kept"))
            .count()
        )
        assert sweep[t]["n_dropped"] == dropped, t
    assert sweep[0.2]["n_pairs"] >= sweep[0.3]["n_pairs"]
    assert sweep[0.2]["n_docs_involved"] >= sweep[0.3]["n_docs_involved"]
    with pytest.raises(ValueError, match="ascending"):
        similarity.semantic_threshold_sweep(embs, thresholds=(0.4, 0.2))


# ------------------------------------------------------------ nprobe sweep
def test_ivf_nprobe_sweep_laws(spark):
    """Recall is monotone non-decreasing in nprobe, and probing EVERY
    list (nprobe == nlist) makes the IVF path exhaustive — recall exactly
    1.0; nprobe > nlist raises."""
    from spark_auto_schema.io import read_table
    from spark_auto_schema.ops import similarity

    embs = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = sorted(
        similarity.ivf_nprobe_sweep(
            embs, query_ids=[0, 1, 2, 3], nprobes=(1, 4, 16), k=5, nlist=16
        ).collect(),
        key=lambda r: r["nprobe"],
    )
    recalls = [r["avg_recall_at_k"] for r in rows]
    assert recalls == sorted(recalls)
    assert rows[-1]["avg_recall_at_k"] == 1.0  # nprobe == nlist: exhaustive
    cands = [r["avg_candidates"] for r in rows]
    assert cands == sorted(cands)
    with pytest.raises(ValueError, match="nlist"):
        similarity.ivf_nprobe_sweep(embs, [0], nprobes=(32,), nlist=16)


# ------------------------------------------------------------ banding sweep
def test_lsh_config_sweep_matches_md5_pipeline(spark):
    """bands=4 reproduces minhash_lsh_pairs_md5's exact config, so its
    n_verified equals that pipeline's pair count; halving rows-per-band
    can only grow the candidate set (aligned-band nesting: agreement on
    an 8-hash band implies agreement on both 4-hash sub-bands), so
    candidates and verified counts are monotone in bands; a bands value
    that does not divide num_hashes raises."""
    from spark_auto_schema.io import read_table
    from spark_auto_schema.ops import dedup

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    rows = {
        r["bands"]: r for r in dedup.lsh_config_sweep(docs).collect()
    }
    assert set(rows) == {2, 4, 8}
    truth = dedup.minhash_lsh_pairs_md5(docs, verify_threshold=0.8).count()
    assert rows[4]["n_verified"] == truth
    assert rows[2]["n_candidates"] <= rows[4]["n_candidates"] <= rows[8]["n_candidates"]
    assert rows[2]["n_verified"] <= rows[4]["n_verified"] <= rows[8]["n_verified"]
    assert rows[2]["rows_per_band"] == 8 and rows[8]["rows_per_band"] == 2
    with pytest.raises(ValueError, match="divide"):
        dedup.lsh_config_sweep(docs, num_hashes=16, bands_sweep=(3,))


# ------------------------------------------------------------ suggest_nlist
def test_suggest_nlist_laws(spark):
    """The SemDeDup scale rule (nlist = ceil(n / target), clamped): exact
    ceil arithmetic on the real corpus count, floor of 1, max_nlist
    clamp, and a rejected degenerate target.  Holding target fixed while
    the corpus grows is what keeps the cluster-local pair join linear
    (measured: 30x slope 1.112 at pinned nlist -> 0.73 config-scaled;
    BASELINE.md round-11)."""
    from spark_auto_schema.io import read_table
    from spark_auto_schema.ops import similarity

    embs = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = embs.count()
    for target in (1, 7, n, n + 1):
        assert similarity.suggest_nlist(embs, target) == max(
            1, -(-n // target)
        ), target
    assert similarity.suggest_nlist(embs, 1, max_nlist=8) == 8
    with pytest.raises(ValueError, match="target_cluster_size"):
        similarity.suggest_nlist(embs, 0)
    with pytest.raises(ValueError, match="max_nlist"):
        similarity.suggest_nlist(embs, 1, max_nlist=0)
