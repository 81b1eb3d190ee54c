"""Law tests for the round-12 operators: token-granular dedup
survivorship, the approx-percentile sketch contract, the streaming
late-data monitor, and the suggest_nlist-driven SemDeDup composition.

Each test pins an algebraic invariant the DuckDB mirror cannot express
(cross-op equalities, planted-structure detection, the measured Spark
watermark semantics, error contracts) — the mirror pins values, these
pin the semantics.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------- token_survivorship
def test_token_survivorship_planted_dups(spark):
    """Planted corpus: s1 holds the original 6-token doc; s2 holds an
    exact copy (lost-to-other under keep-lowest-id) and a near-dup with
    one word changed (dropped by the near stage); s3 is clean.  Token
    accounting must attribute each loss to the right stage and source."""
    from spark_auto_schema.ops import dedup

    base = "one two three four five six"
    near = "one two three four five SEVEN"
    df = spark.createDataFrame(
        [
            (1, "s1", base),
            (2, "s2", base),          # exact copy, winner lives in s1
            (3, "s2", near),          # near-dup of 1 (5-of-? shared 3-grams)
            (4, "s3", "totally different words here indeed"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r["source"]: r
        for r in dedup.token_survivorship(df, threshold=0.4).collect()
    }
    assert got["s1"]["n_tokens"] == 6
    assert got["s1"]["tokens_kept_exact"] == 6
    assert got["s1"]["tokens_kept_near"] == 6
    assert got["s1"]["token_loss_frac"] == 0.0
    s2 = got["s2"]
    assert s2["n_docs"] == 2 and s2["n_tokens"] == 12
    # doc 2 falls in the exact stage, to the OTHER source's winner
    assert s2["tokens_kept_exact"] == 6
    assert s2["tokens_lost_to_other_exact"] == 6
    # doc 3 survives exact but is near-dropped (partner doc 1 has lower id)
    assert s2["tokens_kept_near"] == 0
    assert s2["token_loss_frac"] == 1.0
    assert got["s3"]["token_loss_frac"] == 0.0
    dedup.release_caches()


def test_token_survivorship_doc_counts_match_doc_twin(spark):
    """On the real table the exact-stage TOKEN flags must aggregate over
    the same survivor sets as dedup_loss_by_source's DOC flags: a source
    with doc-level loss_frac 0 must keep every token at the exact stage,
    and n_docs must agree row-for-row."""
    from spark_auto_schema.io import read_table
    from spark_auto_schema.ops import dedup

    d = read_table(spark, "/root/testdata/sf0.001", "documents")
    tok = {r["source"]: r for r in dedup.token_survivorship(d).collect()}
    doc = {r["source"]: r for r in dedup.dedup_loss_by_source(d).collect()}
    assert set(tok) == set(doc)
    for s in doc:
        assert tok[s]["n_docs"] == doc[s]["n_docs"]
        if doc[s]["n_dropped"] == 0:
            assert tok[s]["tokens_kept_exact"] == tok[s]["n_tokens"]
        else:
            assert tok[s]["tokens_kept_exact"] < tok[s]["n_tokens"]
    dedup.release_caches()


# ------------------------------------------------- quantile_sketch_contract
def test_quantile_sketch_contract_laws(spark):
    """The contract holds on a real score column, a degenerate
    single-value group is trivially inside its (flat) envelope, and the
    guard rejects an eps below the sketch's own rank-error bound (a
    contract that would flag CORRECT sketches is a bug, not a check)."""
    from spark_auto_schema.io import read_table
    from spark_auto_schema.ops import scoring, text

    d = read_table(spark, "/root/testdata/sf0.001", "documents")
    scored = text.quality_score(d, keep_cols=["source"])
    out = scoring.quantile_sketch_contract(scored, "quality", "source")
    rows = out.collect()
    assert len(rows) == 20 and all(r["grid_within_bound"] for r in rows)

    flat = spark.createDataFrame(
        [("g", 1.0)] * 7, "grp_src string, v double"
    )
    r = scoring.quantile_sketch_contract(flat, "v", "grp_src").collect()
    assert r[0]["n"] == 7 and r[0]["grid_within_bound"]

    with pytest.raises(ValueError, match="rank-error"):
        scoring.quantile_sketch_contract(
            scored, "quality", "source", accuracy=10, eps=0.05
        )
    with pytest.raises(ValueError, match="eps"):
        scoring.quantile_sketch_contract(scored, "quality", "source", eps=0.0)
    with pytest.raises(ValueError, match="accuracy"):
        scoring.quantile_sketch_contract(
            scored, "quality", "source", accuracy=0, eps=0.5
        )


# ------------------------------------------------------- late_data_monitor
def _stage(spark, d, rows, name, mt):
    import glob
    import os
    import shutil

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


def test_late_data_monitor_pins_measured_watermark_semantics(spark, tmp_path):
    """The replay rule the DuckDB oracle depends on, pinned as a test so
    a Spark upgrade that changes it fails HERE, not in a lost driver
    round (measured on 4.1.2): with one file per micro-batch, the
    late-row filter of a streaming aggregation uses the watermark
    current during the PREVIOUS batch (i.e. max event ts of batches
    0..k-2, minus delay) and admits a row iff its window END is strictly
    above it.  The f3 probes separate the predicates: a row under the
    filter watermark whose window is still open (day-9 18:00) must be
    ADMITTED — a ts-based filter would drop it — while the closed-window
    row (day-8 12:00) must be dropped."""
    from spark_auto_schema.streaming import late_data_monitor, run_to_memory

    d = str(tmp_path / "drops")
    import os

    os.makedirs(d)
    _stage(spark, d, [(1, 0), (2, 0), (3, 0)], "f0.parquet", 1000)
    _stage(spark, d, [(10, 0)], "f1.parquet", 2000)  # wm after f1: d9 23:00
    _stage(spark, d, [(10, 1)], "f2.parquet", 3000)  # filter wm: d2 23:00
    # batch 3 filter wm = end-of-f1 wm = day9 23:00
    _stage(spark, d, [(9, 18), (8, 12), (11, 0)], "f3.parquet", 4000)
    stream = (
        spark.readStream.schema("ts timestamp, k int")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    admitted, total = late_data_monitor(
        stream, ts_col="ts", window_duration="1 day", delay="1 hour"
    )
    run_to_memory(admitted, "__r12_adm", output_mode="update", state_partitions=4)
    run_to_memory(total, "__r12_tot", output_mode="complete", state_partitions=4)
    adm = {
        r["window_start"].day: r["n"]
        for r in spark.table("__r12_adm")
        .groupBy("window_start")
        .agg(F.max("n_admitted").alias("n"))
        .collect()
    }
    tot = {
        r["window_start"].day: r["n_events"]
        for r in spark.table("__r12_tot").collect()
    }
    assert tot == {1: 1, 2: 1, 3: 1, 8: 1, 9: 1, 10: 2, 11: 1}
    # day-9 18:00 admitted (window end day10 > filter wm day9 23:00);
    # day-8 12:00 dropped (window end day9 <= filter wm) — the ONLY drop
    assert adm == {1: 1, 2: 1, 3: 1, 9: 1, 10: 2, 11: 1}


def test_late_data_monitor_restart_resumes_watermark(spark, tmp_path):
    """Checkpointed restart: drain two files, stop, drop two more files
    (one carrying a row now far behind the recovered watermark), restart
    the SAME query — the state-store + offset recovery must keep the
    watermark, so the late row is dropped exactly as in an uninterrupted
    run, and already-processed files are not re-read."""
    from spark_auto_schema.streaming import late_data_monitor

    import os

    d = str(tmp_path / "drops")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(d)
    _stage(spark, d, [(1, 0), (2, 0)], "f0.parquet", 1000)
    _stage(spark, d, [(10, 0)], "f1.parquet", 2000)

    def run_once():
        stream = (
            spark.readStream.schema("ts timestamp, k int")
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        admitted, _ = late_data_monitor(
            stream, ts_col="ts", window_duration="1 day", delay="1 hour"
        )
        q = (
            admitted.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    _stage(spark, d, [(10, 1)], "f2.parquet", 3000)
    # f3's day-2 row is behind the RECOVERED filter watermark (day9 23:00
    # from f1, via the state store) — a fresh query would admit it
    _stage(spark, d, [(2, 12), (11, 0)], "f3.parquet", 4000)
    run_once()
    # push the watermark past day 11 so append mode flushes the tail windows
    _stage(spark, d, [(13, 0)], "f4.parquet", 5000)
    run_once()
    out = {
        (r["window_start"].day, r["n_admitted"])
        for r in spark.read.parquet(sink).collect()
    }
    assert (2, 1) in out and (2, 2) not in out  # late day-2 row dropped
    assert (10, 2) in out  # both day-10 rows admitted across restarts


# ------------------------------------------------- semantic_dedup_scaled
def test_semantic_dedup_scaled_composition(spark):
    """The registry query's oracle interpolates nlist=8; the law here is
    that suggest_nlist at the pinned target REPRODUCES that value on the
    oracle-scale corpus (ceil(500/63) = 8), and that the composed result
    equals semantic_dedup called with the explicit value."""
    from spark_auto_schema.io import read_table
    from spark_auto_schema.ops import similarity
    from spark_auto_schema.registry.pipeline_r12 import (
        _SDS_ORACLE_NLIST,
        _SDS_TARGET,
        _SDS_THRESHOLD,
    )

    embs = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = similarity.suggest_nlist(embs, target_cluster_size=_SDS_TARGET)
    assert n == _SDS_ORACLE_NLIST
    composed = similarity.semantic_dedup(
        embs, threshold=_SDS_THRESHOLD, nlist=n
    )
    explicit = similarity.semantic_dedup(
        embs, threshold=_SDS_THRESHOLD, nlist=_SDS_ORACLE_NLIST
    )
    assert composed.exceptAll(explicit).count() == 0
    assert explicit.exceptAll(composed).count() == 0


# ------------------------------------------------------- dedup_provenance
def test_dedup_provenance_planted_pipeline(spark):
    """Planted corpus: doc 2 is an exact copy of 1 (stage='exact',
    winner 1), doc 3 a near-dup of 1 (stage='near', winner 1), doc 5 a
    near-dup of BOTH 1 and 3 — its winner must be the SMALLEST partner
    id (1, not 3) — and doc 4 is clean.  Exact drops are attributed
    even when the text also near-matches others (exact takes
    precedence), and kept rows carry a NULL winner."""
    from spark_auto_schema.ops import dedup

    base = "one two three four five six"
    df = spark.createDataFrame(
        [
            (1, "s1", base),
            (2, "s2", base),
            (3, "s2", base + " SEVEN"),
            (4, "s3", "totally different words here indeed"),
            (5, "s1", base + " EIGHT"),
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r["doc_id"]: (r["stage"], r["winner_id"])
        for r in dedup.dedup_provenance(df, threshold=0.4).collect()
    }
    assert got[1] == ("kept", None)
    assert got[2] == ("exact", 1)
    assert got[3] == ("near", 1)
    assert got[4] == ("kept", None)
    assert got[5] == ("near", 1)  # min(1, 3), not 3
    dedup.release_caches()


def test_dedup_provenance_consistent_with_token_survivorship(spark):
    """Cross-op law on the real table: the provenance stages must
    aggregate to EXACTLY token_survivorship's per-source doc/kept
    accounting (same pipeline, two projections)."""
    from pyspark.sql import functions as F

    from spark_auto_schema.io import read_table
    from spark_auto_schema.ops import dedup

    d = read_table(spark, "/root/testdata/sf0.001", "documents")
    prov = (
        dedup.dedup_provenance(d)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("stage") != "exact").cast("long")).alias("n_exact_kept"),
            F.sum((F.col("stage") == "kept").cast("long")).alias("n_kept"),
        )
    )
    surv = {r["source"]: r for r in dedup.token_survivorship(d).collect()}
    for r in prov.collect():
        s = surv[r["source"]]
        assert r["n_docs"] == s["n_docs"]
        # token twin has no doc-count columns for the near stage, but a
        # source with zero token loss must be all-kept here too
        if s["token_loss_frac"] == 0.0:
            assert r["n_kept"] == r["n_docs"]
    dedup.release_caches()


# ------------------------------------------------- post_dedup_mix_weights
def test_post_dedup_mix_weights_laws(spark):
    """Exact fixed-proportions algebra on a hand corpus: budget = the
    binding source's surviving/share; every take = floor(B * share);
    rates <= 1 with the binding source's rate == 1; a zero-share source
    takes nothing; validation rejects bad share vectors and absent
    sources."""
    import pytest as _pytest

    from spark_auto_schema.ops import corpus

    surv = spark.createDataFrame(
        [("a", 1000), ("b", 4000), ("c", 100)],
        "source string, tokens_kept_near long",
    )
    # shares: a 0.5, b 0.5 -> budget = min(1000/.5, 4000/.5) = 2000
    out = {
        r["source"]: r
        for r in corpus.post_dedup_mix_weights(
            surv, {"a": 0.5, "b": 0.5}
        ).collect()
    }
    assert out["a"]["binding"] and not out["b"]["binding"]
    assert out["a"]["take_tokens"] == 1000 and out["a"]["rate"] == 1.0
    assert out["b"]["take_tokens"] == 1000 and out["b"]["rate"] == 0.25
    assert out["c"]["take_tokens"] == 0 and not out["c"]["binding"]

    with _pytest.raises(ValueError, match="sum to 1"):
        corpus.post_dedup_mix_weights(surv, {"a": 0.5, "b": 0.6})
    with _pytest.raises(ValueError, match="positive"):
        corpus.post_dedup_mix_weights(surv, {"a": 1.5, "b": -0.5})
    with _pytest.raises(ValueError, match="absent"):
        corpus.post_dedup_mix_weights(surv, {"a": 0.5, "zz": 0.5})
    with _pytest.raises(ValueError, match="non-empty"):
        corpus.post_dedup_mix_weights(surv, {})
