"""Sequence packing, corpus mixing, and incremental dedup tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_auto_schema.ops import dedup, packing

BUDGET = 10


def _packed(spark, n=40, n_buckets=4):
    rows = [(i, 1 + (i * 7) % 6) for i in range(n)]  # tokens in 1..6 < BUDGET
    df = spark.createDataFrame(rows, "doc_id long, tokens long")
    return packing.pack_sequences(
        df, id_col="doc_id", token_col="tokens", budget=BUDGET, n_buckets=n_buckets
    )


def test_pack_budget_and_positions(spark):
    out = _packed(spark).collect()
    packs: dict[int, list] = {}
    for r in out:
        packs.setdefault(r.pack_id, []).append(r)
    for pid, rows in packs.items():
        total = sum(r.tokens for r in rows)
        # a pack overflows the budget by at most its last (straddling) doc
        assert total < BUDGET + max(r.tokens for r in rows)
        # every pack except a bucket's last is filled past the budget line
        assert sorted(r.pack_pos for r in rows) == list(range(1, len(rows) + 1))
    assert len(out) == 40  # every doc assigned exactly once


def test_pack_greedy_no_gaps(spark):
    # within a bucket, pack_local ids are dense starting at 0
    out = _packed(spark).collect()
    by_bucket: dict[int, set] = {}
    for r in out:
        by_bucket.setdefault(r.pack_id >> 32, set()).add(r.pack_id & 0xFFFFFFFF)
    for locals_ in by_bucket.values():
        assert locals_ == set(range(len(locals_)))


def test_pack_deterministic_across_partitioning(spark):
    rows = [(i, 1 + i % 5) for i in range(60)]
    a = spark.createDataFrame(rows, "doc_id long, tokens long").repartition(1)
    b = spark.createDataFrame(rows, "doc_id long, tokens long").repartition(13)
    pack = lambda df: sorted(
        (r.doc_id, r.pack_id, r.pack_pos)
        for r in packing.pack_sequences(df, budget=BUDGET, n_buckets=4).collect()
    )
    assert pack(a) == pack(b)


def test_pack_oversized_doc_isolated(spark):
    # a doc bigger than the budget cannot pull later docs over: the next doc
    # always starts a fresh pack boundary
    df = spark.createDataFrame(
        [(1, 3), (2, 50), (3, 3)], "doc_id long, tokens long"
    )
    out = packing.pack_sequences(df, budget=BUDGET, n_buckets=1).collect()
    big = next(r for r in out if r.doc_id == 2)
    others = [r for r in out if r.doc_id != 2]
    # nothing shares the oversized doc's pack except docs that preceded it
    after = [r for r in others if r.pack_id > big.pack_id]
    for r in after:
        assert r.pack_id != big.pack_id


def test_pack_rejects_bad_budget(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, tokens long")
    with pytest.raises(ValueError):
        packing.pack_sequences(df, budget=0)


def test_mix_fractions_and_nesting(spark):
    rows = [(i, ["web", "code", "books"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    full = packing.mix_by_column(df, "domain", "doc_id", {"code": 1.0}, 0.3)
    kept = full.groupBy("domain").count().collect()
    by_dom = {r.domain: r["count"] for r in kept}
    assert by_dom["code"] == 100  # fraction 1.0 keeps every row
    assert 0 < by_dom["web"] < 100 and 0 < by_dom["books"] < 100
    # nested membership: the 10% web sample is a subset of the 30% one
    small = packing.mix_by_column(df, "domain", "doc_id", {}, 0.1)
    small_web = {r.doc_id for r in small.where("domain = 'web'").collect()}
    big_web = {r.doc_id for r in full.where("domain = 'web'").collect()}
    assert small_web <= big_web


def test_mix_rejects_bad_fraction(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, domain string")
    with pytest.raises(ValueError):
        packing.mix_by_column(df, "domain", "doc_id", {"a": 1.5})


def test_incremental_exact_dedup(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, "alpha"), (11, "gamma"), (12, "gamma"), (13, "delta")],
        "doc_id long, text string",
    )
    out = {
        r.keep_id: r.content_hash
        for r in dedup.incremental_exact_dedup(batch, corpus).collect()
    }
    # "alpha" exists in the corpus -> dropped; batch-internal "gamma" pair
    # collapses to min id; "delta" is novel
    assert set(out) == {11, 13}


@pytest.mark.parametrize("md5_grade", [False, True])
def test_incremental_near_dedup_drops_corpus_clones(spark, md5_grade):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different corpus text about spark engines")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, base + " extra"),  # near-dup of corpus doc 1
            (11, "novel document with entirely unrelated words and content"),
        ],
        "doc_id long, text string",
    )
    survivors = {
        r.doc_id
        for r in dedup.incremental_near_dedup(
            batch, corpus, verify_threshold=0.5, md5_grade=md5_grade
        ).collect()
    }
    dedup.release_caches()
    assert survivors == {11}


def test_incremental_near_dedup_keeps_batch_internal_dups(spark):
    # incremental near-dedup only checks the batch AGAINST THE CORPUS;
    # batch-internal duplicates both survive (cluster them separately)
    text = "one two three four five six seven eight nine ten eleven twelve"
    corpus = spark.createDataFrame([(1, "unrelated corpus words entirely")],
                                   "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, text), (11, text)], "doc_id long, text string"
    )
    out = dedup.incremental_near_dedup(batch, corpus).collect()
    dedup.release_caches()
    assert {r.doc_id for r in out} == {10, 11}


def test_incremental_near_dedup_with_persisted_corpus_index(spark, tmp_path):
    """The production workflow: prepare_corpus_index once, persist both
    frames to parquet, reuse per batch — results must equal the direct
    (corpus-reshingled) computation, through a REAL disk round-trip."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different corpus text about spark engines")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, base + " extra"),
            (11, "novel document with entirely unrelated words and content"),
        ],
        "doc_id long, text string",
    )
    buckets, verify_sh = dedup.prepare_corpus_index(corpus)
    bpath, spath = str(tmp_path / "buckets"), str(tmp_path / "shingles")
    buckets.write.parquet(bpath)
    verify_sh.write.parquet(spath)
    index = (spark.read.parquet(bpath), spark.read.parquet(spath))

    direct = {
        r.doc_id
        for r in dedup.incremental_near_dedup(batch, corpus).collect()
    }
    via_index = {
        r.doc_id
        for r in dedup.incremental_near_dedup(
            batch, corpus, corpus_index=index
        ).collect()
    }
    dedup.release_caches()
    assert via_index == direct == {11}


# ------------------------------------------------------------ length_buckets
def test_length_buckets_rounding_and_waste(spark):
    """Each count rounds UP to the smallest power-of-two bucket, counts
    above max_len truncate into the top bucket, and waste_pct is the
    padding fraction."""
    d = spark.createDataFrame(
        [(1,), (16,), (17,), (100,), (5000,)], "t int"
    )
    rows = {
        r["bucket"]: r
        for r in packing.length_buckets(d, "t", max_len=128, min_bucket=16).collect()
    }
    assert set(rows) == {16, 32, 128}
    assert rows[16]["n_docs"] == 2          # t=1 and t=16
    assert rows[32]["n_docs"] == 1          # t=17
    assert rows[128]["n_docs"] == 2         # t=100 and t=5000 (truncated to 128)
    assert rows[128]["token_sum"] == 100 + 128
    assert rows[128]["padded_sum"] == 256
    assert rows[16]["waste_pct"] == round(1 - 17 / 32, 4)


def test_length_buckets_rejects_non_powers_of_two(spark):
    d = spark.createDataFrame([(1,)], "t int")
    with pytest.raises(ValueError):
        packing.length_buckets(d, "t", max_len=100, min_bucket=16)
    with pytest.raises(ValueError):
        packing.length_buckets(d, "t", max_len=64, min_bucket=24)
    with pytest.raises(ValueError):
        packing.length_buckets(d, "t", max_len=16, min_bucket=32)


# ------------------------------------------------------- assemble_sequences
def test_assemble_sequences_orders_and_joins(spark):
    """Payloads assemble in (order_cols) order regardless of input order,
    one row per key, with n_items and sep-joined sequence."""
    rows = [
        ("u1", 3, "c"),
        ("u1", 1, "a"),
        ("u1", 2, "b"),
        ("u2", 9, "solo"),
    ]
    d = spark.createDataFrame(rows, "k string, t int, p string").repartition(4)
    out = {
        r["k"]: r
        for r in packing.assemble_sequences(
            d, key_cols=["k"], order_cols=["t"], payload_col="p"
        ).collect()
    }
    assert out["u1"]["sequence"] == "a|b|c"
    assert out["u1"]["n_items"] == 3
    assert out["u2"]["sequence"] == "solo"
    assert out["u2"]["n_items"] == 1


def test_assemble_sequences_partitioning_invariant(spark):
    """The assembled sequence is a pure function of the data, not of the
    input partitioning (the raw collect_list order is neither)."""
    rows = [("u", i, f"m{i}") for i in range(50)]
    d1 = spark.createDataFrame(rows, "k string, t int, p string").coalesce(1)
    d2 = spark.createDataFrame(rows, "k string, t int, p string").repartition(16)
    s1 = packing.assemble_sequences(d1, ["k"], ["t"], "p").collect()[0]["sequence"]
    s2 = packing.assemble_sequences(d2, ["k"], ["t"], "p").collect()[0]["sequence"]
    assert s1 == s2 == "|".join(f"m{i}" for i in range(50))


def test_assemble_sequences_max_items_keeps_prefix(spark):
    """max_items truncates AFTER the sort (context-window keep-first), and
    n_items reports the emitted length."""
    rows = [("u", i, f"m{i}") for i in range(10)]
    d = spark.createDataFrame(rows, "k string, t int, p string")
    r = packing.assemble_sequences(d, ["k"], ["t"], "p", max_items=3).collect()[0]
    assert r["sequence"] == "m0|m1|m2"
    assert r["n_items"] == 3
    with pytest.raises(ValueError):
        packing.assemble_sequences(d, ["k"], ["t"], "p", max_items=0)


def test_fim_transform_reassembly_and_determinism(spark):
    """FIM laws: prefix+middle+suffix reassemble the original text for
    selected docs; all three spans are non-empty; non-selected and short
    docs pass through untouched; the cut is a pure function of doc_id
    (partitioning-invariant)."""
    from pyspark.sql import functions as F

    from spark_auto_schema.ops import packing

    docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{j}" for j in range(20)))
            for i in range(40)
        ]
        + [(100, "too short")],
        "doc_id long, text string",
    )
    rows = packing.fim_transform(docs).collect()
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    n_fim = 0
    for r in rows:
        if r["fim_applied"]:
            n_fim += 1
            assert r["prefix"] and r["middle"] and r["suffix"]
            joined = f'{r["prefix"]} {r["middle"]} {r["suffix"]}'
            assert joined == orig[r["doc_id"]]
        else:
            assert r["prefix"] == orig[r["doc_id"]]
            assert r["middle"] == "" and r["suffix"] == ""
    assert 0 < n_fim < len(rows)  # the draw selects some, not all
    short = [r for r in rows if r["doc_id"] == 100][0]
    assert not short["fim_applied"]  # below min_tokens never cut

    again = packing.fim_transform(docs.repartition(7)).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_span_corruption_laws(spark):
    """Round-trip law: substituting each target span back for its sentinel
    in the input reconstructs the original text; sentinels are numbered
    0..n_spans-1 in document order; no-mask docs pass through; the
    transform is partitioning-invariant."""
    import re

    from spark_auto_schema.ops import packing

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(30))) for i in range(20)],
        "doc_id long, text string",
    )
    rows = packing.span_corruption(docs).collect()
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    saw_span = False
    for r in rows:
        if r["n_spans"] == 0:
            assert r["input"] == orig[r["doc_id"]] and r["target"] == ""
            continue
        saw_span = True
        # parse target into {sentinel: tokens}
        parts = re.split(r"(<extra_id_\d+>)", r["target"])
        spans, cur = {}, None
        for p in parts:
            p = p.strip()
            if not p:
                continue
            if re.fullmatch(r"<extra_id_\d+>", p):
                cur = p
                spans[cur] = []
            else:
                spans[cur].extend(p.split(" "))
        assert list(spans) == [f"<extra_id_{k}>" for k in range(r["n_spans"])]
        rebuilt = r["input"]
        for sent, toks in spans.items():
            rebuilt = rebuilt.replace(sent, " ".join(toks), 1)
        assert rebuilt == orig[r["doc_id"]]
    assert saw_span

    again = packing.span_corruption(docs.repartition(5)).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_packing_length_sweep_matches_packer_and_monotonicity(spark):
    """For every budget, the sweep's pack count and per-pack token totals
    must equal what pack_sequences + pack_stats actually produce (the
    sweep prices the real packer, not an approximation of it); waste is
    in [0, 1); and pack counts are non-increasing in the budget."""
    from pyspark.sql import functions as F

    from spark_auto_schema.ops import packing

    rows = [(i, 10 + (i * 7) % 50) for i in range(120)]
    toks = spark.createDataFrame(rows, "doc_id long, tokens int")
    sweep = {
        r["budget"]: r
        for r in packing.packing_length_sweep(
            toks, budgets=(64, 128, 256), n_buckets=4
        ).collect()
    }
    assert set(sweep) == {64, 128, 256}
    counts = [sweep[b]["n_packs"] for b in (64, 128, 256)]
    assert counts == sorted(counts, reverse=True)
    for b in (64, 128, 256):
        packed = packing.pack_sequences(
            toks, id_col="doc_id", token_col="tokens", budget=b, n_buckets=4
        )
        stats = packing.pack_stats(packed, "tokens").collect()
        assert sweep[b]["n_packs"] == len(stats)
        assert sweep[b]["total_tokens"] == sum(r["pack_tokens"] for r in stats)
        waste = sum(max(b - r["pack_tokens"], 0) for r in stats) / (
            len(stats) * b
        )
        assert sweep[b]["waste_pct"] == round(waste, 6)
        assert 0 <= sweep[b]["waste_pct"] < 1
