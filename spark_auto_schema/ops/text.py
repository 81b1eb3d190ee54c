"""Text analysis operators: stats, token counting, language ID, quality,
fingerprinting.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs.  Each operator has an exact ANSI-SQL
equivalent (see ``__spark_entry__.oracle_sql``) so the driver's DuckDB oracle
can verify it value-for-value; the SQL is generated from the same constants
below to keep the two in lockstep.

Scale notes (100 TB): every operator here is a narrow per-row projection —
no shuffle, no state; it pipelines inside the scan stage and scales linearly
with input splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Stopword profiles for the n-gram/stopword-hit language heuristic.
# Deterministic and tiny by design: language ID at scale must stay JVM-side.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en": ("the", "a", "of", "and", "to", "is", "in"),
    "es": ("el", "la", "de", "que", "y", "los", "es"),
    "fr": ("le", "la", "et", "les", "des", "est", "une"),
    "zh": ("de", "le", "shi", "bu", "wo", "zai", "you"),
}

# BPE-ish tokenization regex: letter runs, single digits, single punctuation.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^\w\s]"

# Training-data cleaning patterns.  Deliberately simple and anchored so the
# DuckDB oracle (same regexes, same order) reproduces them byte-for-byte.
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"

# NFKC-lite compatibility folds (normalize_text).  1:1 maps ride a single
# translate(); 1:n expansions and deletions ride anchored regexes.  The
# oracle SQL embeds these SAME constants so both engines fold identically.
# Fullwidth ASCII block U+FF01-U+FF5E -> ASCII 0x21-0x7E (94 chars) ...
_NFKC_FROM = "".join(chr(0xFF01 + i) for i in range(94))
_NFKC_TO = "".join(chr(0x21 + i) for i in range(94))
# ... plus Unicode spaces -> ASCII space, curly quotes -> straight,
# dash family -> hyphen-minus (all 1:1)
_NFKC_FROM += "\u3000\u00a0\u2002\u2003\u2009\u202f" "\u2018\u2019\u201c\u201d" "\u2012\u2013\u2014\u2212"
_NFKC_TO += "  " + "    " + "''" + '""' + "----"
# invisibles deleted outright: ZWSP, BOM/ZWNBSP, soft hyphen
_NFKC_DELETE_RE = "[\u200b\ufeff\u00ad]"
# 1:n expansions: ellipsis and the fi/fl ligatures
_NFKC_EXPAND: tuple[tuple[str, str], ...] = (
    ("\u2026", "..."),
    ("\ufb01", "fi"),
    ("\ufb02", "fl"),
)
# whitespace-run collapse class, EXPLICIT rather than \s: Java \s includes
# U+000B vertical tab while DuckDB's RE2 \s does not, so a \s-based oracle
# match would be corpus-content-dependent (round-8 advice).  Both engines
# interpret this exact class string identically.
_NFKC_WS_RUN_RE = r"[ \t\n\f\r\x0B]+"

# chars-per-BPE-token proxy for tokenizer_fertility: ceil(len(word)/4)
# subword units per word — the published ~4-chars/token English heuristic
BPE_CHARS_PER_TOKEN = 4


# Frames persisted for intra-query reuse (bigram_logprob's pair stream
# feeds both model training and scoring); call :func:`release_caches`
# between queries to drop them — bench and the correctness mirror do.
_CACHED: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _CACHED.append(df)
    return df


def release_caches() -> None:
    """Unpersist every DataFrame cached by this module's operators."""
    while _CACHED:
        try:
            _CACHED.pop().unpersist()
        except Exception:  # pragma: no cover - session already stopped
            pass


def _n_words(text: Column) -> Column:
    return F.size(F.split(text, " "))


def stopword_hits(text: Column, lang: str) -> Column:
    """Count of stopword occurrences for one language profile (word-bounded)."""
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.regexp_count(text, F.lit(pat))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document surface statistics: chars, words, word length, punctuation."""
    t = F.col(text_col)
    n_words = _n_words(t)
    n_chars = F.length(t)
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        F.round(F.length(F.replace(t, F.lit(" "), F.lit(""))) / n_words, 4).alias(
            "avg_word_len"
        ),
        F.regexp_count(t, F.lit(PUNCT_RE)).alias("n_punct"),
    )


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        _n_words(t).alias("ws_tokens"),
        F.regexp_count(t, F.lit(BPE_TOKEN_RE)).alias("bpe_tokens"),
    )


def _lang_pred(text_col: str) -> tuple[Column, Column]:
    """(prediction, best-hit-count) columns of the stopword-argmax
    language heuristic, alphabetical tie-break — the ONE definition of
    the classifier, shared by :func:`language_id` and
    :func:`lang_confusion` so the confusion matrix can never silently
    disagree with the classifier it evaluates."""
    t = F.col(text_col)
    hit_cols = {lang: stopword_hits(t, lang) for lang in sorted(STOPWORDS)}
    best = F.greatest(*hit_cols.values())
    pred = None
    for lang in sorted(STOPWORDS):  # alphabetical order = tie-break
        cond = hit_cols[lang] == best
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return pred, best


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: stopword-profile hit counts, argmax with
    deterministic alphabetical tie-break.

    Returns (id, lang_pred, lang_hits).  One projection, no shuffle.
    """
    pred, best = _lang_pred(text_col)
    return df.select(
        F.col(id_col),
        pred.alias("lang_pred"),
        best.alias("lang_hits"),
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: "list[str] | None" = None,
) -> DataFrame:
    """Composite quality score in [0,1]: length saturation, low punctuation,
    stopword density.  The exact arithmetic (and its evaluation order) is
    mirrored in the DuckDB oracle, rounded to 4 decimals.

    ``keep_cols`` passes extra columns through unchanged (e.g. ``source``
    for per-group rollups like quality_drift_sources) — the score stays a
    per-row projection either way.
    """
    t = F.col(text_col)
    n_words = _n_words(t).cast("double")
    n_chars = F.length(t).cast("double")
    punct_ratio = F.regexp_count(t, F.lit(PUNCT_RE)) / n_chars
    stop_ratio = stopword_hits(t, "en") / n_words
    score = (
        F.least(F.lit(1.0), n_words / F.lit(100.0)) * F.lit(0.5)
        + (F.lit(1.0) - punct_ratio) * F.lit(0.3)
        + F.least(F.lit(1.0), stop_ratio * F.lit(5.0)) * F.lit(0.2)
    )
    # double-round through DECIMAL(18,10): engines disagree on round() of
    # doubles sitting one ulp below a half boundary (e.g. 0.49124999...96);
    # snapping to 10 decimal digits first makes the 4-digit round portable
    quality = F.round(score.cast("decimal(18,10)"), 4).cast("double")
    extra = [F.col(c) for c in (keep_cols or [])]
    return df.select(F.col(id_col), *extra, quality.alias("quality"))


def top_terms(
    df: DataFrame, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide top-k terms by frequency: lowercase, strip non-[a-z0-9 ],
    split on spaces, count, keep the k most frequent (term asc tie-break).

    Explode + hash aggregate: the shuffle carries (term, partial_count)
    after map-side combine — the classic scale-safe wordcount.  The final
    top-k is a TakeOrdered over the aggregated term table."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", "")
    return (
        df.select(F.explode(F.split(norm, " ")).alias("term"))
        .where(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("term"))
        .limit(k)
    )


def clean_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Boilerplate cleanup for training corpora: strip URLs, collapse runs of
    whitespace, trim.  Order matters and is mirrored in the oracle.

    A narrow per-row projection (three regexp_replace calls, JVM-side):
    pipelines inside the scan, no shuffle, linear at any scale."""
    t = F.col(text_col)
    no_urls = F.regexp_replace(t, URL_RE, " ")
    squeezed = F.regexp_replace(no_urls, r"\s+", " ")
    return df.select(F.col(id_col), F.trim(squeezed).alias("clean_text"))


def _redact_expr(t: Column) -> Column:
    """The redaction replacement chain — the single source both
    :func:`redact_pii` (the scrubber) and :func:`redaction_audit` (the
    audit that proves the scrubber) apply, so the audit can never
    silently drift onto an older chain than production runs."""
    return F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII redaction pass: emails -> <EMAIL>, long digit runs shaped like
    phone numbers -> <PHONE>.  Returns the redacted text plus match counts
    so a pipeline can route high-PII documents to review.

    Same scale profile as :func:`clean_text` — per-row regexps, no Python,
    no shuffle."""
    t = F.col(text_col)
    redacted = _redact_expr(t)
    return df.select(
        F.col(id_col),
        redacted.alias("redacted"),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phones"),
    )


def repetition_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Repetition quality signal (C4/Gopher-style): fraction of duplicate
    word 3-grams within the document.  1.0 - distinct/total; 0 for text with
    no repeated 3-grams, approaching 1 for highly repetitive boilerplate.

    Computed with array higher-order functions on the row — no explode, no
    shuffle: the per-document gram list never leaves its row."""
    words = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - 3, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, 3)),
    )
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return df.select(
        F.col(id_col),
        F.round(F.lit(1.0) - distinct / total, 4).alias("rep_ratio"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint: md5 of the lowercased text with
    everything but [a-z0-9 ] stripped.  Identical content -> identical
    fingerprint regardless of case/punctuation noise."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", "")
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


# Gopher-style document-quality gate thresholds (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", table A1 idea: reject documents outside word
# count / word length / stopword / alpha-fraction bounds).  Named constants so
# the DuckDB oracle is generated from the same numbers.
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 80
GOPHER_MIN_AVG_WORD_LEN = 3.0
GOPHER_MAX_AVG_WORD_LEN = 5.0
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_MIN_ALPHA_FRAC = 0.8


def gopher_quality_filter(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style composite quality gate: per-document rule booleans plus
    the conjunction ``keep``.  Returning the individual rule outcomes (not
    just the verdict) is what a curation pipeline needs to audit WHY a
    document was dropped and to tune thresholds per corpus.

    Rules: word count in [GOPHER_MIN_WORDS, GOPHER_MAX_WORDS]; mean word
    length in [GOPHER_MIN_AVG_WORD_LEN, GOPHER_MAX_AVG_WORD_LEN]; at least
    GOPHER_MIN_STOPWORD_HITS English stopword occurrences; fraction of words
    containing an alphabetic character >= GOPHER_MIN_ALPHA_FRAC.

    One narrow per-row projection of built-ins — no shuffle, no Python; at
    100 TB this pipelines inside the scan like every other filter here."""
    t = F.col(text_col)
    words = F.split(t, " ")
    n_words = F.size(words)
    avg_wl = F.length(F.replace(t, F.lit(" "), F.lit(""))) / n_words
    alpha_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / n_words
    )
    wordcount_ok = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    word_len_ok = (avg_wl >= GOPHER_MIN_AVG_WORD_LEN) & (
        avg_wl <= GOPHER_MAX_AVG_WORD_LEN
    )
    stop_ok = stopword_hits(t, "en") >= GOPHER_MIN_STOPWORD_HITS
    alpha_ok = alpha_frac >= GOPHER_MIN_ALPHA_FRAC
    return df.select(
        F.col(id_col),
        wordcount_ok.alias("wordcount_ok"),
        word_len_ok.alias("word_len_ok"),
        stop_ok.alias("stop_ok"),
        alpha_ok.alias("alpha_ok"),
        (wordcount_ok & word_len_ok & stop_ok & alpha_ok).alias("keep"),
    )


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Perplexity-proxy scoring: train an add-one-smoothed unigram LM on the
    corpus itself, then score each document by its mean token log-probability
    — the cheap stand-in for KenLM-style quality scoring in data curation
    (low avg logprob = unusual token distribution = candidate for review).

    Two passes over the corpus, both scale-safe: (1) the classic wordcount
    (explode -> map-side-combined hash aggregate; the shuffle carries the
    vocabulary, not the corpus), (2) a score pass where each token joins the
    vocabulary-sized model — broadcast, so no corpus shuffle; the only wide
    exchange is the final per-document average keyed on ``id_col``.

    Returns (id, avg_logprob, n_tokens); avg_logprob = mean over tokens of
    ln((count + 1) / (N + V)), snapped through DECIMAL(18,10) then rounded
    to 4 digits so the DuckDB oracle agrees bit-for-bit."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).where(F.length("w") > 0)
    model = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = model.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    )
    logp = model.crossJoin(F.broadcast(totals)).select(
        "w",
        F.log((F.col("c") + F.lit(1.0)) / (F.col("n") + F.col("v"))).alias("lp"),
    )
    return (
        toks.join(F.broadcast(logp), "w")
        .groupBy(id_col)
        .agg(
            F.round(F.avg("lp").cast("decimal(18,10)"), 4)
            .cast("double")
            .alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    vocab_size: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer-planning metric: per-document fraction of tokens covered by
    the corpus top-``vocab_size`` vocabulary (and the OOV remainder).

    Stage 1 builds the vocabulary with the map-side-combined wordcount and a
    TakeOrdered top-k (count desc, term asc tie-break — deterministic across
    engines).  Stage 2 left-semi-flags each token against the
    vocabulary-sized table — broadcast, so the corpus-sized token stream
    never shuffles for the membership test; the only wide exchange is the
    final per-document aggregate.  Returns (id, n_tokens, n_covered,
    coverage rounded to 4)."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).where(F.length("w") > 0)
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(vocab_size)
        .select("w", F.lit(1).alias("__in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "w", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count("__in_vocab").alias("n_covered"),
            F.round(F.count("__in_vocab") / F.count(F.lit(1)), 4).alias("coverage"),
        )
    )


def tfidf_top_pairs(
    df: DataFrame,
    threshold: float = 0.2,
    max_df_frac: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate / related-document pairs by cosine similarity of
    L2-normalized tf-idf vectors over word ``n``-gram terms:
    (id_a, id_b, tfidf_sim >= threshold), id_a < id_b.

    The scale contract is the same as the shingle-join dedups: pairs are
    generated ONLY for documents sharing a term (equi-join keyed on the
    term), and terms appearing in more than ``max_df_frac`` of documents are
    dropped BEFORE the join — a hot term would otherwise generate ~n^2 pairs
    on its own while contributing almost nothing to tf-idf weight (its idf
    is near zero).  With the cap, join fan-out tracks the document-frequency
    distribution tail, not n^2.  Terms default to trigrams because unigram
    vocabularies are hot by construction; n=1 gives classic word tf-idf.

    Weights: tf = in-doc count, idf = ln(N / df_t), w = tf * idf, vectors
    L2-normalized per document so the pair dot product IS the cosine.
    Similarity is rounded to 4 decimals before thresholding (both engines
    agree on the rounded value; raw doubles can differ in the last ulp).

    Every aggregation and join after the explode keys on ``xxhash64(term)``
    — an 8-byte key — instead of the term string itself: the tf/df
    aggregates and the pair-generating self-join shuffle a fixed-width
    column where the n-gram string would be ~3 words of text per row.
    tf-idf only ever consumes term *identity* (counts per term), never the
    term text, so the rewrite is semantics-preserving up to 64-bit hash
    collisions (~n_terms^2 / 2^64 — negligible at any corpus size where
    this operator is usable)."""
    words = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    toks = (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("__g"))
        .where(F.length("__g") > 0)
        .select("id", F.xxhash64("__g").alias("w"))
    )
    n_docs = df.count()
    # Window formulations for df and the norm: the aggregate-then-join-back
    # alternative evaluates its input twice per stage (partial aggregation
    # specializes the aggregate's exchange, so it can't be reused by the
    # join side).  Each window below adds exactly one shuffle and consumes
    # its input once: (id, w) for tf, w for document frequency, id for the
    # L2 norm — then the pair self-join re-shuffles by w (its two sides ARE
    # identical subplans, which Catalyst reuses).
    tf = toks.groupBy("id", "w").agg(F.count(F.lit(1)).alias("tf"))
    with_df = tf.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("w"))
    ).where(F.col("__df") <= int(max_df_frac * n_docs))
    wtd = with_df.select(
        "id",
        "w",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("__df"))).alias("wt"),
    )
    unit = wtd.withColumn(
        "__nm",
        F.sqrt(F.sum(F.col("wt") * F.col("wt")).over(Window.partitionBy("id"))),
    ).select("id", "w", (F.col("wt") / F.col("__nm")).alias("u"))
    a, b = unit.alias("a"), unit.alias("b")
    return (
        a.join(b, "w")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.round(F.sum(F.col("a.u") * F.col("b.u")), 4).alias("tfidf_sim"))
        .where(F.col("tfidf_sim") >= threshold)
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the step that
    turns a raw corpus into training/RAG units: (doc_id, chunk_id,
    chunk_text, n_tokens), chunk windows of ``chunk_tokens`` whitespace
    tokens advancing by ``chunk_tokens - overlap``.

    Built-ins only (split -> sequence of window starts -> slice -> explode):
    a narrow per-row projection that pipelines inside the scan — no shuffle,
    no Python, output row count = ceil(tokens/step) per doc.  At 100 TB
    chunking is embarrassingly parallel and this stays a single map stage."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    words = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(words) - 1, F.lit(0)), F.lit(step)
    )
    return (
        df.select(
            F.col(id_col),
            F.explode(starts).alias("start"),
            words.alias("__w"),
        )
        .select(
            F.col(id_col),
            (F.col("start") / step).cast("long").alias("chunk_id"),
            F.concat_ws(" ", F.slice("__w", F.col("start") + 1, chunk_tokens)).alias(
                "chunk_text"
            ),
            F.least(
                F.size("__w") - F.col("start"), F.lit(chunk_tokens)
            ).cast("long").alias("n_tokens"),
        )
        .where(F.length("chunk_text") > 0)
    )


def chunk_reconstruction_check(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Losslessness contract for :func:`chunk_documents`: reassemble each
    document from its ACTUAL chunk output — every chunk contributes its
    first ``chunk_tokens - overlap`` tokens, the final chunk contributes
    everything — and compare against the document's own token stream:
    ``(doc_id, n_chunks, doc_tokens, chunk_tokens_total,
    overhead_tokens, ok)``.  ``ok`` proves no token is lost or
    reordered by the windowing; ``overhead_tokens`` (= total chunk
    tokens minus document tokens) is the exact storage/compute tax the
    overlap buys — the number a RAG/packing pipeline budgets against.

    Run it after any chunking-parameter change: an off-by-one in the
    window start arithmetic silently drops or duplicates boundary tokens
    in every document, which this flips to ``ok = false`` corpus-wide.

    Scale: consumes the chunk relation as produced (one map stage), one
    per-doc max window (partition = that doc's chunk count, bounded by
    doc length / step), one id-keyed reassembly aggregate, and a join
    back to the |docs|-row token-stream projection."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    chunks = chunk_documents(df, chunk_tokens, overlap, text_col, id_col)
    w_doc = Window.partitionBy(id_col)
    contrib = F.when(
        F.col("chunk_id") < F.max("chunk_id").over(w_doc),
        F.concat_ws(" ", F.slice(F.split("chunk_text", " "), 1, step)),
    ).otherwise(F.col("chunk_text"))
    rebuilt = (
        chunks.select(
            F.col(id_col),
            F.col("chunk_id"),
            F.col("n_tokens"),
            contrib.alias("__part"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").cast("long").alias("chunk_tokens_total"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_id", "__part"))
                    ),
                    lambda s: s["__part"],
                ),
                " ",
            ).alias("__rebuilt"),
        )
    )
    doc = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias(
            "doc_tokens"
        ),
        F.concat_ws(" ", F.split(F.col(text_col), " ")).alias("__stream"),
    )
    return doc.join(rebuilt, id_col).select(
        id_col,
        "n_chunks",
        "doc_tokens",
        "chunk_tokens_total",
        (F.col("chunk_tokens_total") - F.col("doc_tokens")).alias(
            "overhead_tokens"
        ),
        (F.col("__rebuilt") == F.col("__stream")).alias("ok"),
    )


def bigram_pmi(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information:
    ``PMI(w1,w2) = ln(P(w1,w2) / (P(w1) * P(w2)))`` with probabilities from
    corpus bigram/unigram counts — the classic collocation detector
    (Church & Hanks 1990) used to mine multi-word vocabulary entries from a
    pretraining corpus.

    Tokenization matches :func:`top_terms` (lowercase, strip non-[a-z0-9 ],
    split on spaces, drop empties) so the two ops share a vocabulary.  Only
    bigrams seen at least ``min_count`` times are ranked (rare-pair PMI is
    noise); ties break on (w1, w2).

    Scale (100 TB): bigrams form row-locally via ``zip_with`` over the
    token array (no self-join!), then ONE wordcount-style hash aggregate
    each for unigrams and bigrams with map-side combine.  Corpus totals are
    a 1-row aggregate broadcast back; the two vocabulary joins attach
    unigram counts to the (``min_count``-pruned, hence much smaller) bigram
    table.  Final top-k is a TakeOrdered, never a global sort.

    Plan note: ~7 exchanges is the honest floor for this dataflow — two
    wordcount aggregates (unigram, bigram), the 1-row totals aggregate,
    and two vocabulary equi-joins (each repartitions both sides on its
    word key; w1- and w2-partitionings cannot be reused for each other).
    Every exchange carries map-side-combined partials or the pruned bigram
    table, never raw tokens.
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", "")
    toks = df.select(
        F.filter(F.split(norm, " "), lambda x: x != "").alias("__t")
    )
    totals = toks.agg(
        F.sum(F.size("__t")).cast("double").alias("__nu"),
        F.sum(F.greatest(F.size("__t") - 1, F.lit(0)))
        .cast("double")
        .alias("__nb"),
    )
    uni = (
        toks.select(F.explode("__t").alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).cast("double").alias("__c"))
    )
    n1 = F.greatest(F.size("__t") - 1, F.lit(0))
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice("__t", 1, n1),
                F.slice("__t", 2, n1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("__p")
    )
    big = (
        pairs.select(F.col("__p.w1").alias("w1"), F.col("__p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= min_count)
    )
    u1 = uni.select(F.col("__w").alias("w1"), F.col("__c").alias("__c1"))
    u2 = uni.select(F.col("__w").alias("w2"), F.col("__c").alias("__c2"))
    scored = (
        big.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n",
            F.round(
                F.log(
                    (F.col("n") / F.col("__nb"))
                    / ((F.col("__c1") / F.col("__nu")) * (F.col("__c2") / F.col("__nu")))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "w1", "w2").limit(k)


def bigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Bigram-LM perplexity proxy: train add-one-smoothed bigram
    conditionals on the corpus itself, then score each document by its
    mean adjacent-pair log-probability —
    ``lp(w1, w2) = ln((c(w1,w2) + 1) / (c1(w1) + V))`` with ``c1`` the
    corpus occurrence count of the history token and ``V`` the distinct
    vocabulary.  The context-aware sibling of :func:`unigram_logprob`:
    unigram scoring flags unusual WORDS, bigram scoring flags unusual
    SEQUENCES (word-salad, shuffled boilerplate, template churn) whose
    individual tokens are all common — the next rung on the KenLM-style
    quality ladder.

    Returns ``(id, avg_bigram_logprob, n_pairs)``; documents with fewer
    than two tokens have no pairs and are absent from the output.  The
    average is snapped through DECIMAL(18,10) then rounded to 4 digits so
    the DuckDB oracle agrees bit-for-bit.

    Scale: pair generation is a row-local slide over the token array (no
    shuffle), PERSISTED because it feeds both model training and scoring
    (the 3x win measured at sf0.1; :func:`release_caches` drops it —
    bench and the mirror call that per query); the bigram and unigram
    models are map-side-combined hash aggregates whose shuffles carry the
    VOCABULARY, not the corpus; the model-side join (bigram x
    history-count) is vocabulary-sized; the score join is left to AQE —
    it broadcasts a model that fits and co-partitions one that doesn't
    (no hard hint: a 100 TB corpus's bigram table outgrows broadcast);
    the only corpus-wide exchange is the final per-document average."""
    words = F.filter(
        F.split(F.col(text_col), " "), lambda x: F.length(x) > 0
    )
    pair_idx = F.when(
        F.size(words) >= 2, F.sequence(F.lit(1), F.size(words) - 1)
    ).otherwise(F.array().cast("array<int>"))
    pairs = _persist(
        df.select(
            F.col(id_col),
            F.explode(pair_idx).alias("__i"),
            words.alias("__w"),
        ).select(
            id_col,
            F.element_at("__w", F.col("__i")).alias("w1"),
            F.element_at("__w", F.col("__i") + 1).alias("w2"),
        )
    )
    toks = df.select(F.explode(words).alias("w"))
    uni = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    v = uni.agg(F.count(F.lit(1)).alias("v"))
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    model = (
        big.join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "w1",
            "w2",
            F.log(
                (F.col("c") + F.lit(1.0)) / (F.col("c1") + F.col("v"))
            ).alias("lp"),
        )
    )
    return (
        pairs.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.round(F.avg("lp").cast("decimal(18,10)"), 4)
            .cast("double")
            .alias("avg_bigram_logprob"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )


def token_entropy(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """Per-group Shannon entropy (nats) of the whitespace-token
    distribution: ``(group, n_tokens, vocab_size, entropy)``.

    The corpus-diversity monitor behind mixture tuning: a source whose
    entropy collapses (template spam, boilerplate floods, mode-collapsed
    synthetic data) reads low against its peers long before dedup pair
    counts move.  Entropy is computed with the single-pass identity
    ``H = ln N - (sum c*ln c) / N`` over the per-(group, token) counts, so
    no second totals pass and no join: one explode feeding a map-side
    combined (group, token) hash aggregate — the wordcount shuffle shape —
    then a |vocab|-row rollup to one row per group.  At 100 TB both
    shuffles carry counts, never text, and the final state is
    O(groups).  The rounding goes through DECIMAL(18,10) so the DuckDB
    oracle (same identity, same order-insensitive sums) lands on the
    identical 4th decimal.
    """
    tok = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).where(F.length("tok") > 0)
    counts = tok.groupBy("grp", "tok").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    h = F.log(n) - F.sum(F.col("c") * F.log("c")) / n
    return counts.groupBy("grp").agg(
        n.alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab_size"),
        F.round(h.cast("decimal(18,10)"), 4).cast("double").alias("entropy"),
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    topk: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``topk`` documents by Okapi BM25 score against a bag of query
    terms: ``(doc_id, bm25)`` ordered by score desc, id asc (deterministic
    tie-break), score decimal-snapped to 4 places.

    The retrieval scorer behind lexical search and hybrid RAG pipelines —
    tf-idf's production successor (tf saturation via ``k1``, document-length
    normalization via ``b``).  idf uses the Lucene form
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``, which is non-negative for any
    df <= N.  Scores are snapped to 4 decimals (like tfidf_top_pairs):
    the ln/division chain is transcendental, so raw doubles can differ in
    the last ulp across engines.

    Scale: the token explode is filtered to the query terms BEFORE any
    aggregation — the per-term tf aggregate and df aggregate run on the
    |query| x matching-docs slice, never the full posting space.  Corpus
    scalars (N, avgdl) ride a 1-row broadcast cross-join; per-term df
    (<= |query| rows) broadcasts onto the tf slice.  The final ordering is
    a TakeOrdered top-k, never a full sort.  Tokenization matches the
    corpus convention (whitespace split)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    dl = toks.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    qtoks = toks.where(F.col("term").isin(query_terms))
    tf = qtoks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = df.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        dl.agg(F.avg("dl").alias("avgdl"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    contrib = (
        tf.join(F.broadcast(dfreq), on="term")
        .join(dl, on="id")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            (
                idf
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
                )
            ).alias("w"),
        )
    )
    scored = contrib.groupBy("id").agg(
        F.round(F.sum("w").cast("decimal(18,12)"), 4).cast("double").alias("bm25")
    )
    return (
        scored.orderBy(F.col("bm25").desc(), F.col("id"))
        .limit(topk)
        .select(F.col("id").alias(id_col), "bm25")
    )


def heavy_hitters_sketch(
    df: DataFrame,
    min_count: int,
    text_col: str = "text",
    max_items_tracked: int | None = None,
    corpus_tokens_hint: int | None = None,
) -> DataFrame:
    """Frequent tokens via Spark's native approx_top_k sketch: ``(term,
    n)`` for every token with count >= ``min_count``, sorted (n desc,
    term).

    The single-pass alternative to the exact wordcount (top_terms): the
    DataSketches frequent-items aggregate builds bounded-size partial
    sketches per partition and MERGES them — no (term, count) shuffle of
    the full vocabulary, which at 100 TB is the difference between a
    fixed-megabyte combine and a vocabulary-sized exchange.  Counts are
    EXACT whenever the observed vocabulary fits ``max_items_tracked``
    (the sketch only approximates under eviction), which is why the
    frequency threshold — not a top-k cut whose boundary ties would be
    sketch-order-dependent — is the output contract.

    The ``count >= min_count`` contract is VALIDATED, not assumed: the
    same single pass also counts total tokens T, and the query fails
    loudly (raise_error in-plan) unless ``min_count`` exceeds the
    frequent-items a-priori error bound ``3.5 * T / max_items_tracked``
    — the regime where the sketch guarantees no false negatives and the
    threshold cut is trustworthy.  Under that bound a silent lower-bound
    answer would masquerade as an exact one; failing is the honest mode
    (raise ``max_items_tracked`` or ``min_count`` to proceed).

    CAPACITY SIZING (round-8 verdict): when ``max_items_tracked`` is
    None the capacity is DERIVED so the guard provably passes —
    ``max(4096, 2 * ceil(3.5 * T / min_count))`` where T is
    ``corpus_tokens_hint`` (the 100 TB path: pass the token count the
    pipeline already profiled, zero extra scans) or, absent a hint, one
    cheap token-count aggregate over the same scan shape (a single
    EAGER extra pass AT CONSTRUCTION TIME — the None-hint path is not
    lazy; fine at test scale, wasteful at 100 TB — pass the hint).  A
    fixed default capacity would instead make this call site hard-error
    the day the corpus outgrows it.

    The derived capacity is bounded by Spark's ``approx_top_k``
    ``maxItemsTracked`` limit (1,000,000): beyond it the sketch cannot
    guarantee ``min_count`` sits above the error bound at this corpus
    size, so the derivation RAISES a descriptive ValueError (min_count
    too low for the corpus) instead of letting approx_top_k fail
    opaquely — raise ``min_count`` or pass an explicit capacity."""
    # Spark's DataSketches frequent-items aggregate rejects capacities
    # above this (approx_top_k maxItemsTracked limit)
    _SPARK_MAX_ITEMS_TRACKED = 1_000_000
    toks = df.select(F.explode(F.split(F.col(text_col), " ")).alias("term"))
    if max_items_tracked is None:
        t_est = corpus_tokens_hint
        if t_est is None:
            t_est = toks.count()
        max_items_tracked = max(
            4096, 2 * -(-int(3.5 * t_est) // max(int(min_count), 1))
        )
        if max_items_tracked > _SPARK_MAX_ITEMS_TRACKED:
            raise ValueError(
                "heavy_hitters_sketch: derived capacity "
                f"{max_items_tracked} exceeds Spark approx_top_k's "
                f"maxItemsTracked limit {_SPARK_MAX_ITEMS_TRACKED} — "
                f"min_count {int(min_count)} is too low for a corpus of "
                f"~{int(t_est)} tokens (need min_count > "
                f"{int(7 * t_est / _SPARK_MAX_ITEMS_TRACKED)}); raise "
                "min_count or pass max_items_tracked explicitly"
            )
    sk = toks.agg(
        F.expr(
            f"approx_top_k(term, {int(max_items_tracked)}, {int(max_items_tracked)})"
        ).alias("tk"),
        F.count(F.lit(1)).alias("total_tokens"),
    )
    err_bound = F.floor(
        F.lit(3.5) * F.col("total_tokens") / F.lit(int(max_items_tracked))
    )
    # guard lives in a filter (not a droppable projection) so Catalyst
    # cannot prune it; the otherwise-branch only evaluates on violation
    guard = F.when(F.lit(int(min_count)) > err_bound, F.lit(True)).otherwise(
        F.raise_error(
            F.concat_ws(
                " ",
                F.lit(
                    "heavy_hitters_sketch: min_count"
                    f" {int(min_count)} <= sketch error bound"
                ),
                err_bound.cast("string"),
                F.lit(
                    f"(3.5 * total_tokens / {int(max_items_tracked)});"
                    " counts would be silent lower-bound estimates —"
                    " raise max_items_tracked or min_count"
                ),
            )
        ).cast("boolean")
    )
    return (
        sk.where(guard)
        .select(F.explode(F.col("tk")).alias("e"))
        .select(F.col("e.item").alias("term"), F.col("e.count").alias("n"))
        .where(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("term"))
    )


def cooccurrence_pmi(
    df: DataFrame,
    min_count: int = 500,
    min_pair_docs: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document-level term co-occurrence PMI: ``(term_a, term_b, n_docs,
    pmi)`` for term pairs (a < b) appearing together in >= ``min_pair_docs``
    documents, over the vocabulary of terms with corpus count >=
    ``min_count``.  pmi = ln(N * n_ab / (n_a * n_b)) with document
    frequencies, snapped to 4 decimals.

    The word-association / topic-graph builder (whole-document windows)
    complementing bigram_pmi's adjacency collocations: high document-level
    PMI with low adjacency PMI is the signature of topical association
    rather than a fixed phrase.

    Scale: the pair space is quadratic in VOCABULARY, not corpus — the
    frequency floor caps the vocab (broadcast semi-join onto the token
    stream), the per-doc membership frame is distinct (term, doc) pairs
    over that capped vocab, and the pair join is keyed on the doc id, so
    fan-out per doc is bounded by (vocab terms present)^2, independent of
    corpus size.  Exactly the tfidf/shingle join discipline with the
    hot-term cap inverted: here the FREQUENT terms are the signal."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    vocab = counts.where(F.col("n") >= min_count).select("term")
    member = (
        toks.join(F.broadcast(vocab), on="term", how="left_semi").distinct()
    )
    dfreq = member.groupBy("term").agg(F.count(F.lit(1)).alias("n_docs_term"))
    n_total = df.agg(F.count(F.lit(1)).alias("n_corpus"))
    a, b = member.alias("a"), member.alias("b")
    pairs = (
        a.join(b, on="id")
        .where(F.col("a.term") < F.col("b.term"))
        .groupBy(
            F.col("a.term").alias("term_a"), F.col("b.term").alias("term_b")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_pair_docs)
    )
    da = dfreq.select(F.col("term").alias("term_a"), F.col("n_docs_term").alias("na"))
    db = dfreq.select(F.col("term").alias("term_b"), F.col("n_docs_term").alias("nb"))
    return (
        pairs.join(F.broadcast(da), "term_a")
        .join(F.broadcast(db), "term_b")
        .crossJoin(F.broadcast(n_total))
        .select(
            "term_a",
            "term_b",
            "n_docs",
            F.round(
                F.log(
                    F.col("n_corpus")
                    * F.col("n_docs")
                    / (F.col("na") * F.col("nb"))
                ).cast("decimal(18,12)"),
                4,
            ).cast("double").alias("pmi"),
        )
    )


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """NFKC-lite Unicode normalization as a pure JVM projection: fold the
    fullwidth ASCII block, Unicode spaces, curly quotes, the dash family
    (one ``translate``), delete zero-width/soft-hyphen invisibles, expand
    ellipsis and fi/fl ligatures, then collapse whitespace runs and trim.
    Adds ``out_col`` (default ``<text_col>_norm``); other columns pass
    through.

    The canonical-form step every dedup/quality pipeline needs FIRST:
    without it, a fullwidth or curly-quoted copy of a document hashes as
    "novel" and sails past exact AND shingle dedup.  The fold table is a
    curated compatibility subset (not the full Unicode NFKC data files —
    no ICU in the hot path), chosen so the mapping is IDEMPOTENT:
    normalize(normalize(x)) == normalize(x), property-tested in
    tests/test_ops.py and replayed character-for-character by the DuckDB
    oracle from these same module constants.

    Scale: one narrow per-row projection — translate + a fixed number of
    regexp_replace calls, all whole-stage-codegen'd; no shuffle, no UDF,
    pipelines inside the scan.  At 100 TB this is scan-bound, exactly
    like clean_text."""
    out = out_col or f"{text_col}_norm"
    t = F.coalesce(F.col(text_col), F.lit(""))
    t = F.regexp_replace(t, _NFKC_DELETE_RE, "")
    t = F.translate(t, _NFKC_FROM, _NFKC_TO)
    for src, repl in _NFKC_EXPAND:
        t = F.regexp_replace(t, src, repl)
    t = F.trim(F.regexp_replace(t, _NFKC_WS_RUN_RE, " "))
    return df.withColumn(out, t)


def tokenizer_fertility(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group tokenizer cost profile: ``(group, n_docs, n_bytes,
    n_chars, n_ws_tokens, n_bpe_tokens, bytes_per_token, chars_per_token,
    fertility)`` where the BPE proxy charges ``ceil(len(word)/4)``
    subword units per whitespace word (BPE_CHARS_PER_TOKEN) and fertility
    = bpe_tokens / ws_tokens — the "how many subwords does a word cost
    here" mixture signal.

    The budgeting primitive for token-denominated corpus planning: two
    sources with equal byte counts can differ 2x in trained-token cost
    (CJK, URLs, code), and this surfaces that BEFORE a tokenizer pass.
    bytes_per_token rising across snapshots of the same source is the
    cheapest early warning of encoding junk.

    Scale: token counts are computed ROW-LOCALLY over the split array
    (size/aggregate higher-order functions — no explode, so no
    (doc x token)-sized intermediate), then one hash aggregate to group
    granularity: the shuffle carries |groups| partial rows, map-side
    combined.  All JVM built-ins, no UDF."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(t, " "), lambda w: F.length(w) > 0)
    bpe = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.ceil(F.length(w) / F.lit(float(BPE_CHARS_PER_TOKEN))),
    )
    snapped = lambda c: F.round(c.cast("decimal(18,12)"), 6).cast("double")
    return (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.octet_length(t)).alias("n_bytes"),
            F.sum(F.length(t)).alias("n_chars"),
            F.sum(F.size(words)).cast("long").alias("n_ws_tokens"),
            F.sum(bpe).alias("n_bpe_tokens"),
        )
        .select(
            "grp",
            "n_docs",
            "n_bytes",
            "n_chars",
            "n_ws_tokens",
            "n_bpe_tokens",
            snapped(F.try_divide(F.col("n_bytes"), F.col("n_bpe_tokens"))).alias(
                "bytes_per_token"
            ),
            snapped(F.try_divide(F.col("n_chars"), F.col("n_bpe_tokens"))).alias(
                "chars_per_token"
            ),
            snapped(
                F.try_divide(F.col("n_bpe_tokens"), F.col("n_ws_tokens"))
            ).alias("fertility"),
        )
    )


# Public-suffix data the registered-domain heuristic recognizes — a
# curated ICANN + common-private-section subset standing in for the full
# Public Suffix List (~9.5k entries; no external data files in the
# sandbox).  Production callers ingest the real PSL via the `suffixes=`
# parameter of canonicalize_urls.  Shared verbatim with the DuckDB
# oracle, which is generated from these same constants.
#
# Two-label public suffixes: the major ccTLD second-level registries
# (getting these wrong merges unrelated registrants into one
# domain-cap/mixing bucket at crawl scale — round-8 verdict) plus the
# highest-traffic PSL private-section hosts (github.io etc., where each
# subdomain is an independent site).
_CC_SECOND_LEVEL: dict[str, tuple[str, ...]] = {
    "uk": ("ac", "co", "gov", "ltd", "me", "net", "nhs", "org", "plc",
           "police", "sch"),
    "au": ("asn", "com", "edu", "gov", "id", "net", "org"),
    "br": ("art", "com", "edu", "gov", "mil", "net", "org"),
    "cn": ("ac", "com", "edu", "gov", "mil", "net", "org"),
    "jp": ("ac", "ad", "co", "ed", "go", "gr", "lg", "ne", "or"),
    "kr": ("ac", "co", "es", "go", "hs", "kg", "mil", "ms", "ne", "or",
           "pe", "re", "sc"),
    "in": ("ac", "co", "edu", "firm", "gen", "gov", "ind", "mil", "net",
           "nic", "org", "res"),
    "mx": ("com", "edu", "gob", "net", "org"),
    "nz": ("ac", "co", "geek", "gen", "govt", "health", "iwi", "maori",
           "mil", "net", "org", "parliament", "school"),
    "za": ("ac", "co", "edu", "gov", "law", "mil", "net", "nom", "org",
           "school", "web"),
    "tw": ("com", "edu", "gov", "idv", "mil", "net", "org"),
    "hk": ("com", "edu", "gov", "idv", "net", "org"),
    "sg": ("com", "edu", "gov", "net", "org", "per"),
    "tr": ("av", "bbs", "biz", "com", "dr", "edu", "gen", "gov", "info",
           "k12", "mil", "name", "net", "org", "tv", "web"),
    "ar": ("com", "edu", "gob", "gov", "int", "mil", "net", "org", "tur"),
    "co": ("com", "edu", "firm", "gov", "info", "int", "mil", "net",
           "nom", "org", "rec", "web"),
    "id": ("ac", "biz", "co", "desa", "go", "mil", "my", "net", "or",
           "sch", "web"),
    "il": ("ac", "co", "gov", "idf", "k12", "muni", "net", "org"),
    "th": ("ac", "co", "go", "in", "mi", "net", "or"),
    "ua": ("com", "edu", "gov", "in", "net", "org"),
    "vn": ("ac", "biz", "com", "edu", "gov", "health", "info", "int",
           "name", "net", "org", "pro"),
    "my": ("com", "edu", "gov", "mil", "name", "net", "org"),
    "ph": ("com", "edu", "gov", "i", "mil", "net", "ngo", "org"),
    "pk": ("biz", "com", "edu", "gov", "net", "org", "web"),
    "eg": ("com", "edu", "eun", "gov", "mil", "name", "net", "org", "sci"),
    "sa": ("com", "edu", "gov", "med", "net", "org", "pub", "sch"),
    "ae": ("ac", "co", "gov", "mil", "net", "org", "sch"),
    "ng": ("com", "edu", "gov", "i", "mil", "mobi", "name", "net", "org",
           "sch"),
    "ke": ("ac", "co", "go", "info", "me", "mobi", "ne", "or", "sc"),
    "pl": ("biz", "com", "edu", "gov", "info", "mil", "net", "org",
           "waw"),
    "gr": ("com", "edu", "gov", "net", "org"),
    "pt": ("com", "edu", "gov", "int", "net", "nome", "org", "publ"),
    "es": ("com", "edu", "gob", "nom", "org"),
    "fr": ("asso", "com", "gouv", "nom", "tm"),
    "pe": ("com", "edu", "gob", "mil", "net", "nom", "org"),
    "ve": ("co", "com", "edu", "gob", "info", "mil", "net", "org", "web"),
    "uy": ("com", "edu", "gub", "mil", "net", "org"),
    "ec": ("com", "edu", "fin", "gob", "gov", "info", "k12", "med",
           "mil", "net", "org", "pro"),
    "bd": ("ac", "com", "edu", "gov", "mil", "net", "org"),
    "lk": ("ac", "com", "edu", "gov", "int", "net", "org", "sch", "web"),
    "ca": ("ab", "bc", "gc", "mb", "nb", "nf", "nl", "ns", "nt", "nu",
           "on", "pe", "qc", "sk", "yk"),
    "cl": ("gob", "gov", "mil"),
    "ru": ("com", "gov", "mil"),
}
# every US state/territory code is itself a public suffix (<xx>.us)
_US_STATES: tuple[str, ...] = (
    "al", "ak", "az", "ar", "ca", "co", "ct", "de", "dc", "fl", "ga",
    "hi", "id", "il", "in", "ia", "ks", "ky", "la", "me", "md", "ma",
    "mi", "mn", "ms", "mo", "mt", "ne", "nv", "nh", "nj", "nm", "ny",
    "nc", "nd", "oh", "ok", "or", "pa", "pr", "ri", "sc", "sd", "tn",
    "tx", "ut", "vt", "va", "wa", "wi", "wv", "wy",
)
# PSL private-section hosts where every subdomain is an independent site
# (folding foo.github.io and bar.github.io into "github.io" merges
# unrelated sites into one cap bucket — the round-8 verdict's example)
_PRIVATE_TWO_LEVEL: tuple[str, ...] = (
    "appspot.com", "blogspot.com", "firebaseapp.com", "github.io",
    "githubusercontent.com", "gitlab.io", "herokuapp.com", "netlify.app",
    "pages.dev", "readthedocs.io", "vercel.app", "web.app",
    "wordpress.com",
)
TWO_LEVEL_SUFFIXES: tuple[str, ...] = tuple(sorted(
    {f"{sld}.{cc}" for cc, slds in _CC_SECOND_LEVEL.items() for sld in slds}
    | {f"{st}.us" for st in _US_STATES}
    | set(_PRIVATE_TWO_LEVEL)
))
# three-label ICANN public suffixes: the US state k12/cc/lib registries
THREE_LEVEL_SUFFIXES: tuple[str, ...] = tuple(sorted(
    f"{p}.{st}.us" for st in _US_STATES for p in ("k12", "cc", "lib")
))


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    suffixes: "tuple[str, ...] | list[str] | None" = None,
) -> DataFrame:
    """URL canonicalization + registered-domain extraction, pure JVM
    string ops: adds ``host`` (lowercased, www- and port-stripped),
    ``registered_domain`` (eTLD+1 under the public-suffix data), and
    ``url_canon`` (host + trailing-slash-stripped path +
    alphabetically-sorted query with utm_* tracking params dropped;
    scheme and fragment removed).  Other columns pass through.

    ``suffixes`` is the public-suffix list to match against — any mix of
    two- and three-label suffix strings (split by label count
    internally); default is the module's curated ICANN+private subset
    (TWO_LEVEL_SUFFIXES + THREE_LEVEL_SUFFIXES).  Production callers
    inject PSL-derived rules here; comment/blank lines are ignored and
    single-label rules fold into the generic fallback, but wildcard
    (``*.ck``), exception (``!www.ck``), and 4+-label rules RAISE —
    this matcher honors plain two- and three-label rules only, and
    silently dropping a rule would mis-bucket every host it governs.
    Longer suffixes win: ``school.k12.ca.us`` rolls up under
    ``k12.ca.us``, not ``ca.us``.

    The crawl-dedup prerequisite: the same page arrives as http/https,
    with and without www., with utm_ tracking junk, and with params in
    feed-dependent order — url_canon folds all of those to one key, and
    registered_domain is the rollup level where per-site caps
    (domain_cap_docs) and source mixing actually operate.

    Semantics pinned for the oracle: host matching is case-insensitive
    (lowered before www/port strip), the PATH keeps its case (paths are
    case-sensitive), empty query segments vanish, and a host with fewer
    labels than the suffix rule needs is its own registered domain.

    Scale: a fixed chain of regexp/split/array built-ins per row — no
    UDF, no shuffle, whole-stage codegen'd; pipelines inside the scan
    like clean_text/normalize_text."""
    u = F.trim(F.coalesce(F.col(url_col), F.lit("")))
    u = F.regexp_replace(u, r"#.*$", "")          # fragment
    u = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")  # scheme
    hostport = F.regexp_extract(u, r"^([^/?]+)", 1)
    rest = F.substring(u, F.length(hostport) + 1, F.lit(2_147_483_647))
    host = F.regexp_replace(
        F.regexp_replace(F.lower(hostport), r":[0-9]+$", ""), r"^www\.", ""
    )
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_replace(rest, r"^[^?]*\??", "")
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (F.length(p) > 0) & ~p.startswith("utm_"),
            )
        ),
        "&",
    )
    if suffixes is None:
        two_level: tuple[str, ...] = TWO_LEVEL_SUFFIXES
        three_level: tuple[str, ...] = THREE_LEVEL_SUFFIXES
    else:
        # comment/blank lines (raw PSL files carry them) are dropped;
        # 1-label rules are implicit in the generic n >= 2 fallback;
        # anything this matcher cannot honor (wildcard '*.', exception
        # '!', 4+-label rules) FAILS instead of silently mis-bucketing
        # every host it governs — the round-8 domain-cap hazard again
        rules = [
            s.strip().lower()
            for s in suffixes
            if s.strip() and not s.strip().startswith("//")
        ]
        unsupported = [
            s
            for s in rules
            if s.startswith(("*", "!")) or s.count(".") > 2
        ]
        if unsupported:
            raise ValueError(
                "canonicalize_urls: unsupported public-suffix rules "
                f"{unsupported[:5]}{'...' if len(unsupported) > 5 else ''} — "
                "this matcher honors plain two- and three-label rules only "
                "(wildcard/exception/deeper PSL rules need a dedicated "
                "matcher); filter them out explicitly if folding them into "
                "the generic fallback is acceptable"
            )
        two_level = tuple(s for s in rules if s.count(".") == 1)
        three_level = tuple(s for s in rules if s.count(".") == 2)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # try_element_at, not element_at: codegen subexpression hoisting can
    # evaluate a CASE branch's suffix expression on rows whose label count
    # the branch condition excludes, and ANSI element_at would throw there;
    # try_element_at yields NULL like DuckDB's labels[-k], and every use is
    # guarded by an n >= k condition anyway
    take = lambda k: F.concat_ws(
        ".", *[F.try_element_at(labels, F.lit(-i)) for i in range(k, 0, -1)]
    )
    suffix2 = take(2)
    suffix3 = take(3)
    reg = F.when(n >= 2, suffix2).otherwise(host)
    if two_level:
        reg = F.when((n >= 3) & suffix2.isin(*two_level), take(3)).otherwise(reg)
    if three_level:
        # longest suffix wins: the 3-label check overrides the 2-label one
        reg = F.when((n >= 4) & suffix3.isin(*three_level), take(4)).otherwise(
            reg
        )
    canon = F.concat(
        host,
        path,
        F.when(F.length(params) > 0, F.concat(F.lit("?"), params)).otherwise(
            F.lit("")
        ),
    )
    return (
        df.withColumn("host", host)
        .withColumn("registered_domain", reg)
        .withColumn("url_canon", canon)
    )


def zipf_slope(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Per-group Zipf rank-frequency fit: OLS slope of ln(freq) on
    ln(rank) over each group's ``top_n`` most frequent terms —
    ``(grp, n_terms, zipf_slope)`` with the slope snapped to 4 decimals
    (ln involved).  Natural text sits near -1; template/synthetic spam
    flattens toward 0 (every line reuses the same tokens at similar
    frequencies) and mode-collapsed generators overshoot steeper than
    -1.5 — a vocabulary-health sentinel that complements token_entropy
    (entropy says diversity dropped; the slope says the SHAPE of the
    drop).

    Dataflow: one wordcount-shaped shuffle to (group, term) counts, a
    rank window over each group's VOCABULARY-sized frame (the same
    frame token_entropy already materializes — never row data), a
    top_n filter, then the closed-form OLS over the <= top_n-row frame:
    slope = (n*sum(xy) - sum(x)sum(y)) / (n*sum(x^2) - sum(x)^2).
    Ranks tie-break (count desc, term asc) so both engines rank
    identically."""
    toks = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias(
            "term"
        ),
    ).where(F.length("term") > 0)
    counts = toks.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("c"))
    ranked = counts.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("grp").orderBy(F.col("c").desc(), F.col("term"))
        ),
    ).where(F.col("r") <= top_n)
    xy = ranked.select(
        "grp",
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    snapped = lambda c: F.round(c.cast("decimal(18,10)"), 4).cast("double")
    n = F.count(F.lit(1)).cast("double")
    return xy.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_terms"),
        snapped(
            F.try_divide(
                n * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"),
                n * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x"),
            )
        ).alias("zipf_slope"),
    )


def lang_confusion(
    df: DataFrame,
    truth_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Labeled-vs-predicted language confusion matrix: run the
    :func:`language_id` heuristic inline against a ground-truth label
    column and report ``(lang_true, lang_pred, n, row_frac)`` — the
    per-truth-row share snapped to 6 decimals.  The eval-governance view
    of the classifier every routing/filter decision depends on: a
    falling diagonal share for one language is the first sign the
    heuristic (or the corpus) drifted, long before downstream mixture
    weights move.

    The prediction is computed IN THE SAME PROJECTION as the truth
    column — no self-join of corpus against predictions, which a naive
    label-vs-model comparison would do.  One scan, one |langs|^2-row
    hash aggregate, and the row-share window runs over that aggregate
    frame."""
    pred, _ = _lang_pred(text_col)
    counts = (
        df.select(F.col(truth_col).alias("lang_true"), pred.alias("lang_pred"))
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    snapped = lambda c: F.round(c.cast("decimal(18,12)"), 6).cast("double")
    row_total = F.sum("n").over(Window.partitionBy("lang_true"))
    return counts.select(
        "lang_true",
        "lang_pred",
        "n",
        snapped(F.col("n") / row_total).alias("row_frac"),
    )


def pii_density(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group PII exposure rollup over the :func:`redact_pii` regexes
    (EMAIL_RE / PHONE_RE): ``(grp, n_docs, n_docs_with_pii, n_emails,
    n_phones, pii_per_kchar)`` — match counts, the count of documents
    carrying ANY match, and matches per 1,000 characters snapped to 6
    decimals.

    The governance dial that decides where redaction effort goes:
    per-document redact_pii tells you WHAT to scrub, this tells you WHICH
    SOURCES leak — a crawl slice whose pii_per_kchar ticks up across
    snapshots is the first signal a new site template started exposing
    contact data, long before any per-doc review.

    Scale: the two regexp_count calls are per-row JVM projections
    pipelined inside the scan (same profile as redact_pii — no Python,
    no pre-shuffle); the only exchange is the |groups|-row hash
    aggregate, map-side combined.  Output and state are O(sources)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    ne = F.regexp_count(t, F.lit(EMAIL_RE))
    np_ = F.regexp_count(t, F.lit(PHONE_RE))
    snapped = lambda c: F.round(c.cast("decimal(18,12)"), 6).cast("double")
    return (
        df.select(
            F.col(group_col).alias("grp"),
            ne.alias("__e"),
            np_.alias("__p"),
            F.length(t).alias("__c"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(((F.col("__e") + F.col("__p")) > 0).cast("long")).alias(
                "n_docs_with_pii"
            ),
            F.sum("__e").cast("long").alias("n_emails"),
            F.sum("__p").cast("long").alias("n_phones"),
            snapped(
                F.lit(1000.0)
                * (F.sum("__e") + F.sum("__p"))
                / F.sum("__c")
            ).alias("pii_per_kchar"),
        )
    )


def redaction_audit(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end redaction effectiveness: apply :func:`redact_pii`'s
    exact replacement chain, then re-run :func:`pii_density`'s match
    counting ON THE REDACTED TEXT — ``(grp, n_docs, n_matches_before,
    n_matches_after, all_clean, residual_per_kchar)`` per group.  The
    governance closing-of-the-loop: pii_density says which sources leak,
    redact_pii scrubs, and this proves the two compose — a regex drift
    between the detector and the scrubber (or a replacement that itself
    re-matches, e.g. a phone pattern absorbing digits around a
    placeholder) shows up as ``n_matches_after > 0`` on a source that
    should read clean.

    Scale: one pass — the redacted text is a per-row JVM regexp
    projection pipelined inside the scan, both match counts run on the
    same row, and the only exchange is the |groups|-row aggregate."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    red = _redact_expr(t)
    before = F.regexp_count(t, F.lit(EMAIL_RE)) + F.regexp_count(
        t, F.lit(PHONE_RE)
    )
    after = F.regexp_count(red, F.lit(EMAIL_RE)) + F.regexp_count(
        red, F.lit(PHONE_RE)
    )
    snapped = lambda c: F.round(c.cast("decimal(18,12)"), 6).cast("double")
    return (
        df.select(
            F.col(group_col).alias("grp"),
            before.alias("__b"),
            after.alias("__a"),
            F.length(red).alias("__c"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__b").cast("long").alias("n_matches_before"),
            F.sum("__a").cast("long").alias("n_matches_after"),
            (F.sum("__a") == 0).alias("all_clean"),
            snapped(F.lit(1000.0) * F.sum("__a") / F.sum("__c")).alias(
                "residual_per_kchar"
            ),
        )
    )


def lm_kl_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group corpus-shape drift: KL(source || corpus) between add-one
    smoothed unigram language models, over the full corpus vocabulary —
    ``(grp, n_tokens, vocab_seen, kl_nats)`` with the divergence snapped
    to 4 decimals (ln involved).  With ``p_s(w) = (c_s(w)+1)/(N_s+V)``
    and ``p_c(w) = (c(w)+1)/(N+V)``, a source whose KL ticks up between
    snapshots changed its token DISTRIBUTION even if its volume and
    entropy held still — the mixture-drift sentinel the DSIR importance
    weights build on, per snapshot instead of per document.

    The naive sum runs over |sources| x |vocab| pairs (every source must
    account for vocabulary it never uses).  This implementation needs no
    such expansion: splitting the sum into seen and unseen terms makes
    the unseen part a CLOSED FORM of per-source scalars —

        KL = [A - B*ln(D) - C + B*ln(N+V)] / D                  (seen)
           + [-(V - V_s)*ln(D) - (S_all - S_seen)] / D          (unseen)

    with A = sum (c_s+1)ln(c_s+1), B = N_s+V_s, C = sum (c_s+1)ln(c+1),
    E = sum ln(c+1) over SEEN words only, D = N_s+V,
    S_seen = E - V_s*ln(N+V), S_all = L - V*ln(N+V), and (N, V, L) one
    broadcast corpus scalar row (L = sum ln(c+1) over the vocabulary).

    Scale: one (group, term) wordcount shuffle; corpus term counts derive
    from it by a second vocabulary-sized aggregate (no second corpus
    scan); the join is vocabulary-sized on term; the scalar frame is one
    broadcast row.  Nothing downstream of the first aggregate ever
    touches corpus-sized data."""
    tok = df.select(
        F.col(group_col).alias("grp"),
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), " ")).alias(
            "w"
        ),
    ).where(F.length("w") > 0)
    # persisted: the (group, term) frame feeds the per-source branch AND
    # derives the corpus counts — without the cache Catalyst would re-run
    # the corpus token scan once per consumer (3 scans of 100 TB)
    sc = _persist(tok.groupBy("grp", "w").agg(F.count(F.lit(1)).alias("cs")))
    cc = sc.groupBy("w").agg(F.sum("cs").alias("c"))
    scalars = cc.agg(
        F.sum("c").cast("double").alias("n_corpus"),
        F.count(F.lit(1)).cast("double").alias("v"),
        F.sum(F.log(F.col("c") + 1)).alias("l_corpus"),
    )
    joined = sc.join(cc, "w")
    per_src = joined.groupBy("grp").agg(
        F.sum("cs").cast("double").alias("ns"),
        F.count(F.lit(1)).cast("double").alias("vs"),
        F.sum((F.col("cs") + 1) * F.log(F.col("cs") + 1)).alias("a"),
        F.sum((F.col("cs") + 1) * F.log(F.col("c") + 1)).alias("cterm"),
        F.sum(F.log(F.col("c") + 1)).alias("e"),
    )
    out = per_src.crossJoin(F.broadcast(scalars))
    d = F.col("ns") + F.col("v")
    b = F.col("ns") + F.col("vs")
    ln_nv = F.log(F.col("n_corpus") + F.col("v"))
    seen = (
        F.col("a") - b * F.log(d) - F.col("cterm") + b * ln_nv
    ) / d
    s_seen = F.col("e") - F.col("vs") * ln_nv
    s_all = F.col("l_corpus") - F.col("v") * ln_nv
    unseen = (
        -(F.col("v") - F.col("vs")) * F.log(d) - (s_all - s_seen)
    ) / d
    return out.select(
        "grp",
        F.col("ns").cast("long").alias("n_tokens"),
        F.col("vs").cast("long").alias("vocab_seen"),
        F.round((seen + unseen).cast("decimal(18,10)"), 4)
        .cast("double")
        .alias("kl_nats"),
    )


def lm_kl_between(
    df_a: DataFrame,
    df_b: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group KL divergence BETWEEN two corpus snapshots — the drift
    companion of :func:`lm_kl_divergence` (that one scores a source
    against the whole corpus; this one scores snapshot A of each source
    against snapshot B of the same source): ``(grp, n_tokens_a,
    n_tokens_b, vocab_union, kl_nats)``, KL(A||B) between add-one
    smoothed unigram models over the source's UNION vocabulary, snapped
    to 4 decimals.

    The re-crawl acceptance test: a source whose week-over-week KL jumps
    changed its content distribution (template swap, spam influx,
    language shift) even when volume and dedup rates look flat.

    With smoothing over the union vocab both distributions sum to
    exactly 1 on the union frame (sum (c+1)/(N+V) = (N+V)/(N+V)), so —
    unlike the source-vs-corpus variant — NO unseen-term closed form is
    needed: the (group, term) full-outer count frame already carries
    every union word, and KL is one aggregate over it.

    Scale: one wordcount shuffle per snapshot, a vocabulary-sized
    full-outer join on (group, term), a |groups|-row scalar aggregate
    joined back (broadcast-sized), one final |groups|-row aggregate.
    Nothing after the wordcounts touches corpus-sized data."""

    def wc(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(
                F.col(group_col).alias("grp"),
                F.explode(
                    F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
                ).alias("w"),
            )
            .where(F.length("w") > 0)
            .groupBy("grp", "w")
            .agg(F.count(F.lit(1)).alias(out))
        )

    both = (
        wc(df_a, "ca")
        .join(wc(df_b, "cb"), ["grp", "w"], "full_outer")
        .select(
            "grp",
            F.coalesce("ca", F.lit(0)).alias("ca"),
            F.coalesce("cb", F.lit(0)).alias("cb"),
        )
    )
    scalars = both.groupBy("grp").agg(
        F.sum("ca").cast("double").alias("na"),
        F.sum("cb").cast("double").alias("nb"),
        F.count(F.lit(1)).cast("double").alias("v"),
    )
    j = both.join(F.broadcast(scalars), "grp")
    pa = (F.col("ca") + 1) / (F.col("na") + F.col("v"))
    pb = (F.col("cb") + 1) / (F.col("nb") + F.col("v"))
    return j.groupBy("grp").agg(
        F.max("na").cast("long").alias("n_tokens_a"),
        F.max("nb").cast("long").alias("n_tokens_b"),
        F.count(F.lit(1)).alias("vocab_union"),
        F.round(
            F.sum(pa * (F.log(pa) - F.log(pb))).cast("decimal(18,10)"), 4
        )
        .cast("double")
        .alias("kl_nats"),
    )
