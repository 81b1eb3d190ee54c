"""Round-12 operator cohort: token-granular dedup survivorship, the
approx-percentile drift contract, streaming late-data accounting, and the
suggest_nlist-driven SemDeDup composition.

Assembled by __spark_entry__.queries() / oracle_sql() — the single driver
contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import SparkSession

from spark_auto_schema.io import read_table
from spark_auto_schema.ops import dedup
from spark_auto_schema.ops import scoring
from spark_auto_schema.ops import similarity
from spark_auto_schema.ops import text
from spark_auto_schema.registry.analytics import (
    _STREAM_DIRS,
    _STREAM_SEQ,
)
from spark_auto_schema.registry.curation import _semantic_dedup_sql
from spark_auto_schema.registry.extensions import _spread_docs, _spread_embs
from spark_auto_schema.registry.pipeline_r11 import _SNAP6

# ---------------------------------------------------------------------------
# round-12 operators
# ---------------------------------------------------------------------------


# ------------------------------------------------- token survivorship
def _q_token_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-granular dedup mixture accounting (`ops/dedup.py`
    token_survivorship): per source, whitespace-token totals and the
    tokens surviving exact dedup (keep-lowest-id per md5 digest) and
    then n-gram-Jaccard near dedup among the exact survivors
    (keep-lowest-id-per-pair at 0.8) — budgets are set in tokens, so
    this is the number `dedup_loss_by_source`'s doc counts approximate
    with exactly the length skew this removes.  The oracle replays the
    token count, the digest window, the shingle/Jaccard pipeline over
    survivors, and the snapped loss fraction."""
    return dedup.token_survivorship(_spread_docs(spark, sf_dir))


# Shared exact-then-near pipeline CTEs (digest survivorship window +
# survivor-side shingle/Jaccard verified pairs) — the SQL twin of the
# marked/survivors/ngram_jaccard_pairs stages that token_survivorship
# and dedup_provenance both build on.
_EXACT_NEAR_CTE = """
WITH tok AS (
  SELECT doc_id, source, coalesce(text, '') AS t,
         CAST(len(list_filter(string_split(coalesce(text, ''), ' '),
                              w -> len(w) > 0)) AS BIGINT) AS tk,
         md5(coalesce(text, '')) AS dg
  FROM documents
), m AS (
  SELECT *,
         (doc_id = min(doc_id) OVER (PARTITION BY dg)) AS kept,
         (first_value(source) OVER (PARTITION BY dg ORDER BY doc_id)
            != source) AS ext
  FROM tok
), sh AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
  FROM (SELECT doc_id, string_split(t, ' ') AS w FROM m WHERE kept),
       UNNEST(generate_series(1, greatest(len(w) - 2, 1))) AS g(i)
  WHERE length(array_to_string(w[i:i+2], ' ')) > 0
), sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
), jacp AS (
  SELECT id_a, id_b
  FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(round(CAST(c * 1.0 / (sa.sz + sb.sz - c) AS DECIMAL(18,12)), 4)
             AS DOUBLE) >= 0.8
)"""


_TOKEN_SURVIVORSHIP_SQL = f"""{_EXACT_NEAR_CTE}
, nd AS (
  SELECT DISTINCT id_b AS doc_id FROM jacp
)
SELECT m.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(tk) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN kept THEN tk ELSE 0 END) AS BIGINT) AS tokens_kept_exact,
       CAST(sum(CASE WHEN NOT kept AND ext THEN tk ELSE 0 END) AS BIGINT)
         AS tokens_lost_to_other_exact,
       CAST(sum(CASE WHEN kept AND nd.doc_id IS NULL THEN tk ELSE 0 END) AS BIGINT)
         AS tokens_kept_near,
       {_SNAP6("1.0 - sum(CASE WHEN kept AND nd.doc_id IS NULL THEN tk ELSE 0 END) * 1.0 / sum(tk)")}
         AS token_loss_frac
FROM m LEFT JOIN nd ON nd.doc_id = m.doc_id
GROUP BY 1
"""


# ------------------------------------------------- approx drift contract
_SDA_GRID = 11
_SDA_ACCURACY = 1000
_SDA_EPS = 0.05


def _q_score_drift_approx_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-bound contract for the 100 TB percentile swap the drift
    family documents (`ops/scoring.py` quantile_sketch_contract): per
    source, the `approx_percentile` sketch grid of the quality score
    must land inside the exact quantile envelope at probs +/- 0.05 —
    making `score_drift`'s "swap F.percentile for approx_percentile"
    note a driver-checked contract (the `key_suggestions_approx_ok`
    pattern).  GK guarantees rank error <= 1/accuracy = 0.001, 50x
    inside the pinned band, so the booleans are stable; the oracle pins
    them true with exact per-source counts."""
    d = read_table(spark, sf_dir, "documents")
    scored = text.quality_score(d, keep_cols=["source"])
    return scoring.quantile_sketch_contract(
        scored,
        "quality",
        "source",
        grid=_SDA_GRID,
        accuracy=_SDA_ACCURACY,
        eps=_SDA_EPS,
    )


_SCORE_DRIFT_APPROX_SQL = """
-- pins grid_within_bound=true per source: the GK sketch's rank-error
-- guarantee (1/accuracy = 0.001) sits 50x inside the contract band
-- (eps = 0.05), so the verdict is a determinism property of the data,
-- not per-run luck; a red here with no code change means regenerated
-- testdata moved a quantile envelope — check |approx - exact| per grid
-- point before anything else
SELECT source AS grp, CAST(count(*) AS BIGINT) AS n,
       true AS grid_within_bound
FROM documents GROUP BY 1
"""


# ------------------------------------------------- streaming late data
_LATE_FILES = 4
_LATE_STRAGGLER_MOD = 7


def _events_stream_dir_late(sf_dir: str) -> str:
    """Drop-dir with the events table staged as 4 sequential event-id
    blocks (one file per micro-batch under maxFilesPerTrigger=1, distinct
    mtimes pin the batch order) where every 7th event of blocks 0 and 1
    is DELAYED two files — deterministic, SQL-replayable late arrivals
    ~7-15 days behind the watermark."""
    key = f"{sf_dir}#late"
    if key not in _STREAM_DIRS:
        import os
        import tempfile

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="events_stream_late_")
        t = pq.read_table(f"{sf_dir.rstrip('/')}/events.parquet")
        ids = t.column("event_id")
        max_id = pc.max(ids).as_py()
        block_sz = -(-(max_id + 1) // _LATE_FILES)
        block = pc.cast(
            pc.floor(pc.divide(pc.cast(ids, "double"), block_sz)), "int64"
        )
        # arrow compute has no modulo kernel; id % m via floor-div subtract
        mod = pc.subtract(
            ids,
            pc.multiply(
                pc.cast(
                    pc.floor(
                        pc.divide(pc.cast(ids, "double"), _LATE_STRAGGLER_MOD)
                    ),
                    "int64",
                ),
                _LATE_STRAGGLER_MOD,
            ),
        )
        straggler = pc.and_(pc.equal(mod, 0), pc.less(block, 2))
        fk = pc.add(block, pc.if_else(straggler, 2, 0))
        for k in range(_LATE_FILES):
            part = t.filter(pc.equal(fk, k))
            p = os.path.join(d, f"drop{k}.parquet")
            pq.write_table(part, p)
            os.utime(p, (1_000_000 + k * 1000, 1_000_000 + k * 1000))
        _STREAM_DIRS[key] = d
    return _STREAM_DIRS[key]


def _q_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming late-data accounting (`streaming.py` late_data_monitor):
    the events table replayed as 4 one-file micro-batches with every 7th
    event of the first two blocks delayed two batches; per day window,
    rows the watermarked aggregation admitted vs the unwatermarked total
    — the dropped-by-watermark volume the docstrings' watermark contract
    otherwise leaves invisible.  The oracle replays the measured Spark
    4.1.2 rule pinned in the op's docstring: a row in batch k is
    admitted iff k < 2 or its day-window END exceeds max(event ts of
    batches 0..k-2, ms floor) - 1 hour."""
    from spark_auto_schema.streaming import (
        late_data_monitor,
        read_event_stream,
        run_to_memory,
    )

    src = _events_stream_dir_late(sf_dir)
    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    admitted, total = late_data_monitor(
        stream, ts_col="ts", window_duration="1 day", delay="1 hour"
    )
    n1 = f"__late_adm_{next(_STREAM_SEQ)}"
    n2 = f"__late_tot_{next(_STREAM_SEQ)}"
    # the two accounting drains are independent (each a separate streaming
    # query over the same staged files; both sinks are read only after BOTH
    # terminate) — start both, await both (guide §2.6: overlap independent
    # jobs; each drain's 4-micro-batch machinery back-fills the other's)
    q1 = run_to_memory(
        admitted, n1, output_mode="update", state_partitions=2, wait=False
    )
    q2 = run_to_memory(
        total, n2, output_mode="complete", state_partitions=2, wait=False
    )
    q1.awaitTermination()
    q2.awaitTermination()
    adm = (
        spark.table(n1)
        .groupBy("window_start")
        .agg(F.max("n_admitted").alias("n_admitted"))
    )
    return (
        spark.table(n2)
        .join(adm, on="window_start", how="left")
        .select(
            # DATE, not midnight TIMESTAMP: DuckDB's date_trunc('day')
            # returns DATE, and the driver canonicalizes by isoformat —
            # a midnight timestamp would hash-diverge on format alone
            F.col("window_start").cast("date").alias("window_start"),
            "n_events",
            F.coalesce("n_admitted", F.lit(0)).alias("n_admitted"),
            (F.col("n_events") - F.coalesce("n_admitted", F.lit(0))).alias(
                "n_late_dropped"
            ),
        )
    )


_LATE_DATA_AUDIT_SQL = f"""
WITH b AS (
  SELECT CAST(ceil((max(event_id) + 1) * 1.0 / {_LATE_FILES}) AS BIGINT) AS bs
  FROM events
), f AS (
  SELECT ts,
         CAST(floor(event_id * 1.0 / b.bs) AS BIGINT)
         + CASE WHEN event_id % {_LATE_STRAGGLER_MOD} = 0
                 AND CAST(floor(event_id * 1.0 / b.bs) AS BIGINT) < 2
                THEN 2 ELSE 0 END AS fk
  FROM events, b WHERE ts IS NOT NULL
), fm AS (
  SELECT fk, max(make_timestamp(epoch_us(ts) // 1000 * 1000)) AS mx
  FROM f GROUP BY fk
), wm AS (
  -- densified over ALL {_LATE_FILES} block keys (not just keys holding
  -- non-null-ts rows): Spark carries the previous batch's watermark
  -- forward through an empty/all-null micro-batch, so an absent fm row
  -- must inherit the running max (window max skips NULLs), not make the
  -- fk = f.fk - 2 lookup miss and admit the whole batch
  SELECT fks.fk,
         max(fm.mx) OVER (ORDER BY fks.fk ROWS UNBOUNDED PRECEDING)
           - INTERVAL 1 HOUR AS w
  FROM (SELECT CAST(g AS BIGINT) AS fk
        FROM generate_series(0, {_LATE_FILES - 1}) AS t(g)) fks
  LEFT JOIN fm USING (fk)
), adm AS (
  SELECT date_trunc('day', f.ts) AS ws, count(*) AS n_admitted
  FROM f LEFT JOIN wm ON wm.fk = f.fk - 2
  WHERE wm.fk IS NULL OR wm.w IS NULL
     OR date_trunc('day', f.ts) + INTERVAL 1 DAY > wm.w
  GROUP BY 1
), tot AS (
  SELECT date_trunc('day', ts) AS ws, count(*) AS n_events FROM f GROUP BY 1
)
SELECT tot.ws AS window_start,
       CAST(tot.n_events AS BIGINT) AS n_events,
       CAST(coalesce(adm.n_admitted, 0) AS BIGINT) AS n_admitted,
       CAST(tot.n_events - coalesce(adm.n_admitted, 0) AS BIGINT)
         AS n_late_dropped
FROM tot LEFT JOIN adm ON adm.ws = tot.ws
"""


# ------------------------------------------------- suggest_nlist gate
_SDS_TARGET = 63  # ceil(500/63) = 8 at the oracle sf; 32 at sf0.1
_SDS_THRESHOLD = 0.3
_SDS_ORACLE_NLIST = 8


def _q_semantic_dedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup under the deployment scale rule (`ops/similarity.py`
    suggest_nlist -> semantic_dedup): nlist = ceil(n / 63) computed FROM
    THE CORPUS, then the standard cluster-local cosine dedup at 0.3 —
    the composition that holds per-cluster pair work constant as the
    corpus grows (30x slope 0.73 vs 1.112 at a pinned nlist;
    BASELINE.md round-11), driver-checked rather than law-tested only.
    The oracle interpolates the EXPECTED suggested value at the oracle
    scale (ceil(500/63) = 8) into the shared parameterized SemDeDup
    replay, so a drifted count or a broken ceil both hash-fail."""
    embs = _spread_embs(spark, sf_dir)
    nlist = similarity.suggest_nlist(embs, target_cluster_size=_SDS_TARGET)
    return similarity.semantic_dedup(
        embs, threshold=_SDS_THRESHOLD, nlist=nlist
    )


_SEMANTIC_DEDUP_SCALED_SQL = _semantic_dedup_sql(
    _SDS_ORACLE_NLIST, _SDS_THRESHOLD
)


# ------------------------------------------------- dedup provenance
def _q_dedup_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document dedup audit trail (`ops/dedup.py` dedup_provenance):
    for every document, whether the standard exact-then-near pipeline
    kept it, dropped it at the exact stage (winner = the keep-lowest-id
    digest holder) or at the near stage (winner = the smallest-id
    verified Jaccard partner) — the record takedown tracing and dedup
    regression triage read.  The oracle replays the digest window, the
    survivor-side pair pipeline, and the min-partner attribution."""
    return dedup.dedup_provenance(_spread_docs(spark, sf_dir))


_DEDUP_PROVENANCE_SQL = f"""{_EXACT_NEAR_CTE}
, w AS (
  SELECT doc_id, source,
         min(doc_id) OVER (PARTITION BY dg) AS winner
  FROM tok
), nw AS (
  SELECT id_b AS doc_id, min(id_a) AS near_winner FROM jacp GROUP BY 1
)
SELECT w.doc_id, w.source,
       CASE WHEN w.doc_id != w.winner THEN 'exact'
            WHEN nw.doc_id IS NOT NULL THEN 'near'
            ELSE 'kept' END AS stage,
       CASE WHEN w.doc_id != w.winner THEN w.winner
            ELSE nw.near_winner END AS winner_id
FROM w LEFT JOIN nw ON nw.doc_id = w.doc_id
"""


# ------------------------------------------------- post-dedup mixture
# target token shares over the 20 testdata sources: share(src_i) =
# (i+1)/210 — non-uniform, deterministic, sums to exactly 1
_MIX_N_SOURCES = 20
_MIX_DENOM = _MIX_N_SOURCES * (_MIX_N_SOURCES + 1) // 2


def _mix_target_shares() -> dict:
    return {
        f"src{i}": (i + 1) / _MIX_DENOM for i in range(_MIX_N_SOURCES)
    }


def _q_mix_weights_post_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-dedup mixture realization (`ops/corpus.py`
    post_dedup_mix_weights over token_survivorship): the largest corpus
    honoring a fixed target token mixture with sampling rates <= 1,
    computed from SURVIVING tokens — the number a loader must use once
    dedup has bent the per-source token supply.  The binding flag names
    the constraining source.  The oracle replays the survivorship
    pipeline, the (i+1)/210 share ladder, the min(surviving/share)
    budget, and the floor/rate/binding arithmetic."""
    surv = dedup.token_survivorship(_spread_docs(spark, sf_dir))
    from spark_auto_schema.ops import corpus

    return corpus.post_dedup_mix_weights(surv, _mix_target_shares())


_MIX_POST_DEDUP_SQL = f"""{_EXACT_NEAR_CTE}
, nd AS (
  SELECT DISTINCT id_b AS doc_id FROM jacp
), surv AS (
  SELECT m.source,
         CAST(sum(CASE WHEN kept AND nd.doc_id IS NULL THEN tk ELSE 0 END)
              AS BIGINT) AS surviving_tokens
  FROM m LEFT JOIN nd ON nd.doc_id = m.doc_id
  GROUP BY 1
), shr AS (
  SELECT source, surviving_tokens,
         (CAST(substr(source, 4) AS INT) + 1) / {float(_MIX_DENOM)} AS share
  FROM surv
), b AS (
  SELECT min(surviving_tokens / share) AS bb FROM shr WHERE share > 0
)
SELECT source, surviving_tokens,
       {_SNAP6("share")} AS target_share,
       CAST(floor(bb * share) AS BIGINT) AS take_tokens,
       {_SNAP6("CASE WHEN surviving_tokens > 0 THEN floor(bb * share) / surviving_tokens ELSE 0.0 END")} AS rate,
       (share > 0 AND surviving_tokens / share = bb) AS binding
FROM shr, b
"""
