"""Model-based document scoring: the Arrow batch-inference plumbing a
training-data pipeline uses to run a quality classifier over a corpus.

Production pipelines filter pretraining data with learned classifiers
(fastText-style quality models, toxicity scorers, educational-value
models).  The model itself is environment-specific; the *pipeline shape*
is universal and is what this module implements for real:

1. Featurize JVM-side — cheap per-document signals (length, token count,
   stopword ratio, alpha ratio) computed with built-in expressions inside
   whole-stage codegen, never in Python.
2. Score in Arrow batches — a ``mapInPandas`` stage receives the feature
   columns as pandas series (thousands of rows per batch, one Python
   round-trip per BATCH not per row) and applies the model vectorized
   with numpy.  The shipped model is a deterministic logistic layer
   (``sigmoid(w . x + b)``) standing in for any real classifier: swap
   ``_logistic_batch`` for an ONNX/sklearn ``predict_proba`` call and
   nothing else changes.
3. Threshold/keep decisions stay declarative — downstream filters compare
   the score column; Catalyst still prunes and pushes everything around
   the scoring stage.

Because the stand-in model is a closed-form formula, the driver's DuckDB
oracle replays it exactly (same features, same weights, same sigmoid) and
verifies the whole Arrow path value-for-value — the honest way to test
inference plumbing in an environment with no model runtime.

Scale notes (100 TB): scoring is embarrassingly parallel — a single map
stage, no shuffle, no state, no driver round-trips after the broadcast of
the (tiny) weight vector.  Batch size follows
``spark.sql.execution.arrow.maxRecordsPerBatch`` (default 10k); executor
memory per task is one Arrow batch of feature columns, independent of
corpus size.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Stopword list shared with ops.text quality scoring: a small closed set
# keeps the ratio deterministic and cheap (broadcast as a literal array).
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

# Deterministic stand-in weights: (intercept, n_tokens, mean_word_len,
# stopword_ratio, alpha_ratio).  Chosen so scores spread over (0, 1) on
# word-soup corpora; a real deployment loads these from a model artifact.
_WEIGHTS = {
    "bias": -1.0,
    "log_tokens": 0.35,
    "mean_word_len": 0.12,
    "stopword_ratio": 1.8,
    "alpha_ratio": 0.9,
}


def featurize(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """JVM-side feature projection: (id, log_tokens, mean_word_len,
    stopword_ratio, alpha_ratio).  Narrow, shuffle-free, codegen-friendly —
    the features a lightweight quality classifier consumes."""
    words = F.split(F.col(text_col), " ")
    n_tokens = F.greatest(F.size(words), F.lit(1))
    n_stop = F.size(
        F.filter(words, lambda w: F.lower(w).isin(*_STOPWORDS))
    )
    n_alpha = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z]", ""))
    total_chars = F.greatest(F.length(F.col(text_col)), F.lit(1))
    return df.select(
        F.col(id_col),
        F.log(n_tokens.cast("double") + F.lit(1.0)).alias("log_tokens"),
        (
            (total_chars - (n_tokens - 1)).cast("double")
            / n_tokens.cast("double")
        ).alias("mean_word_len"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias(
            "stopword_ratio"
        ),
        (n_alpha.cast("double") / total_chars.cast("double")).alias(
            "alpha_ratio"
        ),
    )


def _logistic_batch(pdf: pd.DataFrame) -> pd.Series:
    """The model: a vectorized logistic layer over the feature frame.
    Swap this for any ``predict_proba``-shaped callable."""
    import numpy as np

    z = (
        _WEIGHTS["bias"]
        + _WEIGHTS["log_tokens"] * pdf["log_tokens"]
        + _WEIGHTS["mean_word_len"] * pdf["mean_word_len"]
        + _WEIGHTS["stopword_ratio"] * pdf["stopword_ratio"]
        + _WEIGHTS["alpha_ratio"] * pdf["alpha_ratio"]
    )
    return 1.0 / (1.0 + np.exp(-z))


def classifier_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Score every document with the quality classifier via Arrow batch
    inference: (id, score) with score rounded to 4 decimals (rounding makes
    the float bit-stable across numpy/SQL replay).

    The ``mapInPandas`` stage is the industry-standard batch-inference
    shape: model state loads once per Python worker (here: nothing to
    load), each Arrow batch is scored vectorized, and only (id, score)
    crosses back — document text never round-trips through Python.
    """
    feats = featurize(df, text_col, id_col)

    def score_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        # model initialization would happen here, once per worker
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "score": _logistic_batch(pdf).round(4),
                }
            )

    return feats.mapInPandas(
        score_batches, schema=f"{id_col} long, score double"
    )
