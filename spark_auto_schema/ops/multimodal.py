"""Multimodal column plumbing: opaque binary payloads + typed metadata,
Arrow-batched feature extraction.

Design for image/audio/video at scale: the payload is an opaque ``binary``
column with a typed metadata struct beside it; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas iterators
(``mapInPandas``) so bytes never round-trip row-at-a-time.

The actual media codecs are NOT available in this environment, so the decode
step is stubbed: :func:`decode_media` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic byte-level "feature" (16-bin
byte histogram + length) is produced.  The Spark-side plumbing — schema,
batch iteration, partition-preserving shape — is real and tested; swapping
the stub for PIL/ffmpeg is a local change inside ``_extract_batch``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_BINS = 16

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_hist", T.ArrayType(T.IntegerType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialize an opaque binary payload + metadata struct from a column.

    (Stand-in for real media ingestion: the testdata has no image bytes, so
    UTF-8 encoded text plays the payload role; schema/partitioning behavior
    is identical.)"""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.lit("text/plain").alias("content_type"),
        ).alias("media_meta"),
    )


def _extract_batch(pdf, fake: bool):
    import pandas as pd

    if not fake:
        raise NotImplementedError(
            "real media decode requires codec libraries not present in this "
            "environment; call with fake=True for the deterministic stub"
        )
    out_ids, out_n, out_hist = [], [], []
    for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
        data = bytes(payload)
        hist = [0] * FEATURE_BINS
        for byte in data:
            hist[byte * FEATURE_BINS // 256] += 1
        out_ids.append(doc_id)
        out_n.append(len(data))
        out_hist.append(hist)
    return pd.DataFrame(
        {"doc_id": out_ids, "n_bytes": out_n, "byte_hist": out_hist}
    )


def extract_media_features(
    df: DataFrame,
    fake: bool = False,
    batch_hint: int | None = None,
    extractor=None,
) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload) rows.

    ``mapInPandas`` keeps the pipeline partition-parallel: each task streams
    Arrow record batches through the extractor — the shape real image /
    audio decoding would use (payload bytes in, fixed-width features out).

    ``extractor`` is the codec seam: a callable ``(pandas_batch, fake) ->
    pandas_batch`` conforming to ``MEDIA_FEATURE_SCHEMA`` that replaces the
    built-in stub — inject a PIL/ffmpeg-backed implementation here without
    touching any Spark plumbing.  The callable is captured by value into
    the task closure (monkeypatching the module attribute would NOT work:
    executors re-import this module and would see the original), so a
    swapped codec ships with the job like any other closure."""
    extract = extractor if extractor is not None else _extract_batch

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield extract(pdf, fake)

    return df.select("doc_id", "payload").mapInPandas(run, MEDIA_FEATURE_SCHEMA)


def frame_sample_stub(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Deterministic stand-in for video frame sampling: slice the payload at
    fixed strides into up to ``max_frames`` "frames" (binary chunks) with
    frame indexes — the explode/repartition shape a real frame sampler has,
    entirely in built-in expressions."""
    idx = F.sequence(
        F.lit(0),
        F.least(
            F.lit(max_frames - 1),
            F.floor(F.length("payload") / every_n_bytes).cast("int"),
        ),
    )
    return (
        df.select("doc_id", "payload", F.explode(idx).alias("frame_idx"))
        .select(
            "doc_id",
            "frame_idx",
            F.substring(
                F.col("payload"), F.col("frame_idx") * every_n_bytes + 1, every_n_bytes
            ).alias("frame_bytes"),
        )
    )


RESIZED_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("new_bytes", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def _resize_batch(pdf, target_bytes: int, fake: bool):
    import pandas as pd

    if not fake:
        raise NotImplementedError(
            "real media resize requires codec libraries not present in this "
            "environment; call with fake=True for the deterministic stub"
        )
    ids, orig, new, res = [], [], [], []
    for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
        data = bytes(payload)
        n = len(data)
        if n == 0:
            m, out = 0, b""
        else:
            m = min(target_bytes, n)
            s = max(n // m, 1)
            out = data[::s][:m]
        ids.append(doc_id)
        orig.append(n)
        new.append(m)
        res.append(out)
    return pd.DataFrame(
        {"doc_id": ids, "orig_bytes": orig, "new_bytes": new, "resized": res}
    )


def resize_media_stub(
    df: DataFrame,
    target_bytes: int = 48,
    fake: bool = False,
    resizer=None,
) -> DataFrame:
    """Arrow-batched media resize over (doc_id, payload) rows — the
    image-thumbnail / audio-downsample slot of the pipeline.

    The deterministic fake is byte-stride decimation to at most
    ``target_bytes`` (keep every ``floor(n / min(target, n))``-th byte —
    the 1-D analog of nearest-neighbor image resampling), so an external
    oracle can replay the gather exactly.  ``resizer`` is the codec seam,
    same contract as :func:`extract_media_features`'s ``extractor``: a
    callable ``(pandas_batch, target_bytes, fake) -> pandas_batch``
    conforming to ``RESIZED_MEDIA_SCHEMA``, captured by value into the
    task closure.  Scale shape: one ``mapInPandas`` map stage, no
    shuffle; output bytes are strictly smaller than input, so the stage
    SHRINKS data — run it before any shuffle-bearing downstream step.
    """
    resize = resizer if resizer is not None else _resize_batch

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield resize(pdf, target_bytes, fake)

    return df.select("doc_id", "payload").mapInPandas(run, RESIZED_MEDIA_SCHEMA)
