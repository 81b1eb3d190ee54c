"""Large-scale LLM-data-pipeline operators (rebuild extensions).

These have no reference analog (the reference is schema tooling only); they
are the driver-mandated extensions: deduplication, similarity search, text
analysis, multimodal column plumbing.  Everything data-touching stays in
built-in Spark SQL expressions (JVM, whole-stage codegen) except the
explicitly Arrow-batched multimodal UDFs.
"""

from . import (
    analytics,
    corpus,
    dedup,
    multimodal,
    packing,
    relational,
    sampling,
    scoring,
    similarity,
    skew,
    text,
)

__all__ = [
    "analytics",
    "corpus",
    "dedup",
    "multimodal",
    "packing",
    "relational",
    "sampling",
    "scoring",
    "similarity",
    "skew",
    "text",
]
