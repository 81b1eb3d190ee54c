"""Schema diff: proposed vs deployed, as a distributed DataFrame plan.

Reference: ``evaluate_table_ddl_diffs`` at
``/root/reference/redshift_auto_schema/RedshiftAutoSchema.py:202-225``:
full outer join of proposed metadata and deployed catalog columns on the
column name, then row-wise classification into
TYPE MISMATCH / MISSING / DEPRECATED, dropping ``notype`` proposals.

Spark-native notes: schema relations are catalog-sized (columns, not rows of
data), so Catalyst will broadcast the join automatically; we still express it
declaratively so the same plan scales if ever run across thousands of tables
at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .types import classify_type_col

REASON_MISSING = "MISSING"
REASON_DEPRECATED = "DEPRECATED"
REASON_TYPE_MISMATCH = "TYPE MISMATCH"


def evaluate_diffs(proposed: DataFrame, deployed: DataFrame) -> DataFrame:
    """Full-outer diff of proposed vs deployed schema.

    Args:
        proposed: DataFrame with columns (field, proposed_type).
        deployed: DataFrame with columns (field, deployed_type).

    Returns DataFrame (field, proposed_type, deployed_type, reason) holding
    only rows with a reason, mirroring RAS.py:217-225:

    * both sides present and 13-class types differ -> TYPE MISMATCH
    * proposed only -> MISSING; deployed only -> DEPRECATED
    * ``notype`` proposals are silently dropped (so an all-null new column
      never produces an ADD COLUMN — reference behavior, RAS.py:153 vs 222)
    """
    p = proposed.select("field", "proposed_type")
    d = deployed.select("field", "deployed_type")
    joined = p.join(d, on="field", how="full_outer")

    pt, dt = F.col("proposed_type"), F.col("deployed_type")
    reason = (
        F.when(pt.isNotNull() & dt.isNull(), F.lit(REASON_MISSING))
        .when(pt.isNull() & dt.isNotNull(), F.lit(REASON_DEPRECATED))
        .when(
            classify_type_col(pt) != classify_type_col(dt),
            F.lit(REASON_TYPE_MISMATCH),
        )
    )

    return (
        joined.withColumn("reason", reason)
        # NaN != 'notype' keeps DEPRECATED rows in pandas; in Spark NULL
        # comparison yields NULL, so keep nulls explicitly.
        .filter(pt.isNull() | (pt != F.lit("notype")))
        .filter(F.col("reason").isNotNull())
        .select("field", "proposed_type", "deployed_type", "reason")
    )


def missing_columns(diff: DataFrame) -> list[tuple[str, str]]:
    """Collect (field, proposed_type) for MISSING rows (RAS.py:188-189).

    The diff relation is catalog-sized; collecting it is a driver-side
    formality, not a data-scale collect.
    """
    rows = (
        diff.filter(F.col("reason") == REASON_MISSING)
        .select("field", "proposed_type")
        .collect()
    )
    return [(r["field"], r["proposed_type"]) for r in rows]
