"""DB statistics wide report — per-study stat pivot.

Spark re-expression of workflows/db_stats.py:122-312: several
independent per-study count pulls (node counts, library-strategy file
counts, study-level file counts) are stacked into one long frame
``(study_id, column_name, count)``, guarded for duplicate
``(study_id, column_name)`` pairs (:251-254), then pivoted wide with a
*fixed* column list and zero-filled, left-joined onto the full study
dimension so studies with no data still appear (:276-312).

Scale notes: each stat is a partial-aggregated ``groupBy`` over its
fact table; the pivot uses an explicit ``values=`` list so Spark skips
the extra distinct-values pass, and the pivoted frame is
study-dimension-sized — broadcast territory no matter how big the
facts are.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stack_stats(stats: dict[str, DataFrame]) -> DataFrame:
    """Union per-stat ``(study_id, n)`` frames into long form.

    ``stats`` maps column_name → a frame with ``study_id`` and ``n``.
    """
    parts = [
        df.select(
            F.col("study_id"),
            F.lit(name).alias("column_name"),
            F.col("n").cast("long").alias("count"),
        )
        for name, df in stats.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def duplicate_stat_guard(long_stats: DataFrame) -> DataFrame:
    """(study_id, column_name) pairs seen more than once (:251-254)."""
    return (
        long_stats.groupBy("study_id", "column_name")
        .count()
        .filter(F.col("count") > 1)
    )


def db_stats_wide(
    studies: DataFrame,
    stats: dict[str, DataFrame],
    column_order: Sequence[str] | None = None,
) -> DataFrame:
    """Long→wide stat report over the full study dimension (:276-312).

    ``studies`` is the study dimension (``study_id`` + descriptive
    cols); absent stats are zero-filled, mirroring the reference's
    left merge of the extra studies frame.
    """
    cols = list(column_order) if column_order is not None else sorted(stats)
    long_stats = stack_stats(stats)
    wide = (
        long_stats.groupBy("study_id")
        .pivot("column_name", cols)
        .agg(F.first("count"))
    )
    out = studies.join(wide, "study_id", "left")
    return out.fillna(0, subset=cols)
