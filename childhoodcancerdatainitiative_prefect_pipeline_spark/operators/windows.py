"""Window-function pack (SURVEY.md §2.5, W-a..W-d).

The reference implements all of these imperatively (sort + head per
group); here each is one ``pyspark.sql.Window`` spec, which Spark
executes as a single shuffle per partitioning key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order(priority: Sequence[str | Column]) -> list[Column]:
    return [F.col(p) if isinstance(p, str) else p for p in priority]


def top1_per_group(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str | Column]
) -> DataFrame:
    """W-a — keep the best row per group by an explicit ordering.

    Reference: src/s3_ccdi_to_sra.py:1039-1068 (``sort_subset_sra_df``
    keeps the metadata-richest row per library).  Callers encode
    "richness" as order columns, e.g. a non-null count built with
    :func:`non_null_count`.
    """
    w = Window.partitionBy(*keys).orderBy(*_order(order_by))
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def non_null_count(cols: Sequence[str]) -> Column:
    """Richness metric for W-a: number of non-null cells across cols."""
    total = F.lit(0)
    for c in cols:
        total = total + F.col(c).isNotNull().cast("int")
    return total


def first_match_with_fallback(
    df: DataFrame, priority_expr: Column, order_by: Sequence[str | Column]
) -> DataFrame:
    """W-b — first row by a CASE priority, with stable tie-break.

    Reference: src/s3_ccdi_to_sra.py:50-82 (study contact: first PI,
    else first Co-PI, else first row).
    """
    return (
        df.withColumn("__prio__", priority_expr)
        .orderBy(F.col("__prio__").asc(), *_order(order_by))
        .limit(1)
        .drop("__prio__")
    )


def intra_group_constancy(
    df: DataFrame, keys: Sequence[str], check_cols: Sequence[str]
) -> DataFrame:
    """W-c — groups where a supposedly-constant column varies.

    Reference: src/s3_ccdi_to_sra.py:993-1036 (fields differing
    across rows of the same library_ID → warning).  Output: one row
    per (group, column) with the distinct count > 1.
    """
    aggs = [F.countDistinct(c).alias(c) for c in check_cols]
    counted = df.groupBy(*keys).agg(*aggs)
    stacked = counted.unpivot(
        ids=list(keys), values=list(check_cols),
        variableColumnName="column_name", valueColumnName="n_distinct",
    )
    return stacked.filter(F.col("n_distinct") > 1)


def latest_per_group(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """W-d — most-recent row per entity.

    Reference: workflows/mci_gdc_transform.py:31-60 ("filter most
    recent survival status" per participant).  Explicit tie-break
    columns keep the choice deterministic when timestamps collide.
    """
    order = [F.col(ts_col).desc()] + [F.col(c).asc() for c in tie_break]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
