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


def distributed_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[Column | str],
    n_partitions: int = 32,
    out_col: str = "cum_sum",
) -> DataFrame:
    """Global running sum without a single-partition window.

    ``Window.orderBy(...)`` with no partition key funnels every row
    through ONE task — fine on an already-reduced frame (days,
    categories), fatal on 100M+ rows.  The classic two-pass fix:

    1. range-partition by the global order (``repartitionByRange``
       assigns contiguous, sorted key ranges to partitions 0..n-1);
    2. per-partition local prefix sums (parallel windows);
    3. per-partition totals — n rows — get their own tiny prefix
       window, and each partition's preceding-total offset is
       broadcast back and added to the local sums.

    The order must be TOTAL (include a tie-break key), or rows that
    compare equal may land on either side of a partition boundary
    with either offset.  For bit-stable results across partition
    counts use an exact type (decimal/long) for ``value_col``;
    float addition is order-sensitive by nature.
    """
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    # localCheckpoint pins the (sampled, nondeterministic) range
    # boundaries and partition ids ONCE: both consumers below — the
    # row branch and the offsets branch — must see the same physical
    # partitioning, and relying on exchange reuse for that is fragile
    # (spark.sql.exchange.reuse=false, or any rule that clones the
    # subtree, would let the two branches resample different bounds).
    d = (
        df.repartitionByRange(n_partitions, *order_cols)
        .withColumn("__pid__", F.spark_partition_id())
        .localCheckpoint()
    )
    local_w = (
        Window.partitionBy("__pid__")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("__local__", F.sum(value_col).over(local_w))
    offsets_w = Window.orderBy("__pid__").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        d.groupBy("__pid__")
        .agg(F.sum(value_col).alias("__ptotal__"))
        .withColumn(
            "__offset__",
            F.coalesce(F.sum("__ptotal__").over(offsets_w), F.lit(0)),
        )
        .select("__pid__", "__offset__")
    )
    return (
        d.join(F.broadcast(offsets), "__pid__")
        .withColumn(out_col, F.col("__local__") + F.col("__offset__"))
        .drop("__pid__", "__local__", "__offset__")
    )


def distributed_ntile(
    df: DataFrame,
    n_tiles: int,
    order_by: Sequence[Column | str],
    out_col: str,
    n_partitions: int = 32,
) -> DataFrame:
    """Global ``NTILE(n)`` without a single-partition window.

    ``F.ntile(n).over(Window.orderBy(...))`` funnels the entire frame
    through ONE task.  This twin derives the exact same bucket ids
    from a distributed global row_number (:func:`distributed_prefix_sum`
    over a constant 1) plus SQL's NTILE remainder rule: with N rows,
    the first ``N % n`` buckets get ``N // n + 1`` rows, the rest get
    ``N // n``.  The order must be TOTAL (include a unique tie-break
    key) so the row_number — and therefore the tile — is deterministic.

    The only partitionless window left is the n_partitions-row offsets
    frame inside the prefix sum (the ``orders_abc_pareto_scaled``
    shape), so the plan scales with data volume.
    """
    ranked = distributed_prefix_sum(
        df.withColumn("__one__", F.lit(1).cast("long")),
        "__one__",
        order_by,
        n_partitions=n_partitions,
        out_col="__rn__",
    ).drop("__one__")
    total = ranked.agg(F.max("__rn__").alias("__n__"))
    r, n = F.col("__rn__"), F.col("__n__")
    q = F.floor(n / n_tiles)
    rem = n % n_tiles
    cutoff = rem * (q + 1)
    tile = (
        F.when(r <= cutoff, F.floor((r - 1) / (q + 1)) + 1)
        .otherwise(rem + F.floor((r - cutoff - 1) / q) + 1)
        .cast("int")
    )
    return (
        ranked.join(F.broadcast(total))
        .withColumn(out_col, tile)
        .drop("__rn__", "__n__")
    )
