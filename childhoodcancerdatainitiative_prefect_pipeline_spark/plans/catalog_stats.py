"""Data-catalog statistics — the flagship end-to-end plan.

Mirrors workflows/data_catalog_stats.py:210-345: a battery of
group-counts, two-level distinct counts, binned histograms and sums
over the dataset, emitted as one tidy frame::

    (data_element, value, statistic_type, statistic_value)

Expressed over the driver's synthetic star schema: ``orders`` plays
the participant/sample role, ``lineitem`` the file role.  Every
branch is a declarative aggregate; the final union is metadata-only.
All statistic values are exact (counts, decimal sums) so the output
hash-matches a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_testdata
from ..operators.aggregates import (
    exact_sum,
    group_count,
    two_level_distinct_count,
)

_SCHEMA_COLS = ("data_element", "value", "statistic_type", "statistic_value")


def _tidy(df: DataFrame, element: str, value_col: str, stat_type: str, stat_col: str) -> DataFrame:
    return df.select(
        F.lit(element).alias("data_element"),
        F.col(value_col).cast("string").alias("value"),
        F.lit(stat_type).alias("statistic_type"),
        F.col(stat_col).cast("double").alias("statistic_value"),
    )


def catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the full catalog-stats frame over the synthetic tables."""
    cat = load_testdata(
        spark, sf_dir, tables=("orders", "lineitem", "customer"), register_views=False
    )
    orders, lineitem, customer = cat["orders"], cat["lineitem"], cat["customer"]

    # A1 + A8 over orders in ONE scan: the status/priority group
    # counts and the price histogram explode into (data_element,
    # value) rows and share a single aggregation — three fact scans
    # become one (the profile_hll_distinct shape; at 100 TB each
    # union branch was a full pass).  Bin rendering matches
    # operators.aggregates.binned_histogram exactly.
    bin_s = F.when(
        F.col("o_totalprice").isNull(), F.lit("Not Reported")
    ).otherwise(
        (F.floor(F.col("o_totalprice") / 50000.0) * 50000.0)
        .cast("bigint")
        .cast("string")
    )
    orders_tidy = (
        orders.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("order_status").alias("data_element"),
                        F.col("o_orderstatus").cast("string").alias("value"),
                    ),
                    F.struct(
                        F.lit("order_priority").alias("data_element"),
                        F.col("o_orderpriority").cast("string").alias("value"),
                    ),
                    F.struct(
                        F.lit("order_total_bin").alias("data_element"),
                        bin_s.alias("value"),
                    ),
                )
            ).alias("e")
        )
        .groupBy("e.data_element", "e.value")
        .agg(F.count(F.lit(1)).cast("double").alias("statistic_value"))
        .select(
            F.col("data_element"),
            F.col("value"),
            F.lit("count").alias("statistic_type"),
            F.col("statistic_value"),
        )
    )
    by_segment = _tidy(
        group_count(customer, ["c_mktsegment"]),
        "market_segment", "c_mktsegment", "count", "count",
    )

    # A2 — distinct (order, supplier) pairs counted per return flag
    # (the reference's distinct (sample, assay) per-assay counts).
    # r10 note: merging this branch with the totals branch into one
    # per-triple pass was tried and REVERTED — the distinct grain is
    # near-fact-cardinality, so Catalyst's column pruning split the
    # "shared" subtree anyway (no ReusedExchange) and the totals
    # payload just widened the big distinct shuffle by 24 B/row;
    # keeping totals as its own single-column pruned scan is cheaper
    # at every scale (shuffle bytes cost more than scan bytes).
    per_flag = _tidy(
        two_level_distinct_count(
            lineitem, ["l_orderkey", "l_suppkey", "l_returnflag"], ["l_returnflag"]
        ),
        "return_flag_distinct_orders", "l_returnflag", "distinct_count", "count",
    )

    # A6 — grand totals (file_size sum analog), exact decimal-
    # semantics sum on the r10 scaled-long fast path (exact_sum).
    # The one-row aggregate fans into two tidy rows via explode so the
    # fact table isn't re-aggregated per statistic.
    totals = lineitem.agg(
        exact_sum("l_extendedprice", "total_extendedprice"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )
    total_rows = totals.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("total_extendedprice").alias("statistic_type"),
                    F.col("total_extendedprice")
                    .cast("double")
                    .alias("statistic_value"),
                ),
                F.struct(
                    F.lit("row_count").alias("statistic_type"),
                    F.col("n_lineitems").cast("double").alias("statistic_value"),
                ),
            )
        ).alias("e")
    ).select(
        F.lit("lineitem").alias("data_element"),
        F.lit("ALL").alias("value"),
        F.col("e.statistic_type").alias("statistic_type"),
        F.col("e.statistic_value").alias("statistic_value"),
    )

    out = orders_tidy
    for piece in (by_segment, per_flag, total_rows):
        out = out.unionByName(piece)
    return out.select(*_SCHEMA_COLS)


CATALOG_STATS_ORACLE = """
WITH by_status AS (
  SELECT 'order_status' AS data_element, CAST(o_orderstatus AS VARCHAR) AS value,
         'count' AS statistic_type, CAST(COUNT(*) AS DOUBLE) AS statistic_value
  FROM orders GROUP BY o_orderstatus
), by_priority AS (
  SELECT 'order_priority', CAST(o_orderpriority AS VARCHAR), 'count', CAST(COUNT(*) AS DOUBLE)
  FROM orders GROUP BY o_orderpriority
), by_segment AS (
  SELECT 'market_segment', CAST(c_mktsegment AS VARCHAR), 'count', CAST(COUNT(*) AS DOUBLE)
  FROM customer GROUP BY c_mktsegment
), per_flag AS (
  SELECT 'return_flag_distinct_orders', CAST(l_returnflag AS VARCHAR), 'distinct_count',
         CAST(COUNT(*) AS DOUBLE)
  FROM (SELECT DISTINCT l_orderkey, l_suppkey, l_returnflag FROM lineitem)
  GROUP BY l_returnflag
), hist AS (
  SELECT 'order_total_bin',
         CASE WHEN o_totalprice IS NULL THEN 'Not Reported'
              ELSE CAST(CAST(FLOOR(o_totalprice / 50000.0) * 50000.0 AS BIGINT) AS VARCHAR) END,
         'count', CAST(COUNT(*) AS DOUBLE)
  FROM orders GROUP BY 2
), totals AS (
  SELECT 'lineitem', 'ALL', 'total_extendedprice',
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem', 'ALL', 'row_count', CAST(COUNT(*) AS DOUBLE) FROM lineitem
)
SELECT * FROM by_status
UNION ALL SELECT * FROM by_priority
UNION ALL SELECT * FROM by_segment
UNION ALL SELECT * FROM per_flag
UNION ALL SELECT * FROM hist
UNION ALL SELECT * FROM totals
"""
