"""Query registry — the driver-facing contract.

Every implemented operator from SURVEY.md §2 gets a named entry:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-
expressible) a DuckDB oracle string over the same parquet tables.

Hash-parity conventions (see BASELINE.md):

- aggregates over doubles go through exact decimal arithmetic and
  are cast back to double — order-independent, so Spark's partial
  aggregation and DuckDB produce bit-identical values;
- every computed column is aliased identically on both sides;
- any LIMIT/top-k has a total deterministic ORDER BY (tie-breaks on
  a key column);
- ratios are rounded to a fixed scale on both sides after exact
  pre-aggregation.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_testdata
from .operators import aggregates as agg
from .operators import joins as J
from .operators import reshape, setops, windows
from .plans.catalog_stats import CATALOG_STATS_ORACLE, catalog_stats

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    fn: QueryFn
    oracle: str | None
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(fn, oracle, doc)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    cat = load_testdata(spark, sf_dir, tables=tuple(names), register_views=False)
    return [cat[n] for n in names]


# ---------------------------------------------------------------------------
# Flagship plan
# ---------------------------------------------------------------------------

register("catalog_stats", CATALOG_STATS_ORACLE, "flagship §2.4 A1/A2/A6/A8 battery")(
    catalog_stats
)


# ---------------------------------------------------------------------------
# Aggregation pack (SURVEY §2.4)
# ---------------------------------------------------------------------------


@register(
    "a1_group_count",
    """SELECT o_orderpriority, COUNT(*) AS n FROM orders
       GROUP BY o_orderpriority""",
    "A1 groupby-size (workflows/data_catalog_stats.py:47-51)",
)
def a1_group_count(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    return agg.group_count(orders, ["o_orderpriority"], "n")


@register(
    "a2_two_level_distinct",
    """SELECT l_suppkey, COUNT(*) AS n FROM
       (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
       GROUP BY l_suppkey""",
    "A2 distinct-pair count (workflows/data_catalog_stats.py:150)",
)
def a2_two_level_distinct(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return agg.two_level_distinct_count(
        lineitem, ["l_orderkey", "l_suppkey"], ["l_suppkey"], "n"
    )


@register(
    "a3_duplicates",
    """SELECT l_partkey, COUNT(*) AS dup_count FROM lineitem
       GROUP BY l_partkey HAVING COUNT(*) > 1""",
    "A3 duplicate keys (src/s3_validationry_refactored.py:944-964)",
)
def a3_duplicates(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return agg.duplicates(lineitem, ["l_partkey"])


@register(
    "a4_key_collisions",
    """WITH tagged AS (
         SELECT CAST(c_custkey AS VARCHAR) AS key_value, 'customer' AS node FROM customer
         UNION ALL SELECT CAST(s_suppkey AS VARCHAR), 'supplier' FROM supplier
         UNION ALL SELECT CAST(p_partkey AS VARCHAR), 'part' FROM part
       )
       SELECT key_value, string_agg(DISTINCT node, ';' ORDER BY node) AS nodes
       FROM tagged GROUP BY key_value
       HAVING COUNT(DISTINCT node) > 1""",
    "A4 cross-table key collisions (src/s3_validationry_refactored.py:1022-1109)",
)
def a4_key_collisions(spark, sf_dir):
    customer, supplier, part = _t(spark, sf_dir, "customer", "supplier", "part")
    return agg.cross_table_key_collisions(
        [
            ("customer", customer, "c_custkey"),
            ("supplier", supplier, "s_suppkey"),
            ("part", part, "p_partkey"),
        ]
    )


@register(
    "a5_group_concat_distinct",
    """SELECT l_returnflag,
              string_agg(DISTINCT l_linestatus, ';' ORDER BY l_linestatus) AS linestatus_set
       FROM lineitem GROUP BY l_returnflag""",
    "A5 sorted distinct group-concat (src/s3_ccdi_to_sra.py:1186-1294)",
)
def a5_group_concat(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return agg.group_concat_distinct(
        lineitem, ["l_returnflag"], "l_linestatus", "linestatus_set"
    )


@register(
    "a7_min_per_group_dedup_sum",
    """SELECT CAST(SUM(m) AS DOUBLE) AS dedup_total FROM
       (SELECT MIN(CAST(l_extendedprice AS DECIMAL(18,4))) AS m
        FROM lineitem GROUP BY l_partkey)""",
    "A7 min-per-group then sum (src/neo4j_data_tools.py:337-345)",
)
def a7_min_dedup_sum(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return agg.min_per_group_dedup_sum(lineitem, "l_partkey", "l_extendedprice")


@register(
    "a9_dedup_keep_last",
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM
       (SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber DESC, l_partkey DESC,
                                           l_suppkey DESC) AS rn
        FROM lineitem) WHERE rn = 1""",
    "A9 keep-last dedup with explicit priority (src/s3_ccdi_to_sra.py:1151-1153)",
)
def a9_keep_last(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    kept = agg.dedup_keep_last(
        lineitem, ["l_orderkey"], ["l_linenumber", "l_partkey", "l_suppkey"]
    )
    return kept.select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")


@register(
    "a10_cardinality_guard",
    """SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_dependents
       FROM lineitem GROUP BY l_partkey
       HAVING COUNT(DISTINCT l_suppkey) > 1""",
    "A10 per-group cardinality guard (src/s3_ccdi_to_sra.py:1157-1183)",
)
def a10_cardinality(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    bad, _clean = agg.cardinality_guard(lineitem, "l_partkey", "l_suppkey", 1)
    return bad


@register(
    "a11_count_reconciliation",
    """WITH lc AS (SELECT o_custkey AS custkey, COUNT(*) AS left_count
                   FROM orders GROUP BY o_custkey),
            rc AS (SELECT c_custkey AS custkey, COUNT(*) AS right_count
                   FROM customer GROUP BY c_custkey)
       SELECT COALESCE(lc.custkey, rc.custkey) AS custkey, left_count, right_count,
              CASE WHEN COALESCE(left_count,0) = COALESCE(right_count,0)
                   THEN 'Equal' ELSE 'Unequal' END AS flag
       FROM lc FULL OUTER JOIN rc ON lc.custkey = rc.custkey""",
    "A11 count reconciliation (src/neo4j_data_tools.py:970-1008)",
)
def a11_reconcile(spark, sf_dir):
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    return agg.count_reconciliation(
        orders.select(F.col("o_custkey").alias("custkey")),
        customer.select(F.col("c_custkey").alias("custkey")),
        ["custkey"],
    )


# ---------------------------------------------------------------------------
# Join pack (SURVEY §2.3) + set ops (§2.8)
# ---------------------------------------------------------------------------


@register(
    "j1_left_join",
    """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
       FROM orders LEFT JOIN customer ON o_custkey = c_custkey""",
    "J1 parent-child left join (src/s3_ccdi_to_cds.py:269-279)",
)
def j1_left_join(spark, sf_dir):
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    joined = J.left_join(
        orders.withColumnRenamed("o_custkey", "custkey"),
        customer.withColumnRenamed("c_custkey", "custkey"),
        "custkey",
        broadcast_child=True,
    )
    return joined.select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@register(
    "j5_diff_join",
    """WITH l AS (SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0),
            r AS (SELECT DISTINCT o_custkey AS custkey FROM orders)
       SELECT COALESCE(l.custkey, r.custkey) AS custkey,
              CASE WHEN l.custkey IS NOT NULL AND r.custkey IS NOT NULL THEN 'both'
                   WHEN l.custkey IS NOT NULL THEN 'left_only'
                   ELSE 'right_only' END AS _merge
       FROM l FULL OUTER JOIN r ON l.custkey = r.custkey""",
    "J5 outer diff join with indicator (workflows/compare_dataframes.py:27-50)",
)
def j5_diff_join(spark, sf_dir):
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    left = customer.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("custkey")
    )
    right = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    return J.diff_join(left, right, ["custkey"]).select("custkey", "_merge")


@register(
    "j6_anti_join",
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
    "J6 existence anti-join (src/s3_validationry_refactored.py:1387-1427)",
)
def j6_anti(spark, sf_dir):
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    return J.anti_join(
        customer, orders.select(F.col("o_custkey").alias("c_custkey")), ["c_custkey"]
    ).select("c_custkey", "c_name")


@register(
    "j7_semi_join",
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""",
    "J7 semi-join (src/s3_ccdi_to_dbgap.py:236-273)",
)
def j7_semi(spark, sf_dir):
    orders, customer = _t(spark, sf_dir, "orders", "customer")
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return J.semi_join(customer, f_orders, ["c_custkey"]).select("c_custkey", "c_name")


@register(
    "j3_multi_path_flatten",
    """SELECT DISTINCT o_orderkey, n_name FROM (
         SELECT o.o_orderkey, n.n_name
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
                       JOIN nation n ON c.c_nationkey = n.n_nationkey
         UNION ALL
         SELECT l.l_orderkey, n.n_name
         FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
                         JOIN nation n ON s.s_nationkey = n.n_nationkey
       )""",
    "J3 union of join paths + dedup (src/s3_ccdi_to_cds.py:299-729)",
)
def j3_multi_path(spark, sf_dir):
    orders, customer, nation, lineitem, supplier = _t(
        spark, sf_dir, "orders", "customer", "nation", "lineitem", "supplier"
    )
    nation_b = F.broadcast(nation)
    via_customer = (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .join(nation_b, customer.c_nationkey == nation.n_nationkey)
        .select(F.col("o_orderkey"), F.col("n_name"))
    )
    via_supplier = (
        lineitem.join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(nation_b, supplier.s_nationkey == nation.n_nationkey)
        .select(F.col("l_orderkey").alias("o_orderkey"), F.col("n_name"))
    )
    return via_customer.unionByName(via_supplier).dropDuplicates(
        ["o_orderkey", "n_name"]
    )


@register(
    "j8_chain_resolve",
    """SELECT o_orderkey, r_name AS resolved_region
       FROM orders
       LEFT JOIN customer ON o_custkey = c_custkey
       LEFT JOIN nation ON c_nationkey = n_nationkey
       LEFT JOIN region ON n_regionkey = r_regionkey""",
    "J8 bounded chain traversal (src/s3_catcherry.py:770-905)",
)
def j8_chain(spark, sf_dir):
    orders, customer, nation, region = _t(
        spark, sf_dir, "orders", "customer", "nation", "region"
    )
    # Each hop is one broadcastable dimension join; the reference's
    # deep_search loop becomes a statically-unrolled chain here (the
    # dynamic fixpoint variant lives in operators.joins.iterative_resolve).
    hops = [
        (customer.select(F.col("c_custkey").alias("k"), F.col("c_nationkey").alias("v"))),
        (nation.select(F.col("n_nationkey").alias("k"), F.col("n_regionkey").alias("v"))),
        (region.select(F.col("r_regionkey").alias("k"), F.col("r_name").alias("v"))),
    ]
    cur = orders.select("o_orderkey", F.col("o_custkey").alias("__cursor__"))
    for hop in hops:
        cur = (
            cur.join(F.broadcast(hop), cur["__cursor__"] == hop["k"], "left")
            .drop("__cursor__", "k")
            .withColumnRenamed("v", "__cursor__")
        )
    return cur.withColumnRenamed("__cursor__", "resolved_region")


@register(
    "u1_union_hetero",
    """SELECT CAST(c_custkey AS BIGINT) AS entity_id, c_name AS name,
              c_acctbal AS acctbal, c_mktsegment AS mktsegment
       FROM customer
       UNION ALL
       SELECT CAST(s_suppkey AS BIGINT), s_name, s_acctbal, CAST(NULL AS VARCHAR)
       FROM supplier""",
    "U1 heterogeneous union (src/s3_ccdi_to_cds.py:219-246)",
)
def u1_union_hetero(spark, sf_dir):
    customer, supplier = _t(spark, sf_dir, "customer", "supplier")
    c = customer.select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    s = supplier.select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return setops.union_hetero([c, s])


@register(
    "u3_except_keys",
    """SELECT s_suppkey, s_name FROM supplier
       WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem)""",
    "U3 key difference (src/s3_ccdi_to_dbgap.py:288-307)",
)
def u3_except(spark, sf_dir):
    supplier, lineitem = _t(spark, sf_dir, "supplier", "lineitem")
    return setops.except_keys(
        supplier.select("s_suppkey", "s_name"),
        lineitem.select(F.col("l_suppkey").alias("s_suppkey")),
        ["s_suppkey"],
    )


# ---------------------------------------------------------------------------
# Window pack (SURVEY §2.5)
# ---------------------------------------------------------------------------


@register(
    "wa_top1_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM
       (SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) WHERE rn = 1""",
    "W-a top-1 per group by richness (src/s3_ccdi_to_sra.py:1039-1068)",
)
def wa_top1(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    best = windows.top1_per_group(
        orders, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()]
    )
    return best.select("o_custkey", "o_orderkey", "o_totalprice")


@register(
    "wd_latest_per_group",
    """SELECT o_custkey, o_orderkey, o_orderdate FROM
       (SELECT o_custkey, o_orderkey, o_orderdate,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey) AS rn
        FROM orders) WHERE rn = 1""",
    "W-d latest status per entity (workflows/mci_gdc_transform.py:31-60)",
)
def wd_latest(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    latest = windows.latest_per_group(
        orders, ["o_custkey"], "o_orderdate", tie_break=["o_orderkey"]
    )
    return latest.select("o_custkey", "o_orderkey", "o_orderdate")


@register(
    "wc_constancy_check",
    """WITH counted AS (
         SELECT l_partkey,
                COUNT(DISTINCT l_returnflag) AS l_returnflag,
                COUNT(DISTINCT l_linestatus) AS l_linestatus
         FROM lineitem GROUP BY l_partkey
       )
       SELECT l_partkey, column_name, n_distinct FROM (
         SELECT l_partkey, 'l_returnflag' AS column_name,
                l_returnflag AS n_distinct FROM counted
         UNION ALL
         SELECT l_partkey, 'l_linestatus', l_linestatus FROM counted
       ) WHERE n_distinct > 1""",
    "W-c intra-group constancy (src/s3_ccdi_to_sra.py:993-1036)",
)
def wc_constancy(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return windows.intra_group_constancy(
        lineitem, ["l_partkey"], ["l_returnflag", "l_linestatus"]
    )


# ---------------------------------------------------------------------------
# Reshape pack (SURVEY §2.6)
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "w1_eav_pivot",
    """SELECT user_id,
              SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click,
              SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS error,
              SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase,
              SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS signup,
              SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view
       FROM events GROUP BY user_id""",
    "W1 EAV long→wide pivot (src/neo4j_data_tools.py:1666-1759)",
)
def w1_eav_pivot(spark, sf_dir):
    (events,) = _t(spark, sf_dir, "events")
    pivoted = (
        events.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    exprs = [F.col("user_id")] + [
        F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in EVENT_TYPES
    ]
    return pivoted.select(*exprs)


@register(
    "w2_spread_numbered",
    """SELECT l_orderkey,
              MAX(CASE WHEN rn = 1 THEN l_partkey END) AS "l_partkey.1",
              MAX(CASE WHEN rn = 1 THEN l_quantity END) AS "l_quantity.1",
              MAX(CASE WHEN rn = 2 THEN l_partkey END) AS "l_partkey.2",
              MAX(CASE WHEN rn = 2 THEN l_quantity END) AS "l_quantity.2"
       FROM (SELECT l_orderkey, l_partkey, l_quantity,
                    ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                       ORDER BY l_linenumber, l_partkey,
                                                l_quantity) AS rn
             FROM lineitem)
       GROUP BY l_orderkey""",
    "W2 numbered wide spread (src/s3_ccdi_to_sra.py:1071-1125)",
)
def w2_spread(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    wide = reshape.spread_numbered(
        lineitem.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity"),
        key="l_orderkey",
        order_by=["l_linenumber", "l_partkey", "l_quantity"],
        value_cols=["l_partkey", "l_quantity"],
        max_n=2,
    )
    return wide.select(
        "l_orderkey",
        F.col("`l_partkey.1`"),
        F.col("`l_quantity.1`"),
        F.col("`l_partkey.2`"),
        F.col("`l_quantity.2`"),
    )


@register(
    "w5_explode_implode",
    """WITH exploded AS (
         SELECT o_orderkey, UNNEST(string_split(o_orderpriority, '-')) AS part
         FROM orders
       )
       SELECT o_orderkey,
              string_agg(DISTINCT part, ';' ORDER BY part) AS parts
       FROM exploded GROUP BY o_orderkey""",
    "W5 delimited explode + implode round trip (src/s3_catcherry.py:474-487)",
)
def w5_explode_implode(spark, sf_dir):
    (orders,) = _t(spark, sf_dir, "orders")
    exploded = reshape.explode_delimited(
        orders.select("o_orderkey", "o_orderpriority"),
        "o_orderpriority",
        out_col="part",
        sep="-",
    )
    return reshape.implode_delimited(exploded, ["o_orderkey"], "part", out_col="parts")


# ---------------------------------------------------------------------------
# Headline analytical queries (bench workload; TPC-H-shaped over the
# driver's star schema).  These exercise scan→filter→join→agg plans the
# way the reference's largest flows (CDS flattening + catalog stats)
# do, and are the BENCH_r{N}.json workload.
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                       (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                       (1 - CAST(l_discount AS DECIMAL(18,4))) *
                       (1 + CAST(l_tax AS DECIMAL(18,4)))) AS DOUBLE) AS sum_charge,
              COUNT(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
    "TPC-H Q1 shape: scan→filter→agg, exact decimal sums",
)
def q1_pricing_summary(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1) - dec("l_discount"))
                * (F.lit(1) + dec("l_tax"))
            )
            .cast("double")
            .alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_revenue_by_order",
    """SELECT o_orderkey, o_orderdate, o_orderpriority,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                       (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1995-03-15'
       GROUP BY o_orderkey, o_orderdate, o_orderpriority""",
    "TPC-H Q3 shape: selective dim filter → fact join → agg",
)
def q3_revenue(spark, sf_dir):
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    dim = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        orders.filter(F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp"))
        .join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .join(lineitem, F.col("o_orderkey") == lineitem.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q5_region_revenue",
    """SELECT n_name,
              CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                       (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
       GROUP BY n_name""",
    "TPC-H Q5 shape: snowflake join with broadcast dims",
)
def q5_region_revenue(spark, sf_dir):
    customer, orders, lineitem, supplier, nation, region = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    nr = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    sup = supplier.join(
        F.broadcast(nr), supplier.s_nationkey == nr.n_nationkey
    ).select("s_suppkey", "s_nationkey", "n_name")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(sup), lineitem.l_suppkey == sup.s_suppkey)
        .join(
            customer,
            (orders.o_custkey == customer.c_custkey)
            & (customer.c_nationkey == sup.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "q6_forecast_revenue",
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                     CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1994-01-01'
         AND l_shipdate < TIMESTAMP '1995-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
    "TPC-H Q6 shape: pushed-down range filters → scalar agg",
)
def q6_forecast(spark, sf_dir):
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "events_daily_rollup",
    """SELECT date_trunc('day', ts) AS day, event_type,
              COUNT(*) AS n_events,
              COUNT(DISTINCT user_id) AS n_users,
              CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
       FROM events GROUP BY 1, 2""",
    "§2.15 batch analog of the streaming daily rollup over events",
)
def events_daily_rollup(spark, sf_dir):
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
    )


@register(
    "o_top_limit",
    """SELECT c_custkey, c_name, c_acctbal FROM customer
       ORDER BY c_acctbal DESC, c_custkey LIMIT 10""",
    "O1/O3 deterministic top-k (src/read_buckets.py:87-104, template_exampler caps)",
)
def o_top_limit(spark, sf_dir):
    (customer,) = _t(spark, sf_dir, "customer")
    return (
        customer.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(10)
    )
