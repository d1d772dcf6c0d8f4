#!/usr/bin/env python
"""Bucketed-write A/B (VERDICT r7 item 6, write side): at the 10x
replica, write lineitem and orders as hash-bucketed tables on the join
key, pin that the bucketed join plans with NO Exchange on either side,
and time it against the plain shuffle (SMJ) join on the same data.

This is the 100 TB fact-fact story: orders x lineitem is the one join
in the workload where BOTH sides are too large to broadcast.  Bucket
both at ingest and every downstream orderkey join runs shuffle-free.
Numbers land in SCALE.md, with the bucket-count sizing note.

Usage: python scripts/bucket_probe.py [src_sf_dir] [factor] [n_buckets]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from childhoodcancerdatainitiative_prefect_pipeline_spark.scale_replica import (  # noqa: E402
    ensure_replica,
)
from childhoodcancerdatainitiative_prefect_pipeline_spark.session import (  # noqa: E402
    build_session,
)
from childhoodcancerdatainitiative_prefect_pipeline_spark.sources.files import (  # noqa: E402
    write_bucketed_table,
)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    dest = f"/tmp/spark_graft_replica_{os.path.basename(src)}_x{factor}"
    warehouse = f"{dest}/bucket_warehouse"

    spark = build_session(app_name="bucket-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # both sides are "too large to broadcast" in the scenario modeled
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    ensure_replica(spark, src, dest, factor)
    lineitem = spark.read.parquet(f"{dest}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    orders = spark.read.parquet(f"{dest}/orders.parquet").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    n_li, n_o = lineitem.count(), orders.count()
    print(f"replica x{factor}: lineitem={n_li} orders={n_o}")

    def agg(joined):
        return joined.groupBy("o_orderdate").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev"),
        )

    def timed(label, build_df):
        best = float("inf")
        rows = None
        for _ in range(2):
            t0 = time.perf_counter()
            rows = build_df().collect()
            best = min(best, time.perf_counter() - t0)
        chk = sum(r["n"] for r in rows)
        print(f"{label:32s} {best:7.2f} s  rows={len(rows)} checksum={chk}")
        return best, sorted((r["o_orderdate"], r["n"]) for r in rows)

    # --- plain shuffle join (parquet scan -> Exchange both sides) ---
    def plain():
        return agg(
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        )

    # --- bucketed tables: one-time ingest cost, then shuffle-free ---
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bprobe LOCATION '{warehouse}'")
    t0 = time.perf_counter()
    for name, df, key in (
        ("bprobe.b_lineitem", lineitem, "l_orderkey"),
        ("bprobe.b_orders", orders, "o_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_bucketed_table(
            df,
            name,
            bucket_by=[key],
            n_buckets=n_buckets,
            sort_by=[key],
            path=f"{warehouse}/{name.split('.')[1]}",
        )
    t_write = time.perf_counter() - t0
    print(f"bucketed write (both tables, {n_buckets} buckets): {t_write:.2f} s")

    bl = spark.table("bprobe.b_lineitem")
    bo = spark.table("bprobe.b_orders")

    def bucketed():
        return agg(bl.join(bo, bl.l_orderkey == bo.o_orderkey))

    # plan pin: the bucketed join must have NO Exchange on either side
    plan = (
        bucketed()._jdf.queryExecution().executedPlan().toString()
    )
    join_section = plan.split("HashAggregate")[-1]
    n_exchange = join_section.count("Exchange")
    print(f"Exchange nodes below the join in bucketed plan: {n_exchange}")
    assert n_exchange == 0, plan

    t_plain, r_plain = timed("plain SMJ (shuffle both sides)", plain)
    t_bucket, r_bucket = timed("bucketed join (no Exchange)", bucketed)
    assert r_plain == r_bucket, "bucketed join result differs from plain"
    print(
        f"\nsummary: plain={t_plain:.2f}s  bucketed={t_bucket:.2f}s  "
        f"write_cost={t_write:.2f}s  speedup={t_plain / t_bucket:.2f}x  "
        f"breakeven_joins={t_write / max(t_plain - t_bucket, 1e-9):.1f}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
