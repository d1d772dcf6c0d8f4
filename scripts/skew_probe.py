"""Skew-resilience A/B (VERDICT r7 item 5): salted_join vs plain join
on an actually-skewed replica.

Builds the 10× key-shifted replica plus ``orders_skew.parquet`` (~50 %
of orders pointing at ONE customer), verifies ``top_skewed_keys``
flags the hot key, then times customer⋈orders_skew under:

  a. plain shuffle join, AQE skew-join ON   (Spark's own mitigation)
  b. plain shuffle join, AQE skew-join OFF  (what a mis-tuned cluster
     or a non-splittable operator sees)
  c. salted_join (n_salts=32), AQE skew-join OFF

Broadcast is disabled for the probe join (threshold -1): a broadcast
would hide the skew entirely — the 100 TB case this models is a build
side too large to broadcast.  Numbers land in SCALE.md.

Usage: python scripts/skew_probe.py [src_sf_dir] [factor]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["PYTHONPATH"] = (
    "/root/repo" + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

from pyspark.sql import functions as F  # noqa: E402

from childhoodcancerdatainitiative_prefect_pipeline_spark.operators.skew import (  # noqa: E402
    salted_join,
    top_skewed_keys,
)
from childhoodcancerdatainitiative_prefect_pipeline_spark.scale_replica import (  # noqa: E402
    ensure_replica,
    ensure_skewed_orders,
)
from childhoodcancerdatainitiative_prefect_pipeline_spark.session import (  # noqa: E402
    build_session,
)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    dest = f"/tmp/spark_graft_replica_{os.path.basename(src)}_x{factor}"

    spark = build_session(app_name="skew-probe")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    ensure_replica(spark, src, dest, factor)
    skew_path = ensure_skewed_orders(spark, src, dest, factor)

    customer = spark.read.parquet(f"{dest}/customer.parquet")
    orders = spark.read.parquet(skew_path)
    n_orders = orders.count()
    n_cust = customer.count()
    print(f"replica: {n_orders} skewed orders, {n_cust} customers")

    hot = top_skewed_keys(orders, ["o_custkey"], min_share=0.01).collect()
    print("top_skewed_keys flags:")
    for r in hot[:3]:
        print(f"  o_custkey={r['o_custkey']}  share={r['share']:.3f}")
    assert hot and hot[0]["share"] > 0.4, "hot key not flagged"

    def probe_plain():
        return (
            orders.join(customer, orders.o_custkey == customer.c_custkey)
            .groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("o_totalprice").alias("rev"),
            )
        )

    def probe_salted():
        j = salted_join(
            orders.withColumnRenamed("o_custkey", "c_custkey"),
            customer,
            ["c_custkey"],
            n_salts=32,
        )
        return j.groupBy("c_nationkey").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice").alias("rev"),
        )

    def run(label, fn, skew_join: bool):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_join).lower()
        )
        t0 = time.time()
        rows = fn().collect()
        dt = time.time() - t0
        chk = sum(r["n"] for r in rows)
        print(f"{label:42s} {dt:7.2f} s   rows={len(rows)} checksum={chk}")
        return dt, sorted((r["c_nationkey"], r["n"]) for r in rows)

    # warm the page cache/scan once
    orders.count()
    customer.count()

    t_a, res_a = run("plain join, AQE skew-join ON", probe_plain, True)
    t_b, res_b = run("plain join, AQE skew-join OFF", probe_plain, False)
    t_c, res_c = run("salted_join(32), AQE skew-join OFF", probe_salted, False)
    assert res_a == res_b == res_c, "result mismatch between strategies"
    print(
        f"\nsummary: aqe_on={t_a:.2f}s  aqe_off={t_b:.2f}s  "
        f"salted={t_c:.2f}s  salted/aqe_off={t_c / t_b:.2f}x"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
