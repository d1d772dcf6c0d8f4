#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from childhoodcancerdatainitiative_prefect_pipeline_spark.queries import REGISTRY
from childhoodcancerdatainitiative_prefect_pipeline_spark.session import build_session

BENCH_QUERIES = (
    "q1_pricing_summary",
    "q3_revenue_by_order",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "catalog_stats",
    "j3_multi_path_flatten",
    "a9_dedup_keep_last",
    "w1_eav_pivot",
    "events_daily_rollup",
    # LLM-data ops (BASELINE north star)
    "dedup_ngram_jaccard",
    "text_quality",
    "sim_cosine_topk",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = build_session(app_name="ccdi-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once so timings measure the plans.
    REGISTRY["a1_group_count"].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        if name not in REGISTRY:
            continue
        fn = REGISTRY[name].fn
        # two executions, report the faster: the first run pays one-off
        # costs (file listing, codegen compilation) that a long-lived
        # session amortizes; steady-state throughput is the comparable
        # number at any scale factor.
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
