#!/usr/bin/env python
"""c8-vs-c32 scaling probe at the 10× replica (VERDICT r10 item 8).

The sf0.1 headline's 8-vs-32-core ratios are ≈1 because sub-1.5 s
queries are fixed-overhead-bound; the 10× point is where parallelism
is visible.  Runs the top sweep entries best-of-2 at the current
``$SPARK_GRAFT_CPUS`` and emits one JSON line; run it twice (CPUS=32,
CPUS=8) and compare.

Usage: SPARK_GRAFT_CPUS=32 python scripts/scaling_probe_10x.py > out32.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from childhoodcancerdatainitiative_prefect_pipeline_spark.queries import REGISTRY
from childhoodcancerdatainitiative_prefect_pipeline_spark.scale_replica import (
    ensure_replica,
)
from childhoodcancerdatainitiative_prefect_pipeline_spark.session import build_session

#: top sweep entries by r10 cost — the set where core-count scaling is
#: measurable (each ≥ ~4 s at 10×)
PROBE_QUERIES = (
    "ccdi_release_dashboard", "cds_flatten", "graph_pagerank_topk",
    "graph_triangle_count_knn", "entity_golden_record",
    "graph_kcore_membership_knn", "sim_pq_topk_det",
    "dedup_simhash_pairs", "dedup_cluster_star",
    "dedup_image_ahash_pairs",
)


def main() -> int:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", "sf1",
    )
    spark = build_session(app_name="scaling-probe-10x")
    spark.sparkContext.setLogLevel("ERROR")
    ensure_replica(spark, src, dest, factor=10)

    timings: dict[str, float] = {}
    for name in PROBE_QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            REGISTRY[name].fn(spark, dest).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]} s", file=sys.stderr)
        # drain checkpoints between entries so storage pressure from
        # earlier queries does not contaminate later timings
        jrdds = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jrdds.keySet().toArray()):
            jrdds.get(rid).unpersist()
    print(
        json.dumps(
            {
                "metric": "scaling_probe_10x",
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
