#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
"loadavg": [...], "scale_points": [{"sf": ..., "value": N, ...}]}``

The primary fields (metric/value/queries/sf) keep their shape across
rounds for comparability; ``scale_points`` adds a measured LARGER
scale factor (a 10× key-shifted replica of sf0.1 ≈ sf1, reused across
runs) so the artifact itself shows how the plans scale — r03 VERDICT
item 9.  ``loadavg`` records box pressure at run time: round-to-round
totals on this host swing ±25% with ambient load (measured r6 —
interleaved runs of the r4 and r6 trees overlap completely), so a
bench delta without a loadavg delta is a real regression and one WITH
a loadavg delta is weather.  Set SPARK_GRAFT_SCALE2=0 to skip the
second scale point.
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


def _warm_tables(spark, sf_dir: str) -> None:
    """One full-column pass per table: hot page cache before run 1."""
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            df = spark.read.parquet(p)
            df.selectExpr(
                "bit_xor(xxhash64(" + ", ".join(f"`{c}`" for c in df.columns) + "))"
            ).collect()


def _time_queries(spark, sf_dir: str) -> dict[str, float]:
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
    return timings


def _wait_for_quiet(
    cap: float = 2.0, max_wait: float = 300.0, poll: float = 10.0
) -> float:
    """Bounded wait for box loadavg below ``cap`` (VERDICT r8 item 2:
    eight rounds of artifacts measured on loaded boxes).  Runs BEFORE
    the JVM starts so our own executor threads don't count against the
    1-min average.  Returns seconds waited; proceeds loudly on
    timeout — a late artifact beats a missing one."""
    t0 = time.monotonic()
    while os.getloadavg()[0] >= cap:
        waited = time.monotonic() - t0
        if waited >= max_wait:
            print(
                f"WARNING: box still at loadavg {os.getloadavg()[0]:.2f} "
                f"after {int(waited)}s quiet-wait — proceeding anyway",
                file=sys.stderr,
            )
            break
        print(
            f"loadavg {os.getloadavg()[0]:.2f} >= {cap} — waiting for a "
            f"quiet box ({int(waited)}/{int(max_wait)}s)",
            file=sys.stderr,
        )
        time.sleep(poll)
    return round(time.monotonic() - t0, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # SPARK_GRAFT_QUIET_WAIT=0 disables the wait (iteration runs)
    quiet_wait = _wait_for_quiet(
        max_wait=float(os.environ.get("SPARK_GRAFT_QUIET_WAIT", "300"))
    )
    spark = build_session(app_name="ccdi-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    loadavg = [round(x, 2) for x in os.getloadavg()]

    # Warm the JVM + parquet footers once so timings measure the plans,
    # and force one full-column pass over every input table so the OS
    # page cache is hot before run 1 (a cold box inflates the whole
    # suite ~1.5× — measured r7 — and best-of-2 within a query does not
    # undo a suite-wide cold start).
    REGISTRY["a1_group_count"].fn(spark, sf_dir).count()
    _warm_tables(spark, sf_dir)

    timings = _time_queries(spark, sf_dir)
    total = round(sum(timings.values()), 4)

    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "loadavg": loadavg,
        # r7 VERDICT item 1 ("what's wrong"): a headline measured on a
        # loaded box is weather, not signal.  quiet=false marks the
        # artifact as contaminated; readers should prefer the last
        # quiet run (SCALE.md keeps the history).  r9: bench now
        # waits (bounded) for loadavg < 2 before starting the JVM;
        # quiet_wait_sec records how long it had to wait.
        "quiet": loadavg[0] < 4.0,
        "quiet_wait_sec": quiet_wait,
    }

    # Second scale point: 10× key-shifted replica (≈ sf1), reused
    # across runs.  Failures here never cost the primary artifact.
    if os.environ.get("SPARK_GRAFT_SCALE2", "1") != "0":
        try:
            from childhoodcancerdatainitiative_prefect_pipeline_spark.scale_replica import (
                ensure_replica,
            )

            dest = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), ".scratch", "sf1"
            )
            t0 = time.perf_counter()
            built = ensure_replica(spark, sf_dir, dest, factor=10)
            t_rep = round(time.perf_counter() - t0, 1)
            _warm_tables(spark, dest)
            t2 = _time_queries(spark, dest)
            result["scale_points"] = [
                {
                    "sf": 1.0,
                    "value": round(sum(t2.values()), 4),
                    "unit": "sec",
                    "queries": t2,
                    "replica": ("built" if built else "reused")
                    + f" in {t_rep}s",
                }
            ]
        except Exception as ex:  # noqa: BLE001 - secondary measurement
            result["scale_points_error"] = f"{type(ex).__name__}: {ex}"

    if not result["quiet"]:
        print(
            f"WARNING: loadavg {loadavg[0]} > 4 — timings reflect box "
            "pressure, rerun on a quiet box for a headline number",
            file=sys.stderr,
        )
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
