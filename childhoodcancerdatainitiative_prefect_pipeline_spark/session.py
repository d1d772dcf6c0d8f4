"""SparkSession construction tuned for the engine.

The reference sizes work by picking a Prefect worker tier
(2-60 GB, Deployment_README.md:70-104) and fanning out threads
(src/neo4j_data_tools.py:726).  Here the equivalent knobs are Spark
conf: AQE handles runtime re-planning (partition coalescing, skew
joins, broadcast demotion), shuffle partitions are sized for the
local harness but scale with cluster cores, and Arrow makes the few
pandas boundaries cheap.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conf applied to every session the engine builds.  At 100 TB scale
#: these stay valid: AQE coalesces the 2x-over-provisioned shuffle
#: partitions down to target size, and skew-join splitting replaces
#: hand-rolled salting for the common case.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # 20m, not the old 64m: byte size is a proxy for the broadcast
    # build, which is a SINGLE-THREADED hashed-relation construction.
    # Measured r7 on the 10× replica: a ~40 MB filtered fact side
    # slipped under 64m and q3's orders⋈lineitem became a broadcast
    # whose build cost 3.4 s vs 1.3 s for the parallel SMJ (the 30×
    # replica flipped to SMJ on its own and ran FASTER than 10×).
    # 20m keeps every post-pruning dimension broadcast (region/nation/
    # supplier/customer key columns are ≤ single-digit MB even at 30×)
    # while demoting fact-side relations past ~1M rows.
    "spark.sql.autoBroadcastJoinThreshold": "20m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # Parquet TIMESTAMP(NANOS) columns (events.ts) are read as long
    # nanos and converted to microsecond timestamps in the catalog —
    # the same ns→us truncation DuckDB applies.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.files.maxPartitionBytes": "128m",
    # Timestamps in the synthetic data are naive; keep them stable
    # across JVM/duckdb comparison.
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def build_session(
    app_name: str = "ccdi-spark-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine conf.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver
    harness) or ``local[*]``; on a real cluster pass ``None`` and
    submit with ``--master``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(ENGINE_CONF)
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus) * 2, 8)
        except ValueError:
            shuffle_partitions = 32
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
