"""Key-shifted table replication — the second bench scale point.

Replicates an sf-directory N× with per-replica key shifts so
uniqueness and FK-link semantics survive (a 10× sf0.1 ≈ sf1).  Used
by ``bench.py`` (the per-round BENCH artifact carries a measured
larger-scale row, r03 VERDICT item 9) and ``scripts/scale_probe.py``
(the full plan-audit sweep recorded in SCALE.md).

Replication is itself a Spark job (union of shifted scans, one write)
and idempotent: an existing replica with all ``_SUCCESS`` markers is
reused.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

#: key columns shifted per replica so uniqueness/link semantics survive
KEY_SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "nation": [],
    "region": [],
}
#: columns that reference another table's shifted key
FK_SHIFTS = {
    "lineitem": {"l_partkey": "part", "l_suppkey": "supplier"},
    "orders": {},
}
SHIFT_BASE = {
    "lineitem": 10_000_000, "orders": 10_000_000, "customer": 1_000_000,
    "events": 10_000_000, "documents": 1_000_000, "embeddings": 1_000_000,
    "part": 1_000_000, "supplier": 100_000,
}


def replicate_table(
    spark: SparkSession, src: str, dest: str, name: str, factor: int
) -> int:
    """Write one table's key-shifted ``factor``× replica; returns rows."""
    df = spark.read.parquet(f"{src}/{name}.parquet")
    keys = KEY_SHIFTS.get(name, [])
    if not keys:
        df.write.mode("overwrite").parquet(f"{dest}/{name}.parquet")
        return df.count()
    base = SHIFT_BASE[name]
    parts = []
    for i in range(factor):
        rep = df
        for k in keys:
            rep = rep.withColumn(k, (F.col(k) + F.lit(i * base)).cast("long"))
        for fk, ref in FK_SHIFTS.get(name, {}).items():
            rep = rep.withColumn(
                fk, (F.col(fk) + F.lit(i * SHIFT_BASE[ref])).cast("long")
            )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dest}/{name}.parquet")
    return out.count()


def ensure_replica(
    spark: SparkSession, src: str, dest: str, factor: int = 10
) -> bool:
    """Build (or reuse) the full key-shifted replica under ``dest``.

    Returns True if the replica was (re)built, False if reused.
    """
    if all(
        os.path.exists(f"{dest}/{n}.parquet/_SUCCESS") for n in KEY_SHIFTS
    ):
        return False
    os.makedirs(dest, exist_ok=True)
    for name in KEY_SHIFTS:
        replicate_table(spark, src, dest, name, factor)
    return True
