"""Key-shifted table replication — the second bench scale point.

Replicates an sf-directory N× with per-replica key shifts so
uniqueness and FK-link semantics survive (a 10× sf0.1 ≈ sf1).  Used
by ``bench.py`` (the per-round BENCH artifact carries a measured
larger-scale row, r03 VERDICT item 9) and ``scripts/scale_probe.py``
(the full plan-audit sweep recorded in SCALE.md).

FK discipline (ADVICE r6): a foreign-key column must shift by the
*referenced* table's base, not its own table's — ``o_custkey`` and
``events.user_id`` reference ``customer`` and therefore shift by
``SHIFT_BASE['customer']``, or every replica's orders/events would
point at customers that don't exist and customer-join queries would
match only replica 0 (silently understating join work at scale).

Replication is itself a Spark job (union of shifted scans, one write)
and idempotent: an existing replica is reused only when all
``_SUCCESS`` markers exist AND the recorded build factor matches the
requested one (a ``_REPLICA_FACTOR`` marker file records it).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

#: primary-key columns shifted per replica by the OWNING table's base
KEY_SHIFTS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "customer": ["c_custkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "nation": [],
    "region": [],
}
#: FK columns shifted by the REFERENCED table's base (keeps links live)
FK_SHIFTS = {
    "lineitem": {"l_partkey": "part", "l_suppkey": "supplier"},
    "orders": {"o_custkey": "customer"},
    "events": {"user_id": "customer"},
}
SHIFT_BASE = {
    "lineitem": 10_000_000, "orders": 10_000_000, "customer": 1_000_000,
    "events": 10_000_000, "documents": 1_000_000, "embeddings": 1_000_000,
    "part": 1_000_000, "supplier": 100_000,
}

_FACTOR_MARKER = "_REPLICA_FACTOR"
_SKEW_MARKER = "_SKEW_ORDERS"


def replicate_table(
    spark: SparkSession, src: str, dest: str, name: str, factor: int
) -> None:
    """Write one table's key-shifted ``factor``× replica."""
    df = spark.read.parquet(f"{src}/{name}.parquet")
    keys = KEY_SHIFTS.get(name, [])
    if not keys and not FK_SHIFTS.get(name):
        df.write.mode("overwrite").parquet(f"{dest}/{name}.parquet")
        return
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


def ensure_replica(
    spark: SparkSession, src: str, dest: str, factor: int = 10
) -> bool:
    """Build (or reuse) the full key-shifted replica under ``dest``.

    Returns True if the replica was (re)built, False if reused.  A
    replica is reusable only when every table carries a ``_SUCCESS``
    marker AND ``_REPLICA_FACTOR`` records the same factor — a dest
    previously built at a different scale point is rebuilt, never
    silently accepted (ADVICE r6).
    """
    marker = os.path.join(dest, _FACTOR_MARKER)
    if all(
        os.path.exists(f"{dest}/{n}.parquet/_SUCCESS") for n in KEY_SHIFTS
    ):
        try:
            with open(marker) as f:
                if int(f.read().strip()) == factor:
                    return False
        except (OSError, ValueError):
            pass  # missing/corrupt marker -> rebuild at requested factor
    os.makedirs(dest, exist_ok=True)
    if os.path.exists(marker):
        os.remove(marker)
    for name in KEY_SHIFTS:
        replicate_table(spark, src, dest, name, factor)
    with open(marker, "w") as f:
        f.write(str(factor))
    return True


_SALT_MARKER = "_SALT_DOCS"


def ensure_salted_documents(
    spark: SparkSession,
    src: str,
    dest: str,
    factor: int = 10,
    keep_dup_one_in: int = 16,
    link_from: str | None = None,
) -> str:
    """Build a REALISTIC-dup-rate documents replica (VERDICT r8
    item 4): plain key-shifted replicas carry identical text, so every
    dedup pair entry's output grows as factor² and a 100× probe of
    ``dedup_*_pairs`` measures the fixture's quadratic output, not the
    plan.  Here replica i>0 text is word-salted with a per-replica
    suffix — a bijective shingle-set rename, so WITHIN-replica
    similarity structure (planted near-dups) is preserved exactly
    while cross-replica Jaccard drops to 0 — EXCEPT that documents
    with ``doc_id % keep_dup_one_in == 0`` keep their original text in
    every replica (exact-dup groups of size ``factor``: the realistic
    boilerplate fraction).  Deterministic (key-derived, no RNG),
    idempotent via a marker recording (factor, keep_dup_one_in,
    link_from) — a changed link source re-points the symlinks.

    Writes ``documents.parquet`` under ``dest`` and symlinks every
    other table from ``link_from`` (default ``src`` — pass the plain
    factor× replica dir so non-document tables match the scale point)
    so the dest works as a query sf_dir.  Returns ``dest``.
    """
    marker = os.path.join(dest, _SALT_MARKER)
    # link_from is part of the identity (ADVICE r9): re-running with a
    # different non-document source must re-point the symlinks, or the
    # dest silently mixes scale points
    want = f"{factor},{keep_dup_one_in},{os.path.abspath(link_from or src)}"
    if os.path.exists(f"{dest}/documents.parquet/_SUCCESS"):
        try:
            with open(marker) as f:
                if f.read().strip() == want:
                    return dest
        except OSError:
            pass
    os.makedirs(dest, exist_ok=True)
    df = spark.read.parquet(f"{src}/documents.parquet")
    base = SHIFT_BASE["documents"]
    # keep-set membership from the ORIGINAL doc_id (salting after the
    # shift would misalign the kept groups whenever keep_dup_one_in
    # does not divide the shift base)
    keep = F.col("doc_id") % keep_dup_one_in == 0
    parts = []
    for i in range(factor):
        rep = df
        if i > 0:
            salted = F.array_join(
                F.transform(
                    F.split(F.trim(F.col("text")), r"\s+"),
                    lambda w: F.concat(w, F.lit(f"~r{i}")),
                ),
                " ",
            )
            rep = rep.withColumn(
                "text", F.when(keep, F.col("text")).otherwise(salted)
            )
        rep = rep.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(i * base)).cast("long")
        )
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{dest}/documents.parquet")
    for name in KEY_SHIFTS:
        if name == "documents":
            continue
        link = f"{dest}/{name}.parquet"
        target = f"{link_from or src}/{name}.parquet"
        # re-point stale links: the marker mismatch that got us here
        # may be a changed link_from, not just a changed dup rate
        if os.path.islink(link):
            os.unlink(link)
        if not os.path.exists(link) and os.path.exists(target):
            os.symlink(os.path.abspath(target), link)
    with open(marker, "w") as f:
        f.write(want)
    return dest


def ensure_skewed_orders(
    spark: SparkSession,
    src: str,
    dest: str,
    factor: int = 10,
    hot_mod: int = 2,
    hot_key: int = 1,
) -> str:
    """Write ``orders_skew.parquet`` next to the replica: the factor×
    key-shifted orders with ``o_custkey`` remapped to ONE hot customer
    for every ``o_orderkey % hot_mod == 0`` row (hot_mod=2 → ~50 % of
    all orders point at a single customer — the "one study holds half
    the files" shape of the reference's EAV pivot key,
    src/neo4j_data_tools.py:1666-1759).  Deterministic (key-derived,
    no RNG), idempotent via a marker recording (factor, hot_mod,
    hot_key).  Returns the parquet path.
    """
    out = f"{dest}/orders_skew.parquet"
    marker = os.path.join(dest, _SKEW_MARKER)
    want = f"{factor},{hot_mod},{hot_key}"
    if os.path.exists(f"{out}/_SUCCESS"):
        try:
            with open(marker) as f:
                if f.read().strip() == want:
                    return out
        except OSError:
            pass
    df = spark.read.parquet(f"{src}/orders.parquet")
    base = SHIFT_BASE["orders"]
    cbase = SHIFT_BASE["customer"]
    parts = []
    for i in range(factor):
        rep = df.withColumn(
            "o_orderkey", (F.col("o_orderkey") + F.lit(i * base)).cast("long")
        ).withColumn(
            "o_custkey", (F.col("o_custkey") + F.lit(i * cbase)).cast("long")
        )
        parts.append(rep)
    full = parts[0]
    for p in parts[1:]:
        full = full.unionByName(p)
    full = full.withColumn(
        "o_custkey",
        F.when(
            F.col("o_orderkey") % hot_mod == 0, F.lit(hot_key).cast("long")
        ).otherwise(F.col("o_custkey")),
    )
    full.write.mode("overwrite").parquet(out)
    with open(marker, "w") as f:
        f.write(want)
    return out
