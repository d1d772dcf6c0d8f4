"""Mergeable frequency sketches (Count-Min) as pure DataFrame aggs.

A Count-Min sketch (Cormode & Muthukrishnan 2005) is a depth×width
counter grid; every key increments one counter per row (depth
independent hashes) and an estimate reads the MIN of its counters —
never an underestimate.  The build is ONE map-side-combinable
aggregation producing at most depth·width rows regardless of input
size: the canonical "100 TB of events → kilobytes of state" shape,
and sketches from disjoint partitions/days merge by simple addition
(``cms_merge``).

Hashes are md5-slice-derived so a DuckDB oracle reproduces the grid
(including collisions) exactly; swap to ``xxhash64(key, seed=i)`` at
scale for the same shapes without the md5 cost.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(key: Column, row: int, width: int) -> Column:
    """Row-``row``'s bucket for ``key``: an independent 32-bit md5
    slice reduced mod width (row < 4 with a 128-bit md5)."""
    return (
        F.conv(F.substring(F.md5(key), 1 + 8 * row, 8), 16, 10).cast("long") % width
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 3, width: int = 256
) -> DataFrame:
    """Build the sketch: one row per touched (d, bucket) counter.

    ``explode`` fans each input row into ``depth`` grid cells, then a
    single groupBy counts — partial aggregation collapses each task's
    contribution to ≤ depth·width rows before the (tiny) shuffle.
    """
    if depth > 4:
        raise ValueError("md5 provides 4 independent 32-bit slices (depth <= 4)")
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), cms_bucket(key, d, width).alias("bucket"))
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .select(F.col("c")["d"].alias("d"), F.col("c")["bucket"].alias("bucket"))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (depth, width): counters add."""
    unioned = reduce(lambda a, b: a.unionByName(b), sketches)
    return unioned.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 256,
    out_col: str = "cms_est",
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``.

    Each key probes its ``depth`` cells and takes the min counter; the
    sketch (≤ depth·width rows) broadcasts, so the probe side never
    shuffles on anything but its own final grouping.  Counters the
    key never touched read as 0 via the left join's coalesce — only
    possible when the true count is 0, preserving est ≥ truth.
    """
    key_cols = list(keys.columns)
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), cms_bucket(key, d, width).alias("bucket"))
            for d in range(depth)
        ]
    )
    probes = keys.select(*key_cols, F.explode(cells).alias("c")).select(
        *key_cols, F.col("c")["d"].alias("d"), F.col("c")["bucket"].alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .withColumn("__cnt__", F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
        .groupBy(*key_cols)
        .agg(F.min("__cnt__").alias(out_col))
    )


# ---------------------------------------------------------------------------
# HyperLogLog with an EXACT integer harmonic sum (oracle-reproducible)
# ---------------------------------------------------------------------------

HLL_M = 256  # registers (b = 8 bucket bits)
_HLL_HASH_BITS = 60  # 15 md5 hex chars -> non-negative int64
_HLL_VALUE_BITS = _HLL_HASH_BITS - 8  # 52 bits feed the rank


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """(bucket, M) register table — ≤ 256 rows per group.

    Rank uses ``length(bin(r))`` — an exact integer log2 both here
    and in ANSI SQL — so no floating log ever touches the sketch.
    Registers merge across partitions/days/columns by MAX, and the
    build is one map-side-combinable groupBy: the fixed-size-state
    distinct-count shape for 100 TB inputs (Spark's native
    approx_count_distinct is the production twin; this one is
    bit-reproducible against the oracle).

    ``group_cols`` builds per-group register tables in the SAME pass
    — the multi-column profiling shape: explode the columns into
    (column_name, key) rows first and sketch them all in one scan
    instead of one scan per column.
    """
    g = list(group_cols or [])
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    r = F.floor(h / HLL_M).cast("long")
    rank = F.when(r == 0, F.lit(_HLL_VALUE_BITS + 1)).otherwise(
        F.lit(_HLL_VALUE_BITS) - F.length(F.bin(r)) + 1
    )
    return (
        df.select(*g, (h % HLL_M).alias("bucket"), rank.alias("rank"))
        .groupBy(*g, "bucket")
        .agg(F.max("rank").alias("M"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Cardinality estimate from (grouped) register tables.

    The harmonic sum is computed as Σ 2^(53−M) in EXACT int64 (every
    term a power of two ≤ 2^52, ≤ 256 terms → ≤ 2^60), so partial
    aggregation order cannot perturb the estimate — the same
    integer-exactness trick the decimal-routed sums use.  Standard
    small-range correction: linear counting when E ≤ 2.5m and empty
    registers exist.
    """
    g = list(group_cols or [])
    powers = F.array(
        *[F.lit(1 << i).cast("long") for i in range(_HLL_VALUE_BITS + 1)]
    )
    term = F.element_at(powers, (F.lit(_HLL_VALUE_BITS + 2) - F.col("M")).cast("int"))
    agg = registers.groupBy(*g).agg(
        F.count("*").alias("n_present"),
        F.sum(term).alias("s_present"),
    )
    v = F.lit(HLL_M) - F.col("n_present")  # empty registers
    s_total = F.col("s_present") + v * F.lit(1 << _HLL_VALUE_BITS).cast("long") * 2
    alpha = 0.7213 / (1.0 + 1.079 / HLL_M)
    e_raw = (
        F.lit(alpha * HLL_M * HLL_M)
        * F.lit(float(1 << (_HLL_VALUE_BITS + 1)))
        / s_total
    )
    est = F.when(
        (e_raw <= 2.5 * HLL_M) & (v > 0), F.lit(float(HLL_M)) * F.log(HLL_M / v)
    ).otherwise(e_raw)
    return agg.select(*g, F.round(est, 4).alias("hll_est"))
