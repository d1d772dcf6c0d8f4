"""Z-order (Morton) clustering — multi-dimensional data skipping.

Sorting a table by one column makes parquet min/max row-group stats
tight for THAT column and useless for every other.  Interleaving the
bits of two key columns into one Morton key and range-partitioning +
sorting by it gives every file a small *rectangle* of the (a, b)
space, so predicates on EITHER dimension (or both) skip most files —
the layout trick behind Delta/Iceberg ``ZORDER BY``, expressed here
with plain Spark: a pure ``Column`` bit-interleave expression (JVM
codegen, no UDF) plus ``repartitionByRange``.

At 100 TB this is an ingest-time decision: pay one range shuffle at
write, and every later scan with a selective predicate on any of the
clustered dimensions reads a thin stripe of files instead of all of
them (min/max pruning happens in the parquet reader, no engine
cooperation needed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column | str, b: Column | str, bits: int = 21) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative longs.

    ``z = Σ_i bit(a,i)·2^(2i) + bit(b,i)·2^(2i+1)`` — a flat sum of
    ``2·bits`` shift/mask terms, all whole-stage-codegen.  21 bits per
    dimension fills 42 of the 63 usable sign-safe bits; inputs are
    masked so out-of-range values wrap rather than overflow.  For
    non-integer dimensions pass a rank/bucket (e.g. days since epoch,
    ``width_bucket`` of a double) — Z-ordering needs a bounded integer
    grid, not raw values.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    a = a.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    b = b.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    a: str,
    b: str,
    n_files: int = 16,
    bits: int = 21,
) -> None:
    """Cluster ``df`` by the Morton key of (a, b) into ``n_files``.

    ``repartitionByRange`` on the z-key gives contiguous, balanced
    key ranges (one range shuffle); ``sortWithinPartitions`` keeps
    row groups inside each file tight as well.  The helper column is
    dropped before writing — the layout is invisible to readers
    except through better pruning.
    """
    (
        df.withColumn("__z__", zorder_key(a, b, bits=bits))
        .repartitionByRange(n_files, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__")
        .write.mode("overwrite")
        .parquet(path)
    )


def equi_depth_bucket(
    df: DataFrame, col: str, n_buckets: int = 1024, out_col: str | None = None
) -> DataFrame:
    """Map a continuous column onto a bounded integer grid for Z-ordering.

    Morton keys need bounded integers; raw doubles (prices, scores,
    timestamps-as-epoch) also skew — uniform-width bins put most rows
    in a few cells and pruning dies.  Equi-depth bins fix both: one
    ``approx_percentile`` pass computes ``n_buckets`` boundaries
    (a mergeable sketch, no sort), they broadcast back as an array
    literal-of-one-row, and each row's bucket is the count of
    boundaries at or below its value (row-local ``aggregate`` over the
    broadcast array).  Every bucket holds ~1/n of the data regardless
    of distribution, which is exactly what the z-curve wants.
    """
    out_col = out_col or f"{col}_bucket"
    qs = [i / n_buckets for i in range(1, n_buckets)]
    # functions-API percentile_approx: arbitrary column names work
    # (an f-string into F.expr would break on names needing backticks)
    bounds = df.agg(
        F.percentile_approx(F.col(col), qs, 10000).alias("__bounds__")
    )
    return df.join(F.broadcast(bounds)).withColumn(
        out_col,
        F.aggregate(
            F.col("__bounds__"),
            F.lit(0).cast("long"),
            lambda acc, bnd: acc
            + F.when(F.col(col) >= bnd, 1).otherwise(0).cast("long"),
        ),
    ).drop("__bounds__")


def zorder_py(a: int, b: int, bits: int = 21) -> int:
    """Pure-Python reference for the tests (same masking semantics)."""
    a &= (1 << bits) - 1
    b &= (1 << bits) - 1
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z
