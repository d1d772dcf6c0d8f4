"""Blocked fuzzy record linkage — edit-distance matching that never
goes all-pairs.

Additive capability next to J9 (`joins.fuzzy_relink`, exact-key url
repair): probabilistic-linkage-style matching for DIRTY keys — names
with typos, transposed characters, OCR noise.  The classic shape
(Fellegi-Sunter blocking + comparison):

1. **Block**: both sides key on cheap deterministic features — here
   ``(first-2-chars, length bucket)``.  A single-char typo changes a
   name's length by at most 1 and usually preserves the prefix, so
   candidate recall stays high while the join contracts from |L|×|R|
   to Σ|block_L|×|block_R|.  Multi-pass blocking (union of passes on
   different keys) recovers prefix-typo misses; each pass is the same
   operator with a different ``block_fn``.
2. **Compare**: ``levenshtein`` (JVM built-in, codegen) within the
   block, keep pairs ≤ ``max_dist``.
3. **Resolve**: best match per left record by (distance, right id) —
   a ``WindowGroupLimit``-shaped top-1, shuffled on the left id.

Skew note: blocks are bounded by construction only if the block key
is selective; a degenerate key (every name same prefix+length) squares
one block.  ``max_block`` drops oversized blocks exactly like the
MinHash-LSH hot-bucket cap (`dedup.minhash_lsh_candidates`) — such
blocks are better served by an extra blocking pass on a different key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def default_block_key(name: Column) -> Column:
    """(first-2-chars, length//4) — cheap, typo-tolerant."""
    n = F.lower(name)
    # explicit floor: Spark's double→int cast truncates while some SQL
    # engines round, so the oracle twin uses floor() too
    return F.struct(
        F.substring(n, 1, 2).alias("pfx"),
        F.floor(F.length(n) / 4).cast("int").alias("len_b"),
    )


def blocked_fuzzy_matches(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    name_col: str = "name",
    max_dist: int = 2,
    block_fn: Callable[[Column], Column] = default_block_key,
    max_block: int | None = None,
) -> DataFrame:
    """Candidate pairs (left_id, right_id, distance), blocked + verified."""
    lb = left.select(
        F.col(left_id),
        F.col(name_col).alias("__ln__"),
        block_fn(F.col(name_col)).alias("__bk__"),
    )
    rb = right.select(
        F.col(right_id),
        F.col(name_col).alias("__rn__"),
        block_fn(F.col(name_col)).alias("__bk__"),
    )
    if max_block is not None:
        w = Window.partitionBy("__bk__")
        lb = (
            lb.withColumn("__bn__", F.count(F.lit(1)).over(w))
            .filter(F.col("__bn__") <= max_block)
            .drop("__bn__")
        )
        rb = (
            rb.withColumn("__bn__", F.count(F.lit(1)).over(w))
            .filter(F.col("__bn__") <= max_block)
            .drop("__bn__")
        )
    pairs = lb.join(rb, "__bk__")
    # Thresholded levenshtein (r10, guide §1.2 step 2): the 3-arg form
    # (Spark 3.5+) runs the banded O(len·k) DP and returns -1 past the
    # bound, instead of the full O(len²) matrix per candidate pair.
    # Surviving rows carry the identical exact distance (the band is
    # exact up to the threshold), so `>= 0` keeps exactly the rows
    # `<= max_dist` kept before, with the same distance values.
    return pairs.select(
        left_id,
        right_id,
        F.levenshtein("__ln__", "__rn__", max_dist).alias("distance"),
    ).filter(F.col("distance") >= 0)


def best_match_per_left(matches: DataFrame, left_id: str, right_id: str) -> DataFrame:
    """Top-1 by (distance, right id) per left record — deterministic,
    compiles to a pre-shuffle group-limit."""
    w = Window.partitionBy(left_id).orderBy("distance", right_id)
    return (
        matches.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
