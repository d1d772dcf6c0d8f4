"""Privacy risk profiling — k-anonymity / l-diversity over
quasi-identifiers.

Additive LLM-data-pipeline capability: before a corpus or a clinical
extract ships, the standard re-identification screen is (a)
k-anonymity — every quasi-identifier combination must describe at
least ``k`` records — and (b) l-diversity — within each combination
the sensitive attribute must take at least ``l`` distinct values
(otherwise group membership leaks the sensitive value even at high
k).  Complements the F7/PII regex scan (`functions/checks.py`), which
finds direct identifiers; this finds *combinational* identifiers.

Shape: ONE groupBy on the quasi-identifier tuple (map-side
combinable; output bounded by the QI-combination cardinality, far
below row count), then an optional broadcast join back for per-row
risk flags.  No windows, no self-joins — the 100 TB cost is one
shuffle of partially-aggregated QI tuples.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_profile(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
    k: int = 5,
    l_threshold: int = 2,
) -> DataFrame:
    """Per-QI-combination risk table.

    Returns one row per quasi-identifier combination with ``group_n``
    (the k of that cell), ``at_risk_k`` (cell smaller than ``k``),
    and — when ``sensitive_col`` is given — ``distinct_sensitive``
    plus ``at_risk_l`` (cell is sensitive-homogeneous below
    ``l_threshold``).  count_distinct is exact here; swap in
    ``approx_count_distinct`` for 100 TB profiling sweeps where ±2%
    on l is acceptable.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("group_n")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("distinct_sensitive")
        )
    out = df.groupBy(*quasi_cols).agg(*aggs)
    out = out.withColumn(
        "at_risk_k", F.when(F.col("group_n") < k, True).otherwise(False)
    )
    if sensitive_col is not None:
        out = out.withColumn(
            "at_risk_l",
            F.when(F.col("distinct_sensitive") < l_threshold, True).otherwise(
                False
            ),
        )
    return out


def flag_risky_rows(
    df: DataFrame, profile: DataFrame, quasi_cols: list[str]
) -> DataFrame:
    """Carry the cell-level flags back onto rows (suppression input).

    The profile is QI-cardinality-sized.  That cardinality is NOT
    bounded — distinct quasi-identifier combinations approach row
    count on high-entropy QI sets — so the join carries no forced
    broadcast hint; size-based selection (20m threshold + AQE)
    broadcasts typical profiles and demotes the pathological ones.
    (The eqNullSafe compound condition plans as BroadcastNestedLoop /
    shuffle join either way at the extremes; null-safe equi-keys keep
    it hash-joinable.)
    """
    flags = [c for c in ("at_risk_k", "at_risk_l") if c in profile.columns]
    # null-safe equality: groupBy keeps NULL quasi-identifier cells (and
    # those are often the MOST at-risk), but a plain equi-join would
    # never match them back
    prof = profile.select(
        *[F.col(c).alias(f"__p_{c}__") for c in quasi_cols], *flags
    )
    cond = None
    for c in quasi_cols:
        eq = df[c].eqNullSafe(F.col(f"__p_{c}__"))
        cond = eq if cond is None else (cond & eq)
    joined = df.join(prof, cond, "left")
    return joined.drop(*[f"__p_{c}__" for c in quasi_cols])
