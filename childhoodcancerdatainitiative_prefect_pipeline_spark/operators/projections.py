"""Projections / filters / predicates (SURVEY.md §2.2, P1-P6).

Every helper returns a new DataFrame built from declarative Column
expressions, so Catalyst pushes the predicates/pruning into the scan.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_bookkeeping_columns(df: DataFrame, extra: Sequence[str] = ()) -> DataFrame:
    """P1 — drop ``type``, ``id``, ``*.id`` bookkeeping columns.

    Reference: src/s3_ccdi_to_cds.py:157-172, src/s3_ccdi_to_index.py:118-133.
    """
    targets = [
        c
        for c in df.columns
        if c in {"type", "id"} or c.endswith(".id") or c in set(extra)
    ]
    return df.drop(*targets) if targets else df


def drop_empty_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """P2 — drop rows where every (subset) column is null.

    Reference: src/s3_catcherry.py:155-165, src/s3_validationry_refactored.py:105-119.
    """
    return df.na.drop(how="all", subset=list(subset) if subset else None)


def non_empty(df: DataFrame) -> bool:
    """P2 table-level gate — cheap emptiness check (limit-1 scan)."""
    return df.limit(1).count() > 0


def select_rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P3 — projection to ``mapping`` keys renamed to values.

    Reference: src/s3_ccdi_to_sra.py:140-174 (trim_seq_df) and the
    24-column rename map at :195-235.  Missing source columns become
    typed nulls so downstream unions line up.
    """
    cols = []
    present = set(df.columns)
    for src, dst in mapping.items():
        if src in present:
            cols.append(F.col(src).alias(dst))
        else:
            cols.append(F.lit(None).cast("string").alias(dst))
    return df.select(*cols)


def filter_in(df: DataFrame, column: str, allowed: Sequence[str]) -> DataFrame:
    """P4 — membership filter (``filetype in allowed``).

    Reference: src/s3_ccdi_to_sra.py:726-734.
    """
    return df.filter(F.col(column).isin(list(allowed)))


def filter_not_contains(df: DataFrame, column: str, needle: str) -> DataFrame:
    """P4 — exclusion filter (e.g. drop ``idc-open-data`` urls).

    Reference: src/s3_validationry_refactored.py:1396-1400.
    """
    return df.filter(
        F.col(column).isNull() | ~F.col(column).contains(needle)
    )


def drop_null_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """P5 — null-key filter before an outer join.

    Reference: src/s3_ccdi_to_cds.py:277 (``dropna(subset=[join_by])``).
    Catalyst infers this for inner joins; it must stay explicit for
    left joins to reproduce the reference's semantics.
    """
    cond = None
    for k in keys:
        c = F.col(k).isNotNull()
        cond = c if cond is None else (cond & c)
    return df.filter(cond) if cond is not None else df


def keep_rows_keyed_in(
    df: DataFrame, other: DataFrame, key: str, other_key: str | None = None
) -> DataFrame:
    """P6 — row subset by another table's keys (left-semi join).

    Reference: src/s3_ccdi_to_dbgap.py:236-247, :269-273.
    """
    ok = other_key or key
    return df.join(
        other.select(F.col(ok).alias(key)).distinct(), on=key, how="left_semi"
    )
