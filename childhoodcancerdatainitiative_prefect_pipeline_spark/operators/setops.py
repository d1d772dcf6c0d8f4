"""Set-operation pack (SURVEY.md §2.8, U1-U4).

``unionByName(allowMissingColumns=True)`` is the workhorse: the
reference constantly concatenates heterogeneous ``*_file`` sheets.
Unions are metadata-only in Spark (no shuffle); only the optional
dedup afterwards exchanges data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame

from .aggregates import dedup_keep_last


def union_hetero(frames: Sequence[DataFrame]) -> DataFrame:
    """U1 — union tables with different column sets.

    Reference: src/s3_ccdi_to_cds.py:219-246 (7 ``*_file`` sheets),
    src/s3_validationry_refactored.py:1112-1139.
    """
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def union_with_previous(
    current: DataFrame,
    previous: DataFrame,
    keys: Sequence[str],
    priority: Sequence[str | Column],
) -> DataFrame:
    """U2 — current + prior submission rows, keep-last on key.

    Reference: src/s3_ccdi_to_sra.py:1511-1527,
    src/s3_ccdi_to_dbgap.py:444-497.  pandas relies on concat order +
    ``keep='last'``; here priority is an explicit column (e.g. a
    submission-generation literal) so the winner is deterministic.
    """
    merged = current.unionByName(previous, allowMissingColumns=True)
    return dedup_keep_last(merged, keys, priority)


def except_keys(left: DataFrame, right: DataFrame, keys: Sequence[str]) -> DataFrame:
    """U3 — rows of left whose key is absent from right (anti-join).

    Reference: src/s3_ccdi_to_dbgap.py:288-307 (subjects in SC not in
    SSM).
    """
    return left.join(right.select(*keys).distinct(), on=list(keys), how="left_anti")
