"""Identifier minting (SURVEY.md §2.10 F15, §2.14).

Two flavors in the reference:

- random DCF guids ``dg.4DFC/<uuid4>`` minted once per distinct
  (file_url, md5sum) pair (src/s3_catcherry.py:1234-1262) — in Spark
  minted on the *distinct* pairs then joined back, so re-used rows
  share a guid and the generation never runs per-row on the fact
  table;
- deterministic RFC-4122 UUIDv5 ``uuid5(md5("ccdi"), study::node::key)``
  (src/s3_ccdi_to_tabbreakery.py:11-38) — expressible entirely with
  JVM-side built-ins (``sha1`` over a binary concat + hex surgery,
  see :func:`uuid5_expr`), so the hot path never crosses the Python
  boundary; a Pandas-UDF fallback is kept for API parity and both
  are golden-vector-checked against ``uuid.uuid5``.
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def uuid5_namespace(seed: str = "ccdi") -> uuid.UUID:
    """The reference derives its namespace as ``UUID(md5(seed))``
    (src/s3_ccdi_to_tabbreakery.py:11-16)."""
    import hashlib

    return uuid.UUID(hashlib.md5(seed.encode()).hexdigest())


def make_uuid5_udf(seed: str = "ccdi"):
    """Scalar Pandas UDF: name → str(uuid5(namespace, name)).

    Arrow-batched; verified bit-exact against ``uuid.uuid5`` by
    golden vectors in tests.
    """
    ns = uuid5_namespace(seed)

    @pandas_udf("string")
    def _uuid5(names: pd.Series) -> pd.Series:
        return names.map(lambda n: str(uuid.uuid5(ns, n)) if n is not None else None)

    return _uuid5


def uuid5_expr(name: Column | str, seed: str = "ccdi") -> Column:
    """F15 deterministic — RFC-4122 UUIDv5 as a pure Column expression.

    ``uuid5(ns, name)`` is the first 16 bytes of ``sha1(ns.bytes ||
    utf8(name))`` with the version nibble forced to ``5`` and the
    variant nibble to RFC-4122 (``10xx``).  All of that is hex-string
    surgery over built-ins (``sha1``/``substring``/``translate``), so
    it runs inside whole-stage codegen — no Python UDF, no Arrow
    transfer.  Bit-exact with ``uuid.uuid5`` (golden vectors in
    tests/test_operators.py).  Reference: src/s3_ccdi_to_tabbreakery.py:11-38.

    Variant nibble: ``(x & 0x3) | 0x8`` maps 0-f onto ``89ab`` cyclically,
    which is exactly ``translate(.., '0123456789abcdef', '89ab89ab89ab89ab')``.
    """
    n = F.col(name) if isinstance(name, str) else name
    ns = uuid5_namespace(seed)
    x = F.sha1(F.concat(F.lit(bytearray(ns.bytes)), F.encode(n, "UTF-8")))
    formatted = F.concat_ws(
        "-",
        F.substring(x, 1, 8),
        F.substring(x, 9, 4),
        F.concat(F.lit("5"), F.substring(x, 14, 3)),
        F.concat(
            F.translate(
                F.substring(x, 17, 1), "0123456789abcdef", "89ab89ab89ab89ab"
            ),
            F.substring(x, 18, 3),
        ),
        F.substring(x, 21, 12),
    )
    return F.when(n.isNotNull(), formatted)


def deterministic_uuid5(
    df: DataFrame,
    out_col: str,
    study_col: str | Column,
    node: str,
    key_col: str | Column,
    seed: str = "ccdi",
) -> DataFrame:
    """F15 deterministic — stamp ``uuid5(ns, f"{study}::{node}::{key}")``.

    Reference: src/s3_ccdi_to_tabbreakery.py:18-38 (and the DCC
    variant src/dcc_tabbreaker.py:12-41).
    """
    s = F.col(study_col) if isinstance(study_col, str) else study_col
    k = F.col(key_col) if isinstance(key_col, str) else key_col
    name = F.concat_ws("::", s, F.lit(node), k)
    return df.withColumn(out_col, uuid5_expr(name, seed))


def deterministic_guid_expr(name: Column | str, namespace: str = "ccdi-dcf") -> Column:
    """Deterministic v3-shaped UUID from ``md5(namespace || "::" || name)``.

    The reference mints DCF guids with ``uuid4()`` (src/utils.py:1397-1417),
    so there is no bit-parity to preserve; this engine substitutes a
    deterministic mint so re-runs are idempotent and the result is
    oracle-checkable (DuckDB's ``md5`` is VARCHAR-only, which is why the
    namespace is folded in textually rather than as RFC-4122 namespace
    bytes).  Same hex surgery as :func:`uuid5_expr`, version nibble ``3``.
    """
    n = F.col(name) if isinstance(name, str) else name
    x = F.md5(F.encode(F.concat(F.lit(namespace + "::"), n), "UTF-8"))
    formatted = F.concat_ws(
        "-",
        F.substring(x, 1, 8),
        F.substring(x, 9, 4),
        F.concat(F.lit("3"), F.substring(x, 14, 3)),
        F.concat(
            F.translate(
                F.substring(x, 17, 1), "0123456789abcdef", "89ab89ab89ab89ab"
            ),
            F.substring(x, 18, 3),
        ),
        F.substring(x, 21, 12),
    )
    return F.when(n.isNotNull(), formatted)


def mint_guids_per_group(
    df: DataFrame,
    group_cols: list[str],
    out_col: str = "dcf_indexd_guid",
    prefix: str = "dg.4DFC/",
    mint: Column | None = None,
) -> DataFrame:
    """F15 random — one fresh guid per distinct group, joined back.

    Reference: src/s3_catcherry.py:1234-1262
    (``groupby().apply(lambda g: "dg.4DFC/" + uuid4())``).  Only
    groups with NO existing guid receive a fresh mint; a group where
    some rows already carry a guid propagates that guid to its null
    rows, preserving the reference's one-guid-per-(file_url, md5sum)
    invariant — never two guids inside one group.

    ``mint`` overrides the fresh-guid expression (evaluated on the
    distinct-groups frame, so it may reference ``group_cols``); the
    default is the reference's random ``uuid4``.  Pass
    :func:`deterministic_guid_expr` over the group key for idempotent,
    oracle-checkable minting.
    """
    fresh = (
        F.concat(F.lit(prefix), F.expr("uuid()")) if mint is None
        else F.concat(F.lit(prefix), mint)
    )
    if out_col in df.columns:
        # One aggregation over the group keys yields both the group's
        # existing guid (if any) and the distinct-group frame to mint
        # on — a single shuffle, dimension-sized, broadcast back.
        groups = df.groupBy(*group_cols).agg(
            F.max(F.col(out_col)).alias("__existing__")
        )
        groups = groups.withColumn(
            "__guid__",
            F.coalesce(F.col("__existing__"), fresh),
        ).drop("__existing__")
        joined = df.join(groups, on=group_cols, how="left")
        return joined.withColumn(out_col, F.col("__guid__")).drop("__guid__")
    distinct = (
        df.select(*group_cols)
        .dropDuplicates(group_cols)
        .withColumn("__minted__", fresh)
    )
    joined = df.join(distinct, on=group_cols, how="left")
    return joined.withColumn(out_col, F.col("__minted__")).drop("__minted__")
