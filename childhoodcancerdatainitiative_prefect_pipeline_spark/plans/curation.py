"""The curation lifecycle (SURVEY.md §3.1) as one composed Spark plan.

The reference's ``runner`` flow (workflows/s3-Prefect-Pipeline.py:46-341)
stages CatchERR → ValidationRy → submission outputs through files on
local disk, re-parsing the workbook between stages.  Here the stages
are pure DataFrame→DataFrame functions over one shared plan: Catalyst
sees repair + validation + index derivation together, so the file
node is scanned once, repairs fold into the scan projection, and the
validation unions reuse the repaired columns.

Stages (all lazily composed — nothing materializes until the sink):

1. **repair** (CatchERR, src/s3_catcherry.py:22-1345): trim, NA-bank
   → null, md5 lowercasing, url-space encoding;
2. **derive** (F12/F20): file_type from the name cascade,
   file_mapping_level null-fill from the first present parent link;
3. **index** (ccdi_to_dcf_index, src/utils.py:1501-1566): the
   DCF-shaped projection (name/type/size/md5/url/acl/access) that
   downstream sinks (TSV per node, JSON run-metadata) consume;
4. **guid minting** (F15) attaches via
   :func:`functions.ids.deterministic_uuid5` — kept out of the
   oracle-checked path only because DuckDB 1.0 cannot express SHA-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaning import trim_all, url_encode_spaces
from ..functions.urls import infer_file_type

#: The reference's NA bank (src/utils.py:1101, s3_catcherry.py:63-85).
NA_BANK = ("NA", "na", "N/A", "n/a", "")


def na_to_null(c):
    col = F.col(c) if isinstance(c, str) else c
    return F.when(col.isin(*NA_BANK), F.lit(None)).otherwise(col)


def curate_file_node(file_node: DataFrame) -> DataFrame:
    """repair + derive + index projection for a file node.

    Expects columns ``file_id, file_name, file_size, md5sum,
    file_url, file_access, acl, sample_link, participant_link``;
    returns the DCF-index-shaped frame.
    """
    repaired = file_node.select(
        "file_id",
        trim_all("file_name").alias("file_name"),
        F.col("file_size"),
        F.lower(na_to_null(trim_all("md5sum"))).alias("md5sum"),
        url_encode_spaces(trim_all("file_url")).alias("file_url"),
        na_to_null(trim_all("file_access")).alias("file_access"),
        na_to_null(trim_all("acl")).alias("acl"),
        na_to_null("sample_link").alias("sample_link"),
        na_to_null("participant_link").alias("participant_link"),
    )
    derived = repaired.withColumns(
        {
            "file_type": infer_file_type("file_name"),
            # F20 — fill file_mapping_level from the first non-null
            # parent link (src/s3_catcherry.py:1010-1033)
            "file_mapping_level": F.when(
                F.col("sample_link").isNotNull(), F.lit("Sample")
            )
            .when(F.col("participant_link").isNotNull(), F.lit("Participant"))
            .otherwise(F.lit("Study")),
        }
    )
    return derived.select(
        "file_id",
        "file_name",
        "file_type",
        "file_size",
        "md5sum",
        "file_url",
        "file_access",
        "acl",
        "file_mapping_level",
    )


def index_violations(index: DataFrame) -> DataFrame:
    """ValidationRy pass over the curated index (md5 format, size>0,
    basename↔url agreement) — the §2.11 file-metadata family."""
    from ..functions.checks import is_valid_md5
    from ..functions.urls import url_basename

    checks = {
        "md5_format": F.col("md5sum").isNotNull() & ~is_valid_md5("md5sum"),
        "zero_size": F.col("file_size") <= 0,
        "url_basename_mismatch": url_basename("file_url") != F.col("file_name"),
    }
    parts = [
        index.filter(cond).select(
            F.lit("file").alias("node"),
            F.lit(rule).alias("rule"),
            F.lit("ERROR").alias("severity"),
            F.col("file_id").cast("string").alias("row_ref"),
        )
        for rule, cond in checks.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
