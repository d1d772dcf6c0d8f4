"""Driver-side report rendering (SURVEY.md §2: A12, F19, W4).

These run on *tiny aggregates only* — the pattern is: Spark computes
the group-by on executors, `toPandas()` pulls the handful of summary
rows, and the driver formats text.  Nothing here ever touches a fact
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: F19 — humanized byte sizes in reports (src/read_buckets.py:112).
_UNITS = ("B", "KB", "MB", "GB", "TB", "PB")


def humanize_bytes(n: float | int) -> str:
    """F19 — bytes → '12.3 GB' style string (1024 base)."""
    size = float(n)
    for unit in _UNITS:
        if abs(size) < 1024.0 or unit == _UNITS[-1]:
            return f"{size:.1f} {unit}" if unit != "B" else f"{int(size)} B"
        size /= 1024.0
    return f"{size:.1f} PB"


def to_markdown_summary(df: DataFrame, max_rows: int = 200) -> str:
    """A12 — render a (small) aggregate DataFrame as a markdown table.

    Reference: src/neo4j_data_tools.py:1519-1573 and
    src/read_buckets.py:109-151 render `groupby` summaries with
    ``to_markdown``.  ``max_rows`` guards against accidentally
    rendering a fact table.
    """
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"summary has more than {max_rows} rows — aggregate before rendering"
        )
    cols = list(pdf.columns)
    lines = [
        "| " + " | ".join(cols) + " |",
        "| " + " | ".join("---" for _ in cols) + " |",
    ]
    for _, row in pdf.iterrows():
        lines.append(
            "| " + " | ".join("" if row[c] is None else str(row[c]) for c in cols) + " |"
        )
    return "\n".join(lines)


def transpose_small(df: DataFrame, header_col: str | None = None) -> DataFrame:
    """W4 — transpose a constant-size frame (dbGaP DD construction,
    src/s3_ccdi_to_dbgap.py:414-420).

    Strictly driver-side: collect, flip, re-create.  Guarded to tiny
    frames because transposition is inherently non-distributed.
    """
    pdf = df.limit(1001).toPandas()
    if len(pdf) > 1000:
        raise ValueError("transpose_small is for constant-size frames only")
    if header_col is not None:
        pdf = pdf.set_index(header_col)
    out = pdf.transpose().reset_index().rename(columns={"index": "property"})
    out.columns = [str(c) for c in out.columns]
    spark = df.sparkSession
    return spark.createDataFrame(out.astype(str))


def dataset_card(manifest: DataFrame) -> str:
    """Render a dataset card from a training manifest
    (``queries.corpus_training_manifest`` schema: doc_id, source,
    lang_pred, n_tokens, flagged, cluster_id, is_canonical, split,
    keep).

    ONE aggregation pass computes every section's numbers (conditional
    aggregates — the manifest is scanned once, not per section); the
    tiny per-source / per-language / per-split frames render as
    markdown tables.  This is the publishable artifact at the end of
    the curation pipeline — the documentation half of dataset
    governance.
    """
    from pyspark.sql import functions as F

    totals = manifest.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.count(F.when(F.col("keep"), True)).alias("n_kept"),
        F.sum(F.when(F.col("keep"), F.col("n_tokens"))).alias("kept_tokens"),
        F.count(F.when(F.col("flagged"), True)).alias("n_flagged"),
        F.count(F.when(~F.col("is_canonical"), True)).alias("n_dupes"),
    ).collect()[0]
    by = {
        name: manifest.groupBy(col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.count(F.when(F.col("keep"), True)).alias("n_kept"),
        )
        .orderBy(col)
        for name, col in (
            ("Sources", "source"),
            ("Languages (predicted)", "lang_pred"),
            ("Splits", "split"),
        )
    }
    lines = [
        "# Dataset card",
        "",
        f"- documents: {totals.n_docs} ({totals.n_kept} kept)",
        f"- tokens: {totals.n_tokens} ({totals.kept_tokens} kept)",
        f"- safety-flagged: {totals.n_flagged}",
        f"- non-canonical duplicates: {totals.n_dupes}",
        "",
    ]
    for name, df in by.items():
        lines += [f"## {name}", "", to_markdown_summary(df), ""]
    return "\n".join(lines)
