"""Excel workbook edge adapter (S1/S2).

Manifests are MB-scale workbooks — strictly a *driver-side* concern
(SURVEY.md §4: "never an executor concern").  The adapter converts
workbook sheets ↔ Spark DataFrames; everything downstream is pure
Spark.  The whole surface — read, plain write, AND style-preserving
template overlay — runs stdlib-only via ``xlsx_lite``; openpyxl is
used opportunistically for reads when present.

Reference behaviors mirrored:
- read every sheet string-typed with the NA bank, drop the ``type``
  bookkeeping column is NOT done here (callers decide), drop
  all-empty rows, skip instruction sheets
  (src/utils.py:1048-1089, src/s3_catcherry.py:56-146);
- write = template-overlay from row 2 preserving header/styles,
  column order from the template (src/s3_catcherry.py:1315-1339).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from ..catalog import NA_BANK

#: Sheets the reference never treats as node tables
#: (src/utils.py:1069).
SHEETS_TO_AVOID: tuple[str, ...] = (
    "README and INSTRUCTIONS",
    "Dictionary",
    "Terms and Value Sets",
)


def _iter_sheets(path: str):
    """Yield (sheet_name, row_iter) using openpyxl when present, else
    the stdlib xlsx_lite reader — same semantics either way."""
    try:
        import openpyxl
    except ImportError:
        from . import xlsx_lite

        for name, rows in xlsx_lite.read_xlsx(path).items():
            yield name, iter(rows)
        return
    wb = openpyxl.load_workbook(path, read_only=True, data_only=True)
    for ws in wb.worksheets:
        yield ws.title, ws.iter_rows(values_only=True)
    wb.close()


def workbook_version(path: str) -> str:
    """Extract the embedded template version from the ``README and
    INSTRUCTIONS`` sheet.

    The version string (``v1.9.1``) lives in the THIRD cell of the
    sheet's first row; the reference reads it as
    ``readme_df.columns[2][1:]`` — i.e. the leading ``v`` is stripped
    (``CheckCCDI.get_version`` src/utils.py:1119-1122,
    ``check_ccdi_version`` src/utils.py:335-345).  Raises
    ``ValueError`` when the sheet or the cell is missing/malformed.
    """
    for title, rows in _iter_sheets(path):
        if title != "README and INSTRUCTIONS":
            continue
        first = next(rows, None)
        if not first or len(first) < 3 or first[2] is None:
            raise ValueError(
                "README and INSTRUCTIONS sheet has no version cell "
                "(expected 'v<semver>' in the third cell of row 1)"
            )
        cell = str(first[2]).strip()
        if not cell.startswith("v"):
            raise ValueError(
                f"embedded version cell {cell!r} does not start with 'v'"
            )
        return cell[1:]
    raise ValueError("workbook has no 'README and INSTRUCTIONS' sheet")


def check_workbook_version(path: str, template_version: str) -> str:
    """The runner's step-2 gate (workflows/s3-Prefect-Pipeline.py:79-131):
    the manifest's embedded version must match the template the run
    was resolved against — mismatches abort before any node data is
    read.  Delegates the comparison (and its error text) to
    :func:`.schema_registry.version_gate`; returns the manifest
    version on success."""
    from .schema_registry import version_gate

    manifest_version = workbook_version(path)
    version_gate(manifest_version, template_version)
    return manifest_version


def workbook_to_tables(
    spark: SparkSession,
    path: str,
    sheets_to_avoid: tuple[str, ...] = SHEETS_TO_AVOID,
) -> dict[str, DataFrame]:
    """S1 — read every node sheet into a string-typed DataFrame."""
    out: dict[str, DataFrame] = {}
    for title, rows in _iter_sheets(path):
        if title in sheets_to_avoid:
            continue
        try:
            header = [str(h) if h is not None else "" for h in next(rows)]
        except StopIteration:
            continue
        data = []
        for r in rows:
            vals = [
                None
                if v is None or str(v).strip() in NA_BANK
                else str(v)
                for v in r
            ]
            if any(v is not None for v in vals):
                padded = list(vals[: len(header)])
                padded += [None] * (len(header) - len(padded))
                data.append(tuple(padded))
        schema = StructType([StructField(h, StringType(), True) for h in header])
        out[title] = spark.createDataFrame(data, schema)
    return out


#: Workbook sinks collect to the driver (`toPandas`): they exist for
#: the reference's MANIFEST artifacts (tens of thousands of rows at
#: most; Excel's own sheet format caps out at 1,048,576 rows anyway).
#: Past this bound, refuse with a pointer at the distributed TSV sink
#: instead of OOMing the driver (VERDICT r9 item 2 — the
#: transpose_small discipline applied to the Excel edges).
MAX_WORKBOOK_ROWS = 200_000


def _bounded_pandas(df: DataFrame, sheet: str, max_rows: int):
    """Collect ``df`` to pandas, refusing past ``max_rows``.

    The probe is ``limit(max_rows + 1)`` — a bounded scan, never a
    full count of an unboundedly large frame.
    """
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"sheet {sheet!r} exceeds {max_rows} rows: Excel workbooks "
            "are a driver-side manifest format. Write large tables "
            "with sources.files.write_node_tsvs (the distributed TSV "
            "sink), or raise max_rows= if this is deliberate."
        )
    return pdf


def write_workbook(
    tables: dict[str, DataFrame],
    out_path: str,
    max_rows: int = MAX_WORKBOOK_ROWS,
) -> None:
    """S2 (plain variant) — write node tables as a fresh workbook via
    the stdlib adapter; no template/styles, works without openpyxl."""
    from . import xlsx_lite

    sheets: dict[str, list[list]] = {}
    for name, df in tables.items():
        pdf = _bounded_pandas(df, name, max_rows)
        rows: list[list] = [list(pdf.columns)]
        for _, row in pdf.iterrows():
            rows.append([None if v is None else v for v in row.tolist()])
        sheets[name] = rows
    xlsx_lite.write_xlsx(out_path, sheets)


def tables_to_workbook(
    tables: dict[str, DataFrame],
    template_path: str,
    out_path: str,
    max_rows: int = MAX_WORKBOOK_ROWS,
) -> None:
    """S2 — template-overlay write: data region from row 2, template
    column order, header + styles preserved.

    Stdlib-only since r5 (`xlsx_lite.overlay_xlsx`): every zip member
    except the overlaid worksheets is copied byte-identical, so the
    template's styles/theme/number formats survive without openpyxl —
    the reference's pre-styled submission artifacts write anywhere
    the engine runs (src/create_submission.py overlay semantics).
    """
    from .xlsx_lite import overlay_xlsx, read_xlsx

    template = read_xlsx(template_path)
    sheets: dict[str, list[list]] = {}
    for sheet, df in tables.items():
        if sheet not in template or not template[sheet]:
            continue
        header = [h for h in template[sheet][0] if h is not None]
        ordered = [c for c in header if c in df.columns]
        pdf = _bounded_pandas(df.select(*ordered), sheet, max_rows)
        col_pos = {c: header.index(c) for c in ordered}
        rows = []
        for tup in pdf.itertuples(index=False):
            row: list = [None] * len(header)
            for j, col in enumerate(ordered):
                row[col_pos[col]] = tup[j]
            rows.append(row)
        sheets[sheet] = rows
    overlay_xlsx(template_path, out_path, sheets)
