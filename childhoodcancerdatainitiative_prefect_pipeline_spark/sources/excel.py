"""Excel workbook edge adapter (S1/S2).

Manifests are MB-scale workbooks — strictly a *driver-side* concern
(SURVEY.md §4: "never an executor concern").  The adapter converts
workbook sheets ↔ Spark DataFrames; everything downstream is pure
Spark.  openpyxl is import-gated: the engine works without it, Excel
I/O just raises a clear error.

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


def _require_openpyxl():
    try:
        import openpyxl  # noqa: F401

        return openpyxl
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "Excel I/O requires openpyxl, which is not installed in this "
            "environment. Convert workbooks to per-node TSV/parquet and use "
            "sources.files instead."
        ) from e


def workbook_to_tables(
    spark: SparkSession,
    path: str,
    sheets_to_avoid: tuple[str, ...] = SHEETS_TO_AVOID,
) -> dict[str, DataFrame]:
    """S1 — read every node sheet into a string-typed DataFrame."""
    openpyxl = _require_openpyxl()
    wb = openpyxl.load_workbook(path, read_only=True, data_only=True)
    out: dict[str, DataFrame] = {}
    for ws in wb.worksheets:
        if ws.title in sheets_to_avoid:
            continue
        rows = ws.iter_rows(values_only=True)
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
                data.append(tuple(vals[: len(header)]))
        schema = StructType([StructField(h, StringType(), True) for h in header])
        out[ws.title] = spark.createDataFrame(data, schema)
    wb.close()
    return out


def tables_to_workbook(
    tables: dict[str, DataFrame],
    template_path: str,
    out_path: str,
) -> None:
    """S2 — template-overlay write: data region from row 2, template
    column order, header/styles preserved."""
    openpyxl = _require_openpyxl()
    import shutil

    shutil.copyfile(template_path, out_path)
    wb = openpyxl.load_workbook(out_path)
    for sheet, df in tables.items():
        if sheet not in wb.sheetnames:
            continue
        ws = wb[sheet]
        header = [c.value for c in ws[1] if c.value is not None]
        ordered = [c for c in header if c in df.columns]
        pdf = df.select(*ordered).toPandas()
        for i, row in enumerate(pdf.itertuples(index=False), start=2):
            for j, col in enumerate(ordered):
                ws.cell(row=i, column=header.index(col) + 1, value=row[j])
    wb.save(out_path)
