"""DuckDB-oracle parity for every registered SQL-expressible query.

This mirrors the driver's t2 check: run the Spark query and the
oracle SQL on the same parquet tables, compare row count, column
names, and an order-insensitive value multiset.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from childhoodcancerdatainitiative_prefect_pipeline_spark.catalog import TESTDATA_TABLES
from childhoodcancerdatainitiative_prefect_pipeline_spark.queries import REGISTRY

ORACLE_NAMES = [n for n, q in REGISTRY.items() if q.oracle is not None]


def _duck(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetch_df()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{v:.6g}"
    # pandas turns SQL DATE into midnight datetime64 while Spark's
    # toPandas keeps datetime.date — the driver compares fetchall
    # (both sides datetime.date, equal); normalize the pandas
    # representation the same way so this harness agrees with it
    if isinstance(v, datetime.datetime) and (
        v.hour == v.minute == v.second == v.microsecond == 0
    ):
        return v.date().isoformat()
    return str(v)


def _multiset(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(row[c]) for c in cols) for _, row in pdf.iterrows()
    ]
    return sorted(rows)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, name):
    q = REGISTRY[name]
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    duck_pdf = _duck(sf_dir, q.oracle)
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    sm, dm = _multiset(spark_pdf), _multiset(duck_pdf)
    mismatches = [
        (a, b) for a, b in zip(sm, dm) if a != b
    ]
    assert sm == dm, f"{name}: value mismatch, first diffs: {mismatches[:3]}"


def test_all_queries_return_rows_or_valid_empty(spark, sf_dir):
    for name, q in REGISTRY.items():
        df = q.fn(spark, sf_dir)
        assert df.columns, f"{name}: no columns"
        df.limit(5).collect()  # must execute without error
