"""Driver simulation — run the `__spark_entry__` contract the way the
round driver does and compare every query against its DuckDB oracle.

Usage: python scripts/verify_driver.py [sf_dir]   (default sf0.01)
Exit 0 = all green; prints one line per query.
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter

sys.path.insert(0, "/root/repo")
# Python WORKERS (the Arrow-UDF decode stages) resolve the package via
# PYTHONPATH, not the driver's sys.path — without this, running the
# script from any cwd other than the repo root fails exactly the 14
# multimodal entries with ModuleNotFoundError in the executor.
os.environ["PYTHONPATH"] = (
    "/root/repo" + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{v:.6g}"
    return str(v)


def row_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # A VANILLA session, deliberately: the round driver builds its own
    # SparkSession with none of the engine's conf, so faithfully
    # reproducing driver-environment failures (e.g. TIMESTAMP(NANOS)
    # reads) requires not using build_session() here (ADVICE r01).
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("verify-driver-vanilla")
        .getOrCreate()
    )

    n = entrymod.entry(spark).count()
    print(f"entry: {n} rows")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        names = {s.strip() for s in only.split(",") if s.strip()}
        queries = {k: v for k, v in queries.items() if k in names}
    failed = []

    # HUGEINT output guard (VERDICT r6 item 2): the driver fetches
    # oracle results through pandas, where DuckDB HUGEINT becomes
    # float64 and phantom-reds the value hash.  Fail fast on any
    # oracle whose plan types a HUGEINT/UHUGEINT output column.
    hugeint = []
    for name, sql in oracles.items():
        try:
            rel = con.sql(sql)
        except Exception:  # noqa: BLE001 — execution errors surface below
            continue
        for c, ty in zip(rel.columns, rel.types):
            if "HUGEINT" in str(ty).upper():
                hugeint.append((name, c, str(ty)))
    if hugeint:
        print(f"FAIL hugeint-output-guard: {hugeint}")
        failed.append("hugeint-output-guard")
    for name, fn in queries.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: spark raised {type(ex).__name__}: {ex}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(srows)} rows "
                  f"({time.time() - t0:.1f}s)")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            continue
        if sorted(scols) != sorted(ocols):
            failed.append(name)
            print(f"FAIL {name}: cols {sorted(scols)} != {sorted(ocols)}")
            continue
        sm, om = row_multiset(srows, scols), row_multiset(orows, ocols)
        if sm != om:
            failed.append(name)
            diff = list((sm - om).items())[:3] + list((om - sm).items())[:3]
            print(f"FAIL {name}: {len(srows)} vs {len(orows)} rows; "
                  f"sample diff {diff}")
            continue
        print(f"ok   {name}: {len(srows)} rows match ({time.time() - t0:.1f}s)")

    print(f"\n{len(queries) - len(failed)}/{len(queries)} green")
    if failed:
        print("FAILED:", failed)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
