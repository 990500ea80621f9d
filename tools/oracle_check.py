#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: oracle_check.py <sf_dir> <verify_out_dir>

For each entry in <verify_out_dir>/oracle_sql.json:
  - run the SQL in DuckDB with every <sf_dir>/*.parquet registered as a view
  - read the Spark result from <verify_out_dir>/<name>.parquet
  - compare: schema (column names sorted), row count, and a value-level diff
    with columns sorted by name and rows sorted by all columns.

Exit 0 iff every query matches.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(
        (x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = []
    for name, sql in sorted(oracle.items()):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            failures.append((name, "spark output missing"))
            print(f"MISS  {name}: no spark parquet")
            continue
        try:
            duck = con.execute(sql)
            dcols = [d[0] for d in duck.description]
            drows = duck.fetchall()
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"ERR   {name}: duckdb: {str(e).splitlines()[0][:160]}")
            continue
        tbl = pq.read_table(spark_dir)
        scols = tbl.column_names
        srows = [tuple(r.values()) for r in tbl.to_pylist()]
        if sorted(dcols) != sorted(scols):
            failures.append((name, "schema"))
            print(f"FAIL  {name}: cols duck={sorted(dcols)} spark={sorted(scols)}")
            continue
        _, dnorm = canon(dcols, drows)
        _, snorm = canon(scols, srows)
        if len(dnorm) != len(snorm):
            failures.append((name, "rowcount"))
            print(f"FAIL  {name}: rows duck={len(dnorm)} spark={len(snorm)}")
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(dnorm, snorm)) if a != b]
        if bad:
            failures.append((name, "values"))
            i, a, b = bad[0]
            print(f"FAIL  {name}: {len(bad)}/{len(dnorm)} rows differ; first @{i}:")
            print(f"      duck : {a}")
            print(f"      spark: {b}")
        else:
            print(f"OK    {name}: {len(dnorm)} rows")
    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
