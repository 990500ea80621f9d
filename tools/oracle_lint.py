#!/usr/bin/env python3
"""Registry-wide oracle OUTPUT-TYPE lint (round-17, verdict Next #2b).

Usage:
    python3 tools/oracle_lint.py <sf_dir> <verify_out_dir>
    python3 tools/oracle_lint.py --selftest

DESCRIBEs every oracle in <verify_out_dir>/oracle_sql.json against DuckDB
views of the sf tables and asserts every output column's DuckDB type is in
the PORTABLE set — the types whose pandas rendering matches Spark's parquet
output dtype-for-dtype. The class this kills: a bare `SUM(bigint)` returns
HUGEINT, which pandas renders float64 (810.0) while Spark writes int64
(810); rows/schema pass, the value hash fails, and only on the driver
(t19, rounds 15-16 — two rounds of local-green/driver-red). DESCRIBE is
plan-only, so the lint is instant even on expensive oracles.

Exit 1 on any non-portable output column.
"""
import json
import os
import sys

import duckdb

# single source of truth for the fixture table list (a table added to
# the replica but not here would lint every referencing oracle as
# "DESCRIBE failed")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_check import TABLES  # noqa: E402

# DuckDB result types whose .df() rendering is dtype-identical to Spark's
# parquet output read back the same way. HUGEINT/UHUGEINT (bare SUM of
# BIGINT, bare integer PRODUCT) render float64 and are banned; unscaled or
# odd-scale DECIMALs are banned because Spark must emit the exact matching
# scale — the registry's one sanctioned decimal shape is DECIMAL(18,6).
PORTABLE = {"BIGINT", "INTEGER", "DOUBLE", "VARCHAR", "BOOLEAN", "DATE",
            "TIMESTAMP", "DECIMAL(18,6)"}


def lint(con, oracles):
    bad = []
    for name, sql in sorted(oracles.items()):
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            bad.append((name, "*", f"DESCRIBE failed: {e}"))
            continue
        for cname, ctype, *_ in cols:
            if ctype not in PORTABLE:
                bad.append((name, cname, ctype))
    return bad


def connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def selftest():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, n BIGINT)")
    cases = {
        # the t19 class: uncast SUM -> HUGEINT. Must be flagged.
        "bad_uncast_sum": "SELECT doc_id, SUM(n) AS s FROM documents "
                          "GROUP BY doc_id",
        # odd decimal scale. Must be flagged.
        "bad_decimal": "SELECT CAST(1.5 AS DECIMAL(10,2)) AS d",
        # the sanctioned shapes. Must pass.
        "good": "SELECT doc_id, CAST(SUM(n) AS BIGINT) AS s, "
                "CAST(1.5 AS DECIMAL(18,6)) AS d, 'x' AS v, TRUE AS b "
                "FROM documents GROUP BY doc_id",
    }
    bad = lint(con, cases)
    flagged = {n for n, _, _ in bad}
    assert flagged == {"bad_uncast_sum", "bad_decimal"}, (flagged, bad)
    assert ("bad_uncast_sum", "s", "HUGEINT") in bad, bad
    print("selftest OK: uncast SUM flagged as HUGEINT, odd decimal "
          "flagged, portable shapes pass")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = connect(sf_dir)
    bad = lint(con, oracles)
    for name, cname, ctype in bad:
        print(f"NONPORTABLE {name}.{cname}: {ctype}")
    print(f"\n{len(oracles) - len({n for n, _, _ in bad})}/{len(oracles)} "
          f"oracles portable")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
