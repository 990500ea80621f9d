#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sf_dir> <verify_out_dir>

Reads <verify_out_dir>/<name>/ parquet (written by graft.Verify) and
<verify_out_dir>/oracle_sql.json, runs each oracle against DuckDB views of
the sf tables, and diffs: schema (column names), pandas dtypes, row count,
and values (sorted by all columns, column order normalized by name). Exit 1
on any mismatch. Dev-only tooling — the shipped library is pure Scala/Spark.

Round-17 change (the r16 verdict's Next #2): BOTH result sets are ingested
through DuckDB's pandas `.df()` path — the dtype-preserving rendering the
driver's comparator uses — instead of `fetchall()`. The two paths disagree
on any output type pandas renders differently from Python scalars: DuckDB
SUM(BIGINT) returns HUGEINT, which `.df()` renders float64 (810.0) while
`fetchall()` yields int 810 — so the t19 uncast-SUM miss passed two rounds
of local sweeps that the driver failed. With `.df()` ingestion the dtype
divergence fails locally (int64 vs float64 dtype mismatch).
"""
import json
import math
import os
import sys
import time

import duckdb
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Queries whose oracle emits a WIDE-decimal -> double cast (the one class
# where local DuckDB 1.0.0's two-step rounding lands 1 ulp off Spark's
# correctly-rounded BigDecimal cast while the DRIVER's DuckDB hash-matches).
# Only these may downgrade a <=1-ulp-everywhere diff to WARN; anywhere else
# a 1-ulp diff is a genuine cross-engine formula divergence (exactly the
# round-5 q54 class) and must FAIL so it's fixed before the driver sees it.
# q03 joined the list in round 7: its dsum column hits the same cast class
# at sf0.001/sf0.1 (value-dependent; exact at the driver's sf0.01 gate).
ULP_WARN_ALLOWLIST = {"q02_agg_groupby", "q14_topk_revenue",
                      "q03_join_inner"}


def canon(v):
    if isinstance(v, (np.ndarray, list, tuple)):
        # The driver's comparator sorts rows with pandas.sort_values, which
        # raises `unhashable type: numpy.ndarray` on array cells (round-2
        # g01/g02/m03/s04). Mirror that: array-typed output is a hard FAIL —
        # queries must emit scalar columns (explode, join, or to_json).
        raise ValueError(
            "array-typed value in result (driver comparator cannot sort "
            "arrays — emit scalars: explode / concat_ws / to_json)")
    if isinstance(v, float):  # np.float64 subclasses float
        if math.isnan(v):
            return "NaN"
        # repr() is ulp-exact (shortest round-trip form): the driver's hash
        # is ulp-sensitive, and the earlier 10-sig-digit form masked exactly
        # the class of final-ulp divergence that cost q54 in round 5.
        return repr(float(v))
    return str(v)



def within_one_ulp(s_rows, d_rows, sidx, didx):
    """True iff rows pair up (sorted on a coarse 10-sig-digit key) with
    every cell equal or, for floats, within 1 ulp."""
    def coarse(v):
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else f"{v:.10g}"
        return str(v)
    s_sorted = sorted((tuple(r[i] for i in sidx) for r in s_rows),
                      key=lambda t: tuple(coarse(v) for v in t))
    d_sorted = sorted((tuple(r[i] for i in didx) for r in d_rows),
                      key=lambda t: tuple(coarse(v) for v in t))
    for a, b in zip(s_sorted, d_sorted):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y and abs(x - y) > math.ulp(max(abs(x), abs(y))):
                    return False
            elif canon(x) != canon(y):
                return False
    return True


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    # Round-8 lesson: a green sweep claim is only valid if it postdates the
    # data it swept — the driver regenerates /root/testdata between rounds,
    # and round 8's closing claim was made against data that no longer
    # existed at judging time. Stamp both times into the artifact.
    def iso(t):
        return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(t))
    newest = max(os.path.getmtime(os.path.join(dp, f))
                 for dp, _, fs in os.walk(sf_dir) for f in fs)
    print(f"testdata newest mtime: {iso(newest)}; sweep run at: "
          f"{iso(time.time())} (claim valid only if run > mtime)")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            spark_cols = list(spark_df.columns)
            spark_rows = list(spark_df.itertuples(index=False, name=None))
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            failures += 1
            continue
        try:
            duck_df = con.execute(sql).df()
            duck_cols = list(duck_df.columns)
            duck_rows = list(duck_df.itertuples(index=False, name=None))
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue

        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: schema mismatch spark={sorted(spark_cols)} "
                  f"duck={sorted(duck_cols)}")
            failures += 1
            continue
        # The driver's hash is RENDERING-sensitive, not width-sensitive:
        # int32 5 vs int64 5 compare equal (the s-gates' int32 rank vs
        # BIGINT oracle has been driver-green for 15 rounds), but int64
        # 810 vs float64 810.0 hash-differ (t19, rounds 15-16: uncast SUM
        # -> HUGEINT -> pandas float64). Compare pandas dtype KINDS
        # (i/u/f/b/O/M), which distinguishes exactly the rendering classes.
        def kind(df, c):
            k = df[c].dtype.kind
            return "i" if k == "u" else k
        spark_types = {c: kind(spark_df, c) for c in spark_cols}
        duck_types = {c: kind(duck_df, c) for c in duck_cols}
        type_diffs = [(c, spark_types[c], duck_types[c])
                      for c in sorted(spark_cols)
                      if spark_types[c] != duck_types[c]]
        if type_diffs:
            print(f"FAIL {name}: pandas dtype mismatch (col, spark, duck): "
                  f"{type_diffs}")
            failures += 1
            continue
        # normalize column order by name, then sort rows
        sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
        didx = [duck_cols.index(c) for c in sorted(duck_cols)]
        try:
            s_norm = sorted(tuple(canon(r[i]) for i in sidx)
                            for r in spark_rows)
            d_norm = sorted(tuple(canon(r[i]) for i in didx)
                            for r in duck_rows)
        except ValueError as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if len(s_norm) != len(d_norm):
            print(f"FAIL {name}: rowcount spark={len(s_norm)} duck={len(d_norm)}")
            failures += 1
            continue
        if s_norm != d_norm:
            # Local DuckDB (1.0.0) casts wide decimals to double in two
            # roundings (int128->double, then *10^-scale), which lands 1 ulp
            # off Java/Spark's correctly-rounded BigDecimal cast on some
            # sums; the DRIVER's DuckDB hash-matched those same queries
            # (r5: q02/q14 green). A <=1-ulp-everywhere mismatch is
            # therefore a local-cast artifact: WARN, don't fail. Anything
            # wider is a real divergence.
            if name in ULP_WARN_ALLOWLIST and \
                    within_one_ulp(spark_rows, duck_rows, sidx, didx):
                n_diff = sum(1 for a, b in zip(s_norm, d_norm) if a != b)
                print(f"WARN {name}: {len(s_norm)} rows; {n_diff} rows differ "
                      f"by <=1 ulp (local decimal->double cast artifact; "
                      f"driver artifact is authoritative)")
                continue
            bad = [(a, b) for a, b in zip(s_norm, d_norm) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {bad}")
            failures += 1
            continue
        print(f"OK   {name}: {len(s_norm)} rows")
    print(f"\n{len(oracles) - failures}/{len(oracles)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
