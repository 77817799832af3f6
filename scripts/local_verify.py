#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness check.

Usage: python3 scripts/local_verify.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each query result parquet under <outDir>/<name>/ with an entry in
oracle_sql.json: run the SQL in DuckDB over the sfDir tables, sort columns
by name, sort rows, and compare values cell-by-cell (floats to 1e-9 rel).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def almost_eq(a, b):
    a, b = norm_cell(a), norm_cell(b)
    if isinstance(a, float) and isinstance(b, (int, float)):
        if a == b:
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = Path(out_dir, name)
        if not res_dir.exists():
            print(f"FAIL {name}: spark result missing")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        want = con.sql(oracle[name]).df()
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        # The driver's hash is exact over the SERIALIZED frames, so a
        # Decimal-object column on one side vs float64 on the other can
        # never hash-match even when every cell compares equal below
        # (the r5-r7 q256/q391/q392 class). Mirror that: object-vs-numeric
        # dtype splits are failures. (int64 vs float64 both serialize as
        # numerics and are left to the cell compare.)
        dt_bad = [c for c in got.columns
                  if (str(got[c].dtype) == "object") != (str(want[c].dtype) == "object")]
        if dt_bad:
            print(f"FAIL {name}: dtype kind mismatch on {dt_bad}: "
                  f"spark={[str(got[c].dtype) for c in dt_bad]} "
                  f"oracle={[str(want[c].dtype) for c in dt_bad]}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        grows = sorted(got.itertuples(index=False, name=None),
                       key=lambda r: tuple(str(x) for x in r))
        wrows = sorted(want.itertuples(index=False, name=None),
                       key=lambda r: tuple(str(x) for x in r))
        bad = None
        for i, (g, w) in enumerate(zip(grows, wrows)):
            for j, (gc, wc) in enumerate(zip(g, w)):
                if not almost_eq(gc, wc):
                    bad = (i, got.columns[j], gc, wc)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} oracle-checked of {len(list(Path(out_dir).glob('q*')))} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
