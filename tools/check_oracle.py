#!/usr/bin/env python3
"""Dev-side pre-check mimicking the driver's correctness gate:
reads the Verify output dir (per-query parquet + oracle_sql.json),
runs each oracle SQL in DuckDB over the sf parquet tables, and
compares values column-sorted + row-sorted. NOT part of the engine —
local tooling only.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        tbl = pq.read_table(files[0])
        # The driver's hash renders DECIMAL differently per engine
        # (float64 via pandas vs Decimal via parquet) — a decimal-typed
        # output column is an automatic driver hash mismatch even when
        # values agree, so fail it here before the driver does.
        dec_cols = [f.name for f in tbl.schema
                    if "decimal" in str(f.type).lower()]
        if dec_cols:
            print(f"FAIL {name}: decimal-typed output cols {dec_cols} "
                  "(driver hash renders these engine-dependently; emit "
                  "round(CAST(... AS DOUBLE), 6) instead)")
            n_fail += 1
            continue
        s_cols = tbl.column_names
        s_rows = [tuple(c[i].as_py() for c in tbl.columns)
                  for i in range(tbl.num_rows)]
        try:
            res = con.execute(oracle[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            n_fail += 1
            continue
        sc, sr = canon(s_cols, s_rows)
        dc, dr = canon(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}")
            n_fail += 1
        elif sr != dr:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(sr)} duckdb={len(dr)}")
            diff_s = [r for r in sr if r not in set(dr)][:3]
            diff_d = [r for r in dr if r not in set(sr)][:3]
            print(f"   cols: {sc}")
            print(f"   only-spark: {diff_s}")
            print(f"   only-duck : {diff_d}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sr)} rows)")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
