#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check_parity.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (Spark side) and runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
named after the testdata tables in <sfDir>. Sorts columns by name,
sorts rows, compares exactly. Dev tool only — never a library dep.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "b:%d" % v
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        return "f:%.10g" % v
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "y:" + v.hex()
    return "%s:%s" % (type(v).__name__[0], v)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            s = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
            scols, srows = [c.lower() for c in s.columns], s.fetchall()
            d = con.sql(oracle[name])
            dcols, drows = [c.lower() for c in d.columns], d.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
            n_fail += 1
            continue
        sk, dk = rows_key(scols, srows), rows_key(dcols, drows)
        if len(sk) != len(dk):
            print(f"FAIL {name}: rows spark={len(sk)} duck={len(dk)}")
            n_fail += 1
        elif sk != dk:
            bad = next(i for i, (a, b) in enumerate(zip(sk, dk)) if a != b)
            print(f"FAIL {name}: {len(sk)} rows, first diff @sorted[{bad}]:")
            print(f"  spark: {sk[bad][:220]}")
            print(f"  duck : {dk[bad][:220]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sk)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
