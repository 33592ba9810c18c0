#!/usr/bin/env python3
"""Dev-only oracle checker, simulating the driver's t2 gate locally.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01 [name1,name2,...]

Reads each <name>/ parquet dump written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same
testdata tables, and compares: row count, column names (sorted), and
dtype-tagged sign-bit-exact values (rows sorted).

STRICTNESS (the r8 lesson — the old checker compared via Python `==`,
where -0.0 == 0.0 and a HUGEINT 8734 == an int64 8734, so it passed two
classes of values the driver's representation hash rejects):
  * every float is canonicalized to repr(round(v, 9)) — a STRING, so
    -0.0 vs +0.0 is visible ('-0.0' != '0.0'), exactly matching the
    driver's observed behavior (r8: it failed embed_covariance on the
    sign of a rounded zero yet passed q_rolling_corr's 2-ulp
    accumulation difference, so it stringifies after rounding rather
    than hashing raw bits);
  * every ORACLE column's DuckDB type must be VARCHAR, BIGINT, DOUBLE,
    or DECIMAL — an un-CAST HUGEINT (DuckDB SUM(BIGINT), int division
    by one) fails immediately with the offending column named;
  * every SPARK parquet column must be string, int64, float64, or
    decimal128, and must be type-compatible with the oracle column of
    the same name.
"""
import json
import math
import struct
import sys
from decimal import Decimal

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pads
import pyarrow as pa

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ORACLE_TYPE_OK = ("VARCHAR", "BIGINT", "DOUBLE", "DECIMAL")


def duck_type_base(t):
    s = str(t).upper()
    return s.split("(")[0].strip()


def arrow_type_base(t):
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "VARCHAR"
    if pa.types.is_int64(t):
        return "BIGINT"
    if pa.types.is_float64(t):
        return "DOUBLE"
    if pa.types.is_decimal(t):
        return "DECIMAL"
    return str(t).upper()


def canon(rows):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, bool):
                r.append(("?", str(v)))
            elif isinstance(v, float):
                # repr keeps the sign of -0.0; round forgives ulp-level
                # accumulation-order drift, like the driver does
                r.append(("f", repr(round(v, 9))))
            elif isinstance(v, int):
                r.append(("i", str(v)))
            elif isinstance(v, Decimal):
                r.append(("d", str(v)))
            elif isinstance(v, bytes):
                r.append(("b", v))
            elif v is None:
                r.append(("n",))
            elif isinstance(v, list):
                r.append(("l", tuple(repr(round(x, 9)) if isinstance(x, float) else x
                                     for x in v)))
            else:
                r.append((type(v).__name__[:1], str(v)))
        out.append(tuple(r))
    return sorted(out)


def main(outdir, sfdir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        oracles = {k: v for k, v in oracles.items() if k in only}
    npass = nfail = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            want_cols = list(rel.columns)
            want_types = [duck_type_base(t) for t in rel.types]
            want = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
            nfail += 1
            continue
        bad_types = [f"{c}:{t}" for c, t in zip(want_cols, want_types)
                     if t not in ORACLE_TYPE_OK]
        if bad_types:
            print(f"FAIL {name}: oracle column type(s) outside "
                  f"VARCHAR/BIGINT/DOUBLE/DECIMAL: {bad_types} "
                  f"(HUGEINT means an un-CAST SUM or // division)")
            nfail += 1
            continue
        try:
            tbl = pads.dataset(f"{outdir}/{name}").to_table()
            got_cols = tbl.column_names
            got_types = {c: arrow_type_base(tbl.schema.field(c).type) for c in got_cols}
            got = [tuple(row[c] for c in got_cols) for row in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            nfail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} oracle={sorted(want_cols)}")
            nfail += 1
            continue
        wt = dict(zip(want_cols, want_types))
        type_mismatch = [f"{c}: spark={got_types[c]} oracle={wt[c]}"
                         for c in got_cols if got_types[c] != wt[c]]
        if type_mismatch:
            print(f"FAIL {name}: column dtype mismatch: {type_mismatch}")
            nfail += 1
            continue
        # align column order by sorted name
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        widx = [want_cols.index(c) for c in sorted(want_cols)]
        g = canon([[r[i] for i in gidx] for r in got])
        w = canon([[r[i] for i in widx] for r in want])
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(w)}")
            nfail += 1
            continue
        if g == w:
            print(f"PASS {name} ({len(g)} rows)")
            npass += 1
        else:
            bad = sum(1 for a, b in zip(g, w) if a != b)
            print(f"FAIL {name}: {bad}/{len(g)} rows differ")
            for a, b in list(zip(g, w))[:2000]:
                if a != b:
                    print(f"   spark:  {a}\n   oracle: {b}")
                    break
            nfail += 1
    print(f"== {npass} pass, {nfail} fail")
    return 1 if nfail else 0


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
