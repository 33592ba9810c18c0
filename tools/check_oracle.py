#!/usr/bin/env python3
"""Dev-only oracle checker, simulating the driver's t2 gate locally.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01

Reads each <name>/ parquet dump written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same
testdata tables, and compares: row count, column names (sorted),
dtypes-compatible values (rows sorted, exact equality; floats compared
exactly first, then with 1e-9 tolerance reported as NEAR).
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                r.append(("f", round(v, 9)))
            elif isinstance(v, bytes):
                r.append(("b", v))
            elif v is None:
                r.append(("n",))
            elif isinstance(v, list):
                r.append(("l", tuple(round(x, 6) if isinstance(x, float) else x for x in v)))
            else:
                r.append((type(v).__name__[:1], str(v)))
        out.append(tuple(r))
    return sorted(out)


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    npass = nfail = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = con.execute(sql).fetchall()
            want_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
            nfail += 1
            continue
        try:
            tbl = pads.dataset(f"{outdir}/{name}").to_table()
            got_cols = tbl.column_names
            got = [tuple(row[c] for c in got_cols) for row in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            nfail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} oracle={sorted(want_cols)}")
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
    sys.exit(main(sys.argv[1], sys.argv[2]))
