#!/usr/bin/env python3
"""Diagnose driver-style hash mismatches: load Spark parquet via pandas
(pyarrow) and the DuckDB oracle via .df(), sort columns by name + rows,
and print dtype + repr of the first row, cell by cell, so representation
divergence (Decimal vs float, hugeint, date vs timestamp) is visible.

Usage: python3 tools/diag_hash.py /tmp/verify_r2 /root/testdata/sf0.01 q1_agg q3_join ...
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(outdir, sfdir, names):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    for name in names:
        print(f"===== {name}")
        spark = pd.read_parquet(f"{outdir}/{name}")
        want = con.execute(oracles[name]).df()
        s, w = canon(spark), canon(want)
        print("spark dtypes:", dict(s.dtypes.astype(str)))
        print("duck  dtypes:", dict(w.dtypes.astype(str)))
        # row-level exact repr compare
        ndiff = 0
        for i in range(min(len(s), len(w))):
            for c in s.columns:
                a, b = s[c].iloc[i], w[c].iloc[i]
                same = (a == b) if not (pd.isna(a) if not hasattr(a, '__len__') else False) else (pd.isna(b) if not hasattr(b, '__len__') else False)
                try:
                    same = bool(same)
                except Exception:
                    same = str(a) == str(b)
                if not same or type(a) is not type(b) or repr(a) != repr(b):
                    if ndiff < 6:
                        print(f"  row{i} col={c}: spark={type(a).__name__}:{a!r}  duck={type(b).__name__}:{b!r}")
                    ndiff += 1
        print(f"  {ndiff} cell-level repr diffs over {len(s)} rows")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
