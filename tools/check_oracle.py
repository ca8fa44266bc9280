#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Dev tooling only (runs on the driver-side python stack, not part of the
Spark library). Usage:

    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify01

Compares each <outDir>/<name> parquet dump against the oracle SQL in
<outDir>/oracle_sql.json executed by DuckDB over the same tables.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    return [cols[i] for i in order], [tuple(norm(r[i]) for i in order) for r in data]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            ocols, orows = rows_of(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {e}")
            continue
        try:
            scols, srows = rows_of(
                con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"))
        except Exception as e:
            print(f"FAIL {name}: spark dump unreadable: {e}")
            continue
        if ocols != scols:
            print(f"FAIL {name}: columns differ oracle={ocols} spark={scols}")
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rowcount oracle={len(orows)} spark={len(srows)}")
            continue
        if orows != srows:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(orows, srows)) if a != b]
            print(f"FAIL {name}: {len(bad)}/{len(orows)} rows differ; first: "
                  f"row {bad[0][0]} oracle={bad[0][1]} spark={bad[0][2]}")
            continue
        # schema strictness: compare duckdb-inferred types of both sides
        ot = con.sql(f"DESCRIBE {sql}").fetchall()
        st = con.sql(
            f"DESCRIBE SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchall()
        od = sorted((r[0], r[1]) for r in ot)
        sd = sorted((r[0], r[1]) for r in st)
        note = "" if od == sd else f"  [type-drift: oracle={od} spark={sd}]"
        print(f"ok   {name} ({len(orows)} rows){note}")
        n_ok += 1
    print(f"== {n_ok}/{len(oracle)} matched")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
