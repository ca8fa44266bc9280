#!/usr/bin/env python3
"""DuckDB side of graft.tools.RollupCheck: computes the identical
order-insensitive rollup (row count + Σ first-15-hex-of-md5 as
bigint) over a query's ORACLE SQL, for outputs too large for
check_oracle.py's row-by-row fetchall compare.

Usage: rollup_check.py <sfDir> <oracle_sql.json> <query_name>
Prints `rows=<n> hashsum=<decimal>` — compare to RollupCheck's line.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

sfdir, sql_json, name = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()
# sf100-sized oracles (600M-row lineitem aggregates) exceed the
# in-memory default; let DuckDB spill rather than OOM
con.execute("SET temp_directory = '/tmp/duckdb_rollup_spill'")
con.execute("SET memory_limit = '60GB'")
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
sql = json.load(open(sql_json))[name]
# md5 of the ':'-joined string rendering, nulls as 'null' — identical
# to RollupCheck's concat_ws(":", coalesce(cast(c AS string),'null'))
probe = con.execute(f"SELECT * FROM ({sql}) LIMIT 0")
cols = [d[0] for d in probe.description]
rendered = " || ':' || ".join(
    f"coalesce(CAST(\"{c}\" AS VARCHAR), 'null')" for c in cols)
q = (f"SELECT count(*) AS rows, "
     f"sum(CAST(('0x' || substr(md5({rendered}), 1, 15)) AS BIGINT)) AS h "
     f"FROM ({sql})")
rows, h = con.execute(q).fetchone()
print(f"rows={rows} hashsum={h}")
