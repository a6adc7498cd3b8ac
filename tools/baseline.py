#!/usr/bin/env python3
"""Single-node baseline measurement for BASELINE.md.

Runs every oracle SQL (the exact queries the correctness gate proved
hash-identical to the Spark results) in DuckDB against a testdata
scale factor and prints per-query + total seconds as JSON.

Usage: python3 tools/baseline.py [sfdir] [oracle_json]
  sfdir       default /root/testdata/sf0.1
  oracle_json default /tmp/graft_verify/oracle_sql.json (written by
              `sbt "runMain graft.Verify <sfdir> <outdir>"`)
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracle_path = sys.argv[2] if len(sys.argv) > 2 \
        else "/tmp/graft_verify/oracle_sql.json"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    times = {}
    for name, sql in sorted(oracle.items()):
        # two reps, min — symmetric with graft.Bench (first run pays
        # one-off plan/compile costs that amortize at scale)
        reps = []
        for _ in range(2):
            t0 = time.time()
            con.execute(sql).fetchall()
            reps.append(time.time() - t0)
        times[name] = round(min(reps), 4)
    print(json.dumps({"engine": "duckdb", "sf": sfdir,
                      "total": round(sum(times.values()), 3),
                      "queries": times}))


if __name__ == "__main__":
    main()
