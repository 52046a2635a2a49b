#!/usr/bin/env python3
"""Matched warm-cache DuckDB replay of the oracle SQL catalog.

Usage: python3 tools/bench_duckdb.py <oracle_sql.json> <sf_dir> [out.json]

Single-threaded DuckDB (the honest single-node baseline, matching the
methodology recorded in PLANS.md since round 2), views over the same
parquet the Spark bench reads. Each query runs twice: the first execution
warms the OS page cache + DuckDB's internal state, the second is timed.
Emits one JSON object {"total": secs, "queries": {name: secs}}.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    oracle_path, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    out_path = Path(sys.argv[3]) if len(sys.argv) > 3 else None
    oracle = json.loads(oracle_path.read_text())
    con = duckdb.connect()
    con.execute("SET threads TO 1")
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    times = {}
    for name, sql in sorted(oracle.items()):
        try:
            con.execute(sql).fetchall()  # warm (cache + catalog + JIT-ish)
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            secs = time.perf_counter() - t0
        except Exception as e:
            print(f"[duckdb] {name} FAILED: {e}", file=sys.stderr)
            secs = -1.0
        times[name] = secs
        print(f"[duckdb] {name:32s} {secs:8.3f} s", file=sys.stderr)
    result = {"total": sum(v for v in times.values() if v > 0), "queries": times}
    text = json.dumps(result)
    if out_path:
        out_path.write_text(text)
    print(text)


if __name__ == "__main__":
    main()
