#!/usr/bin/env python3
"""BASELINE timing: run each oracle SQL in DuckDB on the sf tables.

Protocol mirrors graft.Bench: 1 warm-up + 3 timed runs, median per query.
Usage: tools/duckdb_bench.py <sfDir> <oracle_sql.json> [threads]
"""
import sys, os, json, glob, time, statistics
import duckdb


def main(sf_dir, oracle_path, threads="32"):
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    out = {}
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            con.execute(sql).fetchall()  # warm-up
            samples = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                samples.append(time.perf_counter() - t0)
            out[name] = statistics.median(samples)
        except Exception as e:
            out[name] = -1.0
            print(f"# {name} failed: {e}", file=sys.stderr)
    total = sum(v for v in out.values() if v >= 0)
    print(json.dumps({"metric": "duckdb_total", "value": total, "unit": "sec",
                      "queries": out, "sf": sf_dir}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *(sys.argv[3:] or []))
