#!/usr/bin/env python3
"""Round-closing protocol (BASELINE.md): N interleaved full-suite pass
pairs — graft.Bench (sf0.1, local[32]) then duckdb_bench.py over the
same tables — min-of-pass per query on BOTH sides, then the closing
table: total ratio, outright-win list, weak list (>2x and >=0.5 s),
and an optional prior-min adjudication table for named lines.

Usage: tools/closing.py <passes> <oracle_sql.json> [out.json]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Each Spark pass parses Bench's TELEMETRY line (full names, full
precision); each DuckDB pass is duckdb_bench's median-of-3. Floors per
pass ride the output so a hot pass is self-identified.
"""
import json
import os
import subprocess
import sys


def run_spark(sf_dir):
    out = subprocess.run(
        ["bash", "tools/run_class.sh", "graft.Bench"],
        env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
        capture_output=True, text=True, timeout=3600).stdout
    for line in out.splitlines():
        if '"metric":"total"' in line and '"samples"' in line:
            d = json.loads(line)
            return d["queries"], d.get("floor")
    raise RuntimeError("no telemetry line in Bench output:\n" + out[-2000:])


def run_duck(sf_dir, oracle_path):
    out = subprocess.run(
        [sys.executable, "tools/duckdb_bench.py", sf_dir, oracle_path],
        capture_output=True, text=True, timeout=3600).stdout
    return json.loads(out.splitlines()[-1])["queries"]


def main(passes, oracle_path, out_path=None):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark_passes, duck_passes, floors = [], [], []
    for i in range(passes):
        qs, floor = run_spark(sf_dir)
        spark_passes.append(qs)
        floors.append(floor)
        print(f"# pass {i + 1}: spark total "
              f"{sum(v for v in qs.values() if v >= 0):.1f}s floor {floor}",
              file=sys.stderr, flush=True)
        duck_passes.append(run_duck(sf_dir, oracle_path))
        print(f"# pass {i + 1}: duckdb total "
              f"{sum(v for v in duck_passes[-1].values() if v >= 0):.1f}s",
              file=sys.stderr, flush=True)

    def min_of(passes_list, name):
        vals = [p[name] for p in passes_list if name in p and p[name] >= 0]
        return min(vals) if vals else -1.0

    # base-suite intersection: telemetry names == oracle names for qNNN
    common = sorted(set().union(*[set(p) for p in spark_passes]) &
                    set().union(*[set(p) for p in duck_passes]))
    rows = {}
    for n in common:
        s, d = min_of(spark_passes, n), min_of(duck_passes, n)
        if s >= 0 and d >= 0:
            rows[n] = {"spark": round(s, 3), "duck": round(d, 4),
                       "ratio": round(s / d, 2) if d > 0 else None}
    st = sum(r["spark"] for r in rows.values())
    dt = sum(r["duck"] for r in rows.values())
    wins = sorted([n for n, r in rows.items() if r["spark"] < r["duck"]])
    weak = sorted([n for n, r in rows.items()
                   if r["spark"] >= 0.5 and r["duck"] > 0
                   and r["spark"] > 2 * r["duck"]])
    result = {
        "passes": passes, "lines": len(rows),
        "spark_total": round(st, 2), "duck_total": round(dt, 2),
        "ratio": round(st / dt, 3) if dt else None,
        "floors": floors, "wins": wins, "weak": weak, "rows": rows,
    }
    if out_path:
        json.dump(result, open(out_path, "w"), indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "rows"},
                     indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2], *(sys.argv[3:] or []))
