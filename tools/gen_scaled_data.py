#!/usr/bin/env python3
"""Generate a data-dominated bench dataset: replicate the sf0.1 tables N×
(default 10) into benchdata/sf1x10 with per-replica key remapping so join
cardinalities scale linearly (replica r offsets every primary/foreign key
by r*100M; dim tables region/nation stay 1× with nationkey FKs untouched).

documents.text is token-salted per replica (token -> token_r for r>0) so
the corpus grows with realistic vocabulary instead of 10× exact
duplicates — otherwise dedup/LSH workloads would measure a pathological
duplicate-density explosion, not scale.

Usage: python3 tools/gen_scaled_data.py [factor] [outDir] [tables]
  tables: optional comma-separated subset (e.g. "embeddings") — the ANN
  x100/x250 smoke replicas only need one table, not a full 2 GB copy.
"""
import os
import sys

import duckdb

SF_DIR = "/root/testdata/sf0.1"
OFF = 100_000_000

TABLES = {
    "region": None,
    "nation": None,
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main(factor=10, out_dir=None, tables=None):
    out_dir = out_dir or os.path.join(
        os.path.dirname(__file__), "..", "benchdata", f"sf1x{factor}")
    os.makedirs(out_dir, exist_ok=True)
    wanted = set(tables.split(",")) if tables else set(TABLES)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for table, keys in TABLES.items():
        if table not in wanted:
            continue
        src = f"read_parquet('{SF_DIR}/{table}.parquet')"
        dst = os.path.join(out_dir, f"{table}.parquet")
        # Row groups are Spark's (and DuckDB's) parallelism unit — a
        # single-row-group file caps any scan at one task no matter the
        # split config. Target ~64 groups per table.
        n_rows = con.execute(f"SELECT count(*) FROM {src}").fetchone()[0]
        rg = max(2048, n_rows // 64)
        if keys is None:
            sql = (f"COPY (SELECT * FROM {src}) TO '{dst}' "
                   f"(FORMAT PARQUET, ROW_GROUP_SIZE {rg})")
        else:
            repl = [f"{k} + r * {OFF} AS {k}" for k in keys]
            if table == "events":
                # the source column is parquet TIMESTAMP(NANOS), which Spark
                # reads as nanos-since-epoch BIGINT (legacy nanosAsLong);
                # DuckDB would silently downcast to micros — keep raw nanos
                repl.append("epoch_ns(ts) AS ts")
            if table == "documents":
                repl.append(
                    "CASE WHEN r = 0 THEN text ELSE "
                    r"regexp_replace(text, '(\S+)', '\1_' || r, 'g') END AS text")
            rg = max(2048, (n_rows * factor) // 64)
            sql = (f"COPY (SELECT * REPLACE ({', '.join(repl)}) "
                   f"FROM {src}, range({factor}) rt(r)) "
                   f"TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})")
        con.execute(sql)
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{table}: {n} rows -> {dst}")


if __name__ == "__main__":
    f = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    main(f, sys.argv[2] if len(sys.argv) > 2 else None,
         sys.argv[3] if len(sys.argv) > 3 else None)
