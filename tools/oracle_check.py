#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Reads the Verify output dir (one parquet dir per query + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf tables, and compares:
schema (column names sorted), row count, and a canonicalized value hash.

Usage: tools/oracle_check.py <sfDir> <verifyOutDir> [only1,only2,...]
(the optional third arg restricts the check to named queries — the dev
loop pairs it with SPARK_GRAFT_VERIFY_ONLY so a one-query verify run
doesn't print 170 missing-file FAILs)
"""
import sys, os, json, glob, math, hashlib
import duckdb
import pyarrow.parquet as pq


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full precision — we claim bit-identical doubles
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def table_rows(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    rows = sorted("|".join(canon(v) for v in row) for row in zip(*data))
    return cols, rows


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        qdir = f"{out_dir}/{name}"
        try:
            files = glob.glob(f"{qdir}/*.parquet") or glob.glob(f"{qdir}/part-*")
            spark_tbl = pq.read_table(files[0]) if len(files) == 1 else pq.read_table(qdir)
            duck_tbl = con.execute(sql).fetch_arrow_table()
            sc, sr = table_rows(spark_tbl)
            dc, dr = table_rows(duck_tbl)
            if sc != dc:
                print(f"FAIL {name}: schema spark={sc} duck={dc}")
                n_fail += 1
            elif len(sr) != len(dr):
                print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
                n_fail += 1
            elif sr != dr:
                diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
                print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
                n_fail += 1
            else:
                h = hashlib.sha256("\n".join(sr).encode()).hexdigest()[:12]
                print(f"PASS {name}: {len(sr)} rows, hash {h}")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: exception {type(e).__name__}: {e}")
            n_fail += 1
    # queries with no oracle → rows-only check
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        if name not in oracle and (not only or name in only):
            try:
                t = pq.read_table(qdir)
                print(f"ROWS {name}: {t.num_rows} rows (no oracle)")
            except Exception as e:
                print(f"FAIL {name}: unreadable: {e}")
                n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
        set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None))
