#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/local_verify.py <out_dir> <sf_dir>
Reads each <out_dir>/<name>/ parquet (Spark result) and runs the
matching oracle SQL from <out_dir>/oracle_sql.json in DuckDB with the
sf_dir parquet tables registered as views. Compares: column names
(sorted), dtypes-compatible values, row multiset (rows sorted after
sorting columns by name). Exact equality — no float tolerance — so any
pass here is a strong signal for the driver's hash compare.
"""
import json, sys, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if isinstance(v, float) and v != v:
        return "NaN"
    return v

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_rel = con.execute(f"SELECT * FROM read_parquet({files!r})")
            spark_cols = [d[0] for d in spark_rel.description]
            spark_rows = spark_rel.fetchall()
            o_rel = con.execute(sql)
            o_cols = [d[0] for d in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if sorted(spark_cols) != sorted(o_cols):
            print(f"FAIL {name}: cols spark={sorted(spark_cols)} oracle={sorted(o_cols)}")
            n_fail += 1; continue
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        o_idx = [o_cols.index(c) for c in sorted(o_cols)]
        s_sorted = sorted([tuple(norm(r[i]) for i in s_idx) for r in spark_rows], key=repr)
        o_sorted = sorted([tuple(norm(r[i]) for i in o_idx) for r in o_rows], key=repr)
        if s_sorted == o_sorted:
            print(f"PASS {name} ({len(s_sorted)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: rows spark={len(s_sorted)} oracle={len(o_sorted)}")
            for a, b in list(zip(s_sorted, o_sorted))[:200]:
                if a != b:
                    print(f"  spark : {a}\n  oracle: {b}")
                    break
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
