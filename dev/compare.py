#!/usr/bin/env python3
"""Dev-loop oracle compare (mimics the driver's DuckDB gate, stricter).

Usage: python3 dev/compare.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ parquet (Spark result) and runs the matching SQL from
<outDir>/oracle_sql.json in DuckDB with views named after each testdata table.
Compares column-name-sorted, with rows in produced order (our queries all end
in a total ORDER BY). Exact equality incl. floats; Decimal compared by value.
"""
import sys, os, json, math
import duckdb

def norm(v):
    if isinstance(v, float):
        return ('f', v)  # exact bit compare
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            spark_rel = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            s_cols = [d[0] for d in spark_rel.description]
            s_rows = spark_rel.fetchall()
            duck_rel = con.execute(sql)
            d_cols = [d[0] for d in duck_rel.description]
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_fail += 1
            continue
        s_idx = [s_cols.index(c) for c in sorted(s_cols)]
        d_idx = [d_cols.index(c) for c in sorted(d_cols)]
        s_sorted = [tuple(norm(r[i]) for i in s_idx) for r in s_rows]
        d_sorted = [tuple(norm(r[i]) for i in d_idx) for r in d_rows]
        if len(s_sorted) != len(d_sorted):
            print(f"FAIL {name}: rowcount spark={len(s_sorted)} duck={len(d_sorted)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)} rows differ; first at {i}:\n  spark={a}\n  duck ={b}\n  cols ={sorted(s_cols)}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_sorted)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
