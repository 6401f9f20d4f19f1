#!/usr/bin/env python3
"""Dev-loop oracle compare (mimics the driver's DuckDB gate, stricter).

Usage: python3 dev/compare.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ parquet (Spark result) and runs the matching SQL from
<outDir>/oracle_sql.json in DuckDB with views named after each testdata table.
Compares column-name-sorted, with rows in produced order (our queries all end
in a total ORDER BY). Exact equality incl. floats; Decimal compared by value.

TYPE-STRICT: also compares the DuckDB-reported column *types* of the Spark
result parquet against the oracle result types. The driver's gate hashes a
type-faithful canonical form, so DECIMAL(28,4) vs DECIMAL(38,4) or BIGINT vs
HUGEINT is a failure even when every value matches — round 1 shipped 12 such
mismatches that value-only comparison could not see.
"""
import sys, os, json
import duckdb

def norm(v):
    if isinstance(v, float):
        return ('f', v)  # exact bit compare
    return v

# The driver's canonical form normalizes integer widths up to 64-bit (Spark
# rank() INT32 vs DuckDB rank() BIGINT passes its gate) but NOT HUGEINT
# (int128 — a distinct arrow type) and NOT decimal precision/scale. Mirror
# that: one int64 family, everything else compared verbatim.
_INT64_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                 "UTINYINT", "USMALLINT", "UINTEGER"}

def norm_type(t):
    return "INT64" if t in _INT64_FAMILY else t

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
            # Relation API: .types preserves full decimal precision/scale,
            # unlike the DBAPI cursor description (which collapses to NUMBER).
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
            s_cols = list(spark_rel.columns)
            s_types = {c: str(t) for c, t in zip(s_cols, spark_rel.types)}
            s_rows = spark_rel.fetchall()
            duck_rel = con.sql(sql)
            d_cols = list(duck_rel.columns)
            d_types = {c: str(t) for c, t in zip(d_cols, duck_rel.types)}
            d_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} duck={sorted(d_cols)}")
            n_fail += 1
            continue
        type_mismatch = {c: (s_types[c], d_types[c])
                         for c in s_cols
                         if norm_type(s_types[c]) != norm_type(d_types[c])}
        if type_mismatch:
            print(f"FAIL {name}: result types differ (spark, duck): {type_mismatch}")
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
