#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching oracle_sql.json entry in DuckDB over the sfDir tables, and
compares: row count, column names, and a hash of the sorted rows
(values normalized: floats kept exact, None normalized).
"""
import sys, os, json, hashlib
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return "b:%d" % int(v)
    if isinstance(v, float):
        return "f:%r" % v
    if isinstance(v, int):
        return "i:%d" % v
    return "s:%s" % str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for name, sql in sorted(oracles.items()):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            results[name] = "MISSING_SPARK_RESULT"
            print(f"FAIL {name}: no spark result dir")
            continue
        try:
            st = ds.dataset(spark_dir, format="parquet").to_table()
            s_cols = [c.lower() for c in st.column_names]
            s_rows = [tuple(r[c] for c in st.column_names) for r in st.to_pylist()]
        except Exception as e:
            results[name] = f"SPARK_READ_ERROR: {e}"
            print(f"FAIL {name}: spark read: {e}")
            continue
        try:
            rel = con.sql(sql)
            d_cols = [c.lower() for c in rel.columns]
            d_rows = rel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {type(e).__name__}: {e}"
            print(f"FAIL {name}: oracle: {e}")
            continue
        if sorted(s_cols) != sorted(d_cols):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(s_cols)} duck={sorted(d_cols)}"
            print(f"FAIL {name}: {results[name]}")
            continue
        if len(s_rows) != len(d_rows):
            results[name] = f"ROWCOUNT spark={len(s_rows)} duck={len(d_rows)}"
            print(f"FAIL {name}: {results[name]}")
            continue
        sh, dh = table_hash(s_cols, s_rows), table_hash(d_cols, d_rows)
        if sh != dh:
            results[name] = "HASH_MISMATCH"
            print(f"FAIL {name}: hash mismatch ({len(s_rows)} rows)")
            # show first differing rows for debugging
            s_set = set("|".join(map(norm, r)) for r in s_rows)
            d_set = set("|".join(map(norm, r)) for r in d_rows)
            for x in sorted(s_set - d_set)[:3]:
                print(f"   spark-only: {x[:200]}")
            for x in sorted(d_set - s_set)[:3]:
                print(f"   duck-only : {x[:200]}")
        else:
            results[name] = "OK"
            print(f"OK   {name} ({len(s_rows)} rows)")
    n_ok = sum(1 for v in results.values() if v == "OK")
    print(f"\n{n_ok}/{len(results)} queries match")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
