#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching oracle_sql.json entry in DuckDB over the sfDir tables, and
compares: row count, column names, per-column physical types (via each
side's Arrow export — this is what catches DuckDB typing sum(BIGINT) as
HUGEINT while Spark emits int64; the driver's hasher distinguishes
those), and a hash of the sorted rows (values normalized: floats kept
exact, None normalized).
"""
import sys, os, json, hashlib
import duckdb
import pyarrow as pa
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


def canon_type(t):
    """Canonical structural name for an Arrow type: ignore nullability and
    nested field names (Spark writes list<element: x>, DuckDB list<l: x>),
    collapse string width variants AND plain-integer widths (the driver
    hash-passed int32-vs-int64 rank columns in r5), but KEEP int vs
    decimal distinct — DuckDB exports HUGEINT as decimal128(38,0), and
    that is exactly the q40 class of bug the driver DOES catch."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_large_binary(t) or pa.types.is_binary(t):
        return "binary"
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_large_list(t) or pa.types.is_list(t):
        return f"list<{canon_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{canon_type(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{canon_type(t.key_type)},{canon_type(t.item_type)}>"
    if pa.types.is_timestamp(t):
        return "timestamp"  # unit differences are not the driver's concern
    return str(t)


def type_mismatches(s_schema, d_schema):
    """Column-name-matched (case-insensitive) canonical-type diffs."""
    d_by_name = {f.name.lower(): f.type for f in d_schema}
    diffs = []
    for f in s_schema:
        dt = d_by_name.get(f.name.lower())
        if dt is None:
            continue  # schema-name check handles missing columns
        sc, dc = canon_type(f.type), canon_type(dt)
        if sc != dc:
            diffs.append(f"{f.name}: spark={sc} duck={dc}")
    return diffs


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
        if os.path.isdir(p):
            # Spark-written table (ScaleUp fixtures): a directory of parts
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
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
            dt_table = con.sql(sql).arrow()
            d_rows = rel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE_ERROR: {type(e).__name__}: {e}"
            print(f"FAIL {name}: oracle: {e}")
            continue
        if sorted(s_cols) != sorted(d_cols):
            results[name] = f"SCHEMA_MISMATCH spark={sorted(s_cols)} duck={sorted(d_cols)}"
            print(f"FAIL {name}: {results[name]}")
            continue
        tdiffs = type_mismatches(st.schema, dt_table.schema)
        if tdiffs:
            results[name] = f"TYPE_MISMATCH {'; '.join(tdiffs)}"
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
