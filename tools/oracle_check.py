#!/usr/bin/env python3
"""Local pre-check of Spark results vs the DuckDB oracle.

Mirrors the driver's t2 gate (BASELINE.md): for each query directory written
by graft.Verify, run the corresponding oracle SQL from oracle_sql.json in
DuckDB over the same parquet tables, then compare column names, row counts,
and an order-insensitive canonical hash of all values.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # shortest round-trip repr => bit-faithful
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_fingerprint(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = qdir.rsplit("/", 1)[-1]
        rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        spark_cols, spark_rows = rel.columns, rel.fetchall()
        if name not in oracles:
            results[name] = f"rows-only: {len(spark_rows)} rows"
            continue
        try:
            orel = con.sql(oracles[name])
            o_cols, o_rows = orel.columns, orel.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {e}"
            continue
        if sorted(spark_cols) != sorted(o_cols):
            results[name] = f"SCHEMA-MISMATCH: spark={sorted(spark_cols)} oracle={sorted(o_cols)}"
            continue
        if len(spark_rows) != len(o_rows):
            results[name] = f"ROWCOUNT-MISMATCH: spark={len(spark_rows)} oracle={len(o_rows)}"
            continue
        hs = table_fingerprint(spark_rows, spark_cols)
        ho = table_fingerprint(o_rows, o_cols)
        if hs == ho:
            results[name] = f"MATCH ({len(spark_rows)} rows)"
        else:
            results[name] = "HASH-MISMATCH"
            # show first differing canonical line for debugging
            order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
            ls = sorted("|".join(canon(r[i]) for i in order) for r in spark_rows)
            lo = sorted("|".join(canon(r[i]) for i in order) for r in o_rows)
            for a, b in zip(ls, lo):
                if a != b:
                    results[name] += f"\n    spark : {a[:200]}\n    oracle: {b[:200]}"
                    break
    bad = 0
    for name, res in sorted(results.items()):
        flag = "OK " if res.startswith(("MATCH", "rows-only")) else "BAD"
        if flag == "BAD":
            bad += 1
        print(f"[{flag}] {name}: {res}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
