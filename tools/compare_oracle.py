#!/usr/bin/env python3
"""Driver-style DuckDB oracle compare for local iteration.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Mirrors the driver contract: for each query with an oracle_sql entry,
register the sfDir parquet tables in DuckDB, run the oracle, and compare
row count, schema (column names sorted), and a value hash against the
Spark result parquet.
"""
import sys, json, hashlib, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    h = hashlib.sha256()
    canon_rows = sorted(
        "|".join(canon(r[i]) for i in order) for r in rows)
    for line in canon_rows:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    results = {}
    for name, sql in sorted(oracle.items()):
        entry = {}
        try:
            spark = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_cols = [d[0] for d in spark.description]
            s_rows = spark.fetchall()
            o = con.execute(sql)
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
            entry["rows"] = (len(s_rows), len(o_rows), len(s_rows) == len(o_rows))
            entry["schema"] = (sorted(s_cols) == sorted(o_cols))
            if not entry["schema"]:
                entry["schema_detail"] = (sorted(s_cols), sorted(o_cols))
            sh, oh = table_hash(s_cols, s_rows), table_hash(o_cols, o_rows)
            entry["hash"] = (sh == oh)
            if not entry["hash"] and entry["rows"][2] and entry["schema"]:
                # find first differing row for debugging
                so = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                oo = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
                a = sorted("|".join(canon(r[i]) for i in so) for r in s_rows)
                b = sorted("|".join(canon(r[i]) for i in oo) for r in o_rows)
                for x, y in zip(a, b):
                    if x != y:
                        entry["first_diff"] = {"spark": x[:300], "oracle": y[:300]}
                        break
        except Exception as e:
            entry["err"] = str(e)[:300]
        results[name] = entry
        ok = entry.get("rows", (0, 0, False))[2] and entry.get("schema") and entry.get("hash")
        print(f"{'PASS' if ok else 'FAIL'} {name}: {entry}")
    n_ok = sum(1 for e in results.values()
               if e.get("rows", (0, 0, False))[2] and e.get("schema") and e.get("hash"))
    print(f"\n{n_ok}/{len(results)} oracle-checked queries green")


if __name__ == "__main__":
    main()
