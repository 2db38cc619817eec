#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Runs DuckDB on oracle_sql.json (written by graft.Verify) against the same
parquet tables, loads the per-query parquet Spark wrote, and compares
schema (column names), row count, and a row-order-insensitive hash of
values with columns sorted by name — mirroring the driver's compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)

def table_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode()); h.update(b"\n")
    return h.hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok = fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        pdir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        tbl = pq.read_table(pdir)
        scols = tbl.column_names
        srows = list(zip(*[tbl.column(c).to_pylist() for c in scols])) if tbl.num_rows else []
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: cols spark={sorted(scols)} duckdb={sorted(dcols)}"); fail += 1; continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rows spark={len(srows)} duckdb={len(drows)}"); fail += 1; continue
        hs = table_digest(scols, srows)
        hd = table_digest(dcols, drows)
        if hs != hd:
            print(f"FAIL {name}: hash mismatch ({len(srows)} rows)")
            # print first differing row for debugging
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            ls = sorted("|".join(norm(r[i]) for i in order_s) for r in srows)
            ld = sorted("|".join(norm(r[i]) for i in order_d) for r in drows)
            for a, b in zip(ls, ld):
                if a != b:
                    print(f"  spark : {a[:300]}\n  duckdb: {b[:300]}")
                    break
            fail += 1
            continue
        print(f"ok   {name} ({len(srows)} rows)"); ok += 1
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
