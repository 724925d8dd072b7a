#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare (schema-insensitively, rows
as sorted multisets, columns sorted by name) with the Verify.scala parquet
dumps. Usage: compare.py <sfDir> <verifyOutDir>"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, colnames):
    # STRICT on purpose: exact repr, -0.0 != 0.0, no rounding. The driver's
    # hash gate is value-exact; a lenient local gate hides real failures
    # (round 1 shipped 6 hash-fails that a 9-decimal local compare passed).
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("|".join(repr(r[i]) for i in order) for r in rows)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            tbl = pq.read_table(pdir)
        except Exception as e:
            print(f"FAIL {name}: read spark output: {e}"); n_fail += 1; continue
        try:
            res = con.execute(sql)
            o_cols = [d[0] for d in res.description]
            o_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_fail += 1; continue
        s_cols = tbl.column_names
        s_rows = [tuple(c[i].as_py() for c in tbl.columns) for i in range(tbl.num_rows)]
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_fail += 1; continue
        cs, co = canon(s_rows, s_cols), canon(o_rows, o_cols)
        if cs == co:
            print(f"PASS {name} ({len(cs)} rows)"); n_pass += 1
        else:
            n_fail += 1
            diff = [(a, b) for a, b in zip(cs, co) if a != b]
            print(f"FAIL {name}: rows spark={len(cs)} oracle={len(co)}, first diffs:")
            for a, b in diff[:3]:
                print(f"   spark:  {a}\n   oracle: {b}")
            if len(cs) != len(co):
                only_s = set(cs) - set(co); only_o = set(co) - set(cs)
                for x in list(only_s)[:2]: print(f"   only-spark:  {x}")
                for x in list(only_o)[:2]: print(f"   only-oracle: {x}")
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
