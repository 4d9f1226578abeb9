#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py [sfdir] [verify_out]

Reads verify_out/<name>/*.parquet (written by graft.Verify) and
verify_out/oracle_sql.json, runs each oracle in DuckDB over the fixture
tables, canonicalizes both sides (columns sorted by name, rows sorted,
floats rounded to 6dp) and reports per-query match/mismatch.
"""
import duckdb, json, math, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
                    if v == 0:
                        v = 0.0
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out), [cols[i] for i in order]


oracle = json.load(open(f"{OUT}/oracle_sql.json"))
ok, bad = [], []
for name, sql in sorted(oracle.items()):
    try:
        got_rel = con.execute(
            f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')")
        got_cols = [d[0] for d in got_rel.description]
        got_rows = got_rel.fetchall()
        exp_rel = con.execute(sql)
        exp_cols = [d[0] for d in exp_rel.description]
        exp_rows = exp_rel.fetchall()
    except Exception as e:
        bad.append((name, f"EXEC ERROR: {e}"))
        continue
    g, gc = canon(got_rows, got_cols)
    e, ec = canon(exp_rows, exp_cols)
    if gc != ec:
        bad.append((name, f"SCHEMA: spark={gc} duck={ec}"))
    elif len(g) != len(e):
        bad.append((name, f"ROWCOUNT: spark={len(g)} duck={len(e)}"))
    elif g != e:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b)
        bad.append((name, f"VALUES @ sorted-row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}\n  cols ={gc}"))
    else:
        ok.append(name)

print(f"PASS {len(ok)}/{len(oracle)}: {' '.join(ok)}")
for name, why in bad:
    print(f"FAIL {name}: {why}")
sys.exit(1 if bad else 0)
