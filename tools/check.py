#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate.

Runs graft.Verify (already-built classes) on a scale-factor dir, then runs
each oracle SQL in DuckDB over the same parquet tables and compares
(column-name-sorted, row-sorted) values. Not part of the shipped library.

Usage: python3 tools/check.py [sfdir] [outdir] [--no-run]
"""
import json, math, subprocess, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify(sfdir, outdir):
    cmd = ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    for line in r.stdout.splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)
    if r.returncode != 0:
        print(r.stdout[-3000:]); print(r.stderr[-3000:])
        sys.exit(1)


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # decimals -> float for compare
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def compare(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            bad += 1
            continue
        e_cols, g_cols = sorted(exp.columns), sorted(got.columns)
        if e_cols != g_cols:
            print(f"FAIL {name}: columns {g_cols} != oracle {e_cols}")
            bad += 1
            continue
        exp = exp[e_cols].sort_values(e_cols).reset_index(drop=True)
        got = got[g_cols].sort_values(g_cols).reset_index(drop=True)
        if len(exp) != len(got):
            print(f"FAIL {name}: rows {len(got)} != oracle {len(exp)}")
            bad += 1
            continue
        mismatch = None
        for c in e_cols:
            for i, (a, b) in enumerate(zip(exp[c], got[c])):
                a, b = norm(a), norm(b)
                if a != b and not (
                    isinstance(a, float) and isinstance(b, float)
                        and a == b):
                    mismatch = (c, i, a, b)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: col {c} row {i}: oracle={a!r} got={b!r}")
            bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            ok += 1
    print(f"== {ok} ok, {bad} fail")
    return bad


if __name__ == "__main__":
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    if "--no-run" not in sys.argv:
        run_verify(sfdir, outdir)
    sys.exit(1 if compare(sfdir, outdir) else 0)
