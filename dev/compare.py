#!/usr/bin/env python3
"""Local dev harness mimicking the driver's t2 correctness gate.

Usage: python3 dev/compare.py <sfDir> <outDir>
Reads each <outDir>/<name>/ parquet (Spark result) and runs
<outDir>/oracle_sql.json's SQL in DuckDB over <sfDir>/*.parquet,
then compares values column-name-sorted, row-sorted, hashed.
NOT part of the shipped library - dev tooling only.
"""
import json, sys, glob, os
import duckdb

def canon(rows, cols):
    # sort columns by name, stringify values, sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark result)"); n_bad += 1; continue
        try:
            got = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'")
            grows, gcols = got.fetchall(), [d[0] for d in got.description]
            want = con.execute(sql)
            wrows, wcols = want.fetchall(), [d[0] for d in want.description]
        except Exception as e:
            print(f"ERROR    {name}: {e}"); n_bad += 1; continue
        # the driver's hash compare is TYPE-sensitive: DuckDB sums over
        # integers yield HUGEINT while Spark emits int64 — repr() hides
        # that (both print as int), so compare declared types as well
        gtypes = sorted((d[0], str(d[1])) for d in got.description)
        wtypes = sorted((d[0], str(d[1])) for d in want.description)
        g, gc = canon(grows, gcols)
        w, wc = canon(wrows, wcols)
        if gc != wc:
            print(f"SCHEMA   {name}: spark={gc} oracle={wc}"); n_bad += 1
        elif gtypes != wtypes:
            diff = [(a, b) for a, b in zip(gtypes, wtypes) if a != b]
            print(f"TYPES    {name}: {diff}"); n_bad += 1
        elif len(g) != len(w):
            print(f"ROWS     {name}: spark={len(g)} oracle={len(w)}"); n_bad += 1
        elif g != w:
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"VALUES   {name}: first diffs {diff}"); n_bad += 1
        else:
            print(f"OK       {name} ({len(g)} rows)"); n_ok += 1
    # queries with no oracle: at least assert the parquet output exists and has rows
    for res_dir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(res_dir.rstrip("/"))
        if name in oracle:
            continue
        try:
            n = con.execute(f"SELECT count(*) FROM '{res_dir}*.parquet'").fetchone()[0]
        except Exception as e:
            print(f"ERROR    {name} (rows-only): {e}"); n_bad += 1; continue
        if n > 0:
            print(f"OK-ROWS  {name} ({n} rows, no oracle)"); n_ok += 1
        else:
            print(f"EMPTY    {name} (rows-only check, 0 rows)"); n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
