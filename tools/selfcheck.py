#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name>.parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the
sfDir tables registered as views, and compares as (column-name-sorted,
row-sorted, 1e-9-rounded) multisets. Exit 1 on any mismatch.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return str(v)


def norm_rows(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [names[i] for i in order], out


def main():
    # optional: --json <path> writes the machine-readable per-query tally
    # (the r9 postmortem: the driver's CORRECTNESS_r09.json arrived empty,
    # so each round now commits its own gate evidence at HEAD)
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: selfcheck.py <sfDir> <outDir> [--json PATH] [query ...]")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failed, passed, skipped = [], [], []
    names = sorted(d.name.removesuffix(".parquet")
                   for d in Path(out_dir).iterdir() if d.is_dir())
    for name in names:
        if only and name not in only:
            continue
        d = Path(out_dir, name + ".parquet")
        if not d.exists():
            d = Path(out_dir, name)
        tbl = pq.read_table(str(d))
        got_names = tbl.column_names
        got_rows = [tuple(r[c] for c in got_names) for r in tbl.to_pylist()]
        if name not in oracle:
            skipped.append(name)
            print(f"SKIP  {name:34s} rows={len(got_rows)} (no oracle)")
            continue
        try:
            res = con.execute(oracle[name])
            exp_names = [d[0] for d in res.description]
            exp_rows = res.fetchall()
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name:34s} oracle SQL error: {str(e).splitlines()[0][:160]}")
            continue
        gn, gr = norm_rows(got_names, got_rows)
        en, er = norm_rows(exp_names, exp_rows)
        if gn != en:
            failed.append(name)
            print(f"FAIL  {name:34s} columns differ: spark={gn} duckdb={en}")
            continue
        if gr != er:
            failed.append(name)
            print(f"FAIL  {name:34s} rows differ: spark={len(gr)} duckdb={len(er)}")
            sg, se = set(gr), set(er)
            for r in list(sg - se)[:3]:
                print(f"      spark-only : {r}")
            for r in list(se - sg)[:3]:
                print(f"      duckdb-only: {r}")
            continue
        passed.append(name)
        print(f"PASS  {name:34s} rows={len(gr)}")
    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(skipped)} rows-only")
    if json_out:
        tally = {"sf_dir": sf_dir,
                 "passed": len(passed), "failed": len(failed),
                 "rows_only": len(skipped),
                 "queries": {**{n: "pass" for n in passed},
                             **{n: "fail" for n in failed},
                             **{n: "rows_only" for n in skipped}}}
        Path(json_out).write_text(json.dumps(tally, indent=1, sort_keys=True))
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
