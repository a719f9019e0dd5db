#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
           [--json PATH] [--driver-schema PATH] [--jobs N] [query ...]

Reads each <verifyOutDir>/<name>.parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the
sfDir tables registered as views, and compares as (column-name-sorted,
row-sorted, 1e-9-rounded) multisets. Exit 1 on any mismatch.

--jobs N runs N oracle queries concurrently, each in its own DuckDB
connection (r11 VERDICT #4: the three recursive feed oracles g19/g20/g20b
cost ~20 min EACH and are recursion-bound, not core-bound — running them
side by side collapses the sf0.1 gate from ~85 min toward the slowest
single query). Results are collected and printed in name order, so the
log is byte-diffable against a sequential run.

--driver-schema PATH additionally writes the tally in the driver's OWN
CORRECTNESS_r08.json artifact schema (r11 VERDICT #3): a map keyed by
"<name>.parquet" with rows_match/schema_match/hash_match/spark_rows/
oracle_rows/err — so when the driver-side artifact arrives empty (r9-r11),
the committed self-gate is directly diffable against any round where it
does not.
"""
import json
import math
import sys
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# per-process state (ProcessPoolExecutor initializer)
_CON = None
_ORACLE = None
_OUT_DIR = None


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


def _init(sf_dir, out_dir, oracle, threads=None):
    import duckdb
    global _CON, _ORACLE, _OUT_DIR
    _CON = duckdb.connect()
    _CON.execute("SET TimeZone='UTC'")
    if threads:
        # N workers each defaulting to ALL cores oversubscribes the box
        # N-fold and the parallel win evaporates — split the cores
        _CON.execute(f"SET threads={threads}")
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            # driver fixtures are single files; ScaleGen corpora are
            # Spark-written DIRECTORIES of part files — glob those
            src = f"{p}/*.parquet" if p.is_dir() else str(p)
            _CON.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    _ORACLE = oracle
    _OUT_DIR = out_dir


def check_one(name):
    """Returns (name, status, lines, record) — record in the driver's r8
    artifact schema. NEVER raises: any per-query failure (unreadable
    Verify output, oracle error, compare crash) becomes a FAIL row, so
    one bad entry cannot discard an hour of completed results or the
    --json/--driver-schema artifacts."""
    try:
        return _check_one(name)
    except Exception as e:
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None,
               "err": f"check error: {str(e).splitlines()[0][:160]}"}
        return (name, "fail", [f"FAIL  {name:34s} {rec['err']}"], rec)


def _check_one(name):
    import pyarrow.parquet as pq
    d = Path(_OUT_DIR, name + ".parquet")
    if not d.exists():
        d = Path(_OUT_DIR, name)
    tbl = pq.read_table(str(d))
    got_names = tbl.column_names
    got_rows = [tuple(r[c] for c in got_names) for r in tbl.to_pylist()]
    rec = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": len(got_rows), "oracle_rows": None, "err": None}
    if name not in _ORACLE:
        rec["err"] = "no_oracle"
        return (name, "skip",
                [f"SKIP  {name:34s} rows={len(got_rows)} (no oracle)"], rec)
    try:
        res = _CON.execute(_ORACLE[name])
        exp_names = [c[0] for c in res.description]
        exp_rows = res.fetchall()
    except Exception as e:
        rec["err"] = f"oracle SQL error: {str(e).splitlines()[0][:160]}"
        return (name, "fail", [f"FAIL  {name:34s} {rec['err']}"], rec)
    gn, gr = norm_rows(got_names, got_rows)
    en, er = norm_rows(exp_names, exp_rows)
    rec["oracle_rows"] = len(er)
    rec["rows_match"] = len(gr) == len(er)
    rec["schema_match"] = gn == en
    if gn != en:
        rec["hash_match"] = False
        return (name, "fail",
                [f"FAIL  {name:34s} columns differ: spark={gn} duckdb={en}"],
                rec)
    rec["hash_match"] = gr == er
    if gr != er:
        lines = [f"FAIL  {name:34s} rows differ: spark={len(gr)} duckdb={len(er)}"]
        sg, se = set(gr), set(er)
        for r in list(sg - se)[:3]:
            lines.append(f"      spark-only : {r}")
        for r in list(se - sg)[:3]:
            lines.append(f"      duckdb-only: {r}")
        return (name, "fail", lines, rec)
    return (name, "pass", [f"PASS  {name:34s} rows={len(gr)}"], rec)


def take_opt(argv, flag, cast=str):
    if flag not in argv:
        return argv, None
    i = argv.index(flag)
    if i + 1 >= len(argv):
        sys.exit(f"usage: selfcheck.py <sfDir> <outDir> [--json PATH] "
                 f"[--driver-schema PATH] [--jobs N] [query ...]")
    try:
        val = cast(argv[i + 1])
    except ValueError:
        # a malformed value (e.g. --jobs fast) should print the usage
        # string like every other flag error, not a raw traceback
        sys.exit(f"selfcheck.py: invalid value {argv[i + 1]!r} for {flag}; "
                 f"usage: selfcheck.py <sfDir> <outDir> [--json PATH] "
                 f"[--driver-schema PATH] [--jobs N] [query ...]")
    return argv[:i] + argv[i + 2:], val


def main():
    argv = sys.argv[1:]
    # --json writes the machine-readable per-query tally (the r9
    # postmortem: the driver's CORRECTNESS_r09.json arrived empty, so each
    # round commits its own gate evidence at HEAD)
    argv, json_out = take_opt(argv, "--json")
    argv, driver_out = take_opt(argv, "--driver-schema")
    argv, jobs = take_opt(argv, "--jobs", int)
    jobs = max(1, jobs or 1)
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    names = sorted(d.name.removesuffix(".parquet")
                   for d in Path(out_dir).iterdir() if d.is_dir())
    names = [n for n in names if not only or n in only]
    if jobs == 1:
        # stream per-query lines as they complete (the pre-r12 behavior —
        # an ~85-min sequential run should show progress, not buffer)
        _init(sf_dir, out_dir, oracle)
        results = []
        for n in names:
            r = check_one(n)
            for line in r[2]:
                print(line, flush=True)
            results.append(r)
    else:
        import os
        threads = max(2, (os.cpu_count() or 8) // jobs)
        with ProcessPoolExecutor(max_workers=jobs, initializer=_init,
                                 initargs=(sf_dir, out_dir, oracle,
                                           threads)) as ex:
            results = list(ex.map(check_one, names))
    if jobs > 1:  # sequential mode already streamed its lines
        for _, _, lines, _ in sorted(results, key=lambda r: r[0]):
            for line in lines:
                print(line)
    results.sort(key=lambda r: r[0])
    failed = [n for n, st, _, _ in results if st == "fail"]
    passed = [n for n, st, _, _ in results if st == "pass"]
    skipped = [n for n, st, _, _ in results if st == "skip"]
    print(f"\n{len(passed)} passed, {len(failed)} failed, {len(skipped)} rows-only")
    if json_out:
        tally = {"sf_dir": sf_dir,
                 "passed": len(passed), "failed": len(failed),
                 "rows_only": len(skipped),
                 "queries": {n: ("pass" if st == "pass" else
                                 "fail" if st == "fail" else "rows_only")
                             for n, st, _, _ in results}}
        Path(json_out).write_text(json.dumps(tally, indent=1, sort_keys=True))
    if driver_out:
        Path(driver_out).write_text(json.dumps(
            {f"{n}.parquet": rec for n, _, _, rec in results},
            indent=2, sort_keys=True))
    if failed:
        print("failed:", " ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
