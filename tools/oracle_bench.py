#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB (same parquet, 32 threads) and compare
against bench_queries_full.json — the judge's Spark/DuckDB geomean,
self-measured so regressions surface before the round gate.

Usage: python3 tools/oracle_bench.py <sfdir> <verify_outdir> [bench_json]
(verify_outdir must contain oracle_sql.json from graft.Verify)
"""
import duckdb, json, math, sys, time

def main():
    sfdir = sys.argv[1]
    vout = sys.argv[2]
    bench = sys.argv[3] if len(sys.argv) > 3 else "bench_queries_full.json"
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{vout}/oracle_sql.json"))
    oracles = {k: v for k, v in oracles.items() if not k.endswith(".parquet")}
    spark = json.load(open(bench))["queries"]
    rows = []
    for name, sql in sorted(oracles.items()):
        if name not in spark:
            continue
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                print(f"ERR  {name}: {e}")
                best = None
                break
            best = min(best, time.time() - t0)
        if best:
            rows.append((name, spark[name], best, spark[name] / best))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':38s} {'spark':>8s} {'duck':>8s} {'ratio':>7s}")
    for name, s, d, r in rows:
        print(f"{name:38s} {s:8.3f} {d:8.3f} {r:7.2f}")
    gm = math.exp(sum(math.log(r) for _, _, _, r in rows) / len(rows))
    faster = sum(1 for r in rows if r[3] < 1.0)
    print(f"\ngeomean spark/duckdb over {len(rows)} oracled queries: "
          f"{gm:.2f}x  (spark faster on {faster})")

if __name__ == "__main__":
    main()
