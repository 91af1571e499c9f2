#!/usr/bin/env python3
"""External-baseline bench: time the 22 TPC-H anchor queries' DuckDB
oracle SQL (the exact statements the correctness gate replays) over the
same parquet tables the engine reads, side-by-side with the engine's
per-query wall from a bench JSON. Gives BASELINE.md a denominator that
is not self-referential: a mature single-node OLAP engine running the
semantically identical query on identical bytes.

Methodology notes (recorded so the table is honest):
  - DuckDB is timed per statement, min of PASSES runs, materialized via
    `CREATE TEMP TABLE ... AS` + row count (comparable to the engine's
    noop sink: full execution, no client transfer).
  - DuckDB uses all cores (`threads` default) in one process — same host
    budget as the engine's local[32].
  - The engine wall includes Spark plan/codegen overhead per query;
    DuckDB's includes its own planning. Neither side pre-warms beyond
    one untimed warmup statement.

Usage: python3 tools/bench_duckdb.py [sfDir] [bench_json] [passes]
Writes tools/bench_duckdb_tpch.json and prints a markdown table.
"""
import sys, os, json, time, glob
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
BENCH = sys.argv[2] if len(sys.argv) > 2 else None
PASSES = int(sys.argv[3]) if len(sys.argv) > 3 else 2

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

oracle = json.load(open("target/verify_out/oracle_sql.json"))
anchors = sorted((k for k in oracle if k.startswith("tpch_q")),
                 key=lambda k: int(k.split("q")[1]))

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.isdir(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

con.execute("SELECT count(*) FROM lineitem")  # warmup: open files, cache meta

engine = {}
if BENCH and os.path.exists(BENCH):
    b = json.load(open(BENCH))
    if "queries" in b:
        engine = b["queries"]
    elif "tail" in b:  # driver BENCH_r{N}.json wraps Bench's stdout line
        line = [l for l in b["tail"].splitlines() if l.startswith("{")][-1]
        engine = json.loads(line).get("queries", {})

rows = []
for name in anchors:
    sql = oracle[name]
    best = None
    for _ in range(PASSES):
        con.execute("DROP TABLE IF EXISTS __bench_out")
        t0 = time.time()
        con.execute(f"CREATE TEMP TABLE __bench_out AS {sql}")
        n = con.execute("SELECT count(*) FROM __bench_out").fetchone()[0]
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    rows.append({"query": name, "duckdb_sec": round(best, 3),
                 "rows": n, "engine_sec": engine.get(name)})
    print(f"  {name:10s} duckdb={best:7.3f}s rows={n}"
          + (f" engine={engine[name]:.3f}s" if name in engine else ""))

out = {"sf_dir": SF, "passes": PASSES, "bench_json": BENCH,
       "duckdb_version": duckdb.__version__, "rows": rows,
       "duckdb_total_sec": round(sum(r["duckdb_sec"] for r in rows), 3)}
if all(r["engine_sec"] is not None for r in rows):
    out["engine_total_sec"] = round(sum(r["engine_sec"] for r in rows), 3)
# one record per SF so the crossover trend (sf0.1 / sf1 / sf3) coexists
suffix = os.path.basename(SF.rstrip("/")) or "sf"
json.dump(out, open(f"tools/bench_duckdb_tpch_{suffix}.json", "w"), indent=1)

print("\n| query | engine (s) | duckdb (s) | ratio engine/duckdb |")
print("|---|---|---|---|")
for r in rows:
    e = r["engine_sec"]
    ratio = f"{e / r['duckdb_sec']:.1f}×" if e and r["duckdb_sec"] > 0 else "—"
    print(f"| {r['query']} | {e if e is not None else '—'} | {r['duckdb_sec']} | {ratio} |")
print(f"\nTotals: duckdb {out['duckdb_total_sec']} s"
      + (f", engine {out['engine_total_sec']} s" if "engine_total_sec" in out else ""))
