#!/usr/bin/env python3
"""Local pre-check that mimics the driver's correctness gate:
runs each oracle SQL in DuckDB over the testdata tables and compares it
with the parquet output of `graft.Verify` (column-name-sorted, row-sorted,
exact values). Usage: python3 tools/check.py [sfDir] [outDir]

Env knobs (for the sf1 scale-correctness campaign):
  ONLY=a,b         the explicit subset Verify was run with; names outside
                   it are skipped, names INSIDE it with no dump still FAIL
  SKIP_MISSING=1   legacy alias: only honored together with ONLY (a
                   registered query with no dump and no subset is a FAIL
                   — a Spark-side throw must never shrink the denominator)
  OUT_JSON=path    also write a driver-style per-query verdict JSON
  EXCLUDE=a,b      skip these query names (oracles too slow at the
                   probed SF get excluded EXPLICITLY, never silently)
  ORACLE_TIMEOUT=N interrupt any single DuckDB oracle after N seconds
                   and record it as "oracle timeout" (the sf1 campaign
                   guard: a quadratic oracle must not hang the gate,
                   and the record says exactly which ones were cut)
  BIG_ROWS=N       outputs larger than N rows compare INSIDE DuckDB
                   (count + order-independent sum-of-row-hashes over
                   name-sorted stringified columns) instead of pulling
                   rows into Python — the sf1 campaign path for pair-
                   emitting queries whose results are tens of millions
                   of rows. Default 2000000.
"""
import sys, os, json, glob, math, time, threading
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
SKIP_MISSING = os.environ.get("SKIP_MISSING") == "1"
OUT_JSON = os.environ.get("OUT_JSON")
EXCLUDE = set(x for x in os.environ.get("EXCLUDE", "").split(",") if x)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.isdir(p):  # ScaleUp output: a directory of part files
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

ONLY = set(x for x in os.environ.get("ONLY", "").split(",") if x)

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

# Verify records per-query Spark-side failures here; each one is a red
# row regardless of any skip knob (round-7 lesson: stderr-only failures
# plus SKIP_MISSING reported "250 ok" while 4 queries could not parse).
spark_errors = {}
err_path = f"{OUT}/_errors.json"
if os.path.exists(err_path):
    spark_errors = json.load(open(err_path))

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = df.values.tolist()
    def key(r):
        return tuple((x is None or (isinstance(x, float) and math.isnan(x)), str(x)) for x in r)
    return cols, sorted(rows, key=key)

def norm(x):
    if isinstance(x, float) and math.isnan(x):
        return None
    return x

ok, bad = 0, 0
verdicts = {}
# OUT_JSONL: stream each verdict as it lands (append, one JSON object
# per line). OUT_JSON only writes at the END of the run, so a killed or
# crashed campaign loses every per-query verdict it already earned —
# the r12 sf10 sweep lost ~85% of an 80-minute oracle replay that way.
# The JSONL is the kill-safe record; compose tools can rebuild the
# final JSON from it (last line per name wins).
OUT_JSONL = os.environ.get("OUT_JSONL")
def record(name, **kw):
    v = {"rows_match": False, "schema_match": False, "hash_match": False,
         "spark_rows": None, "oracle_rows": None, "err": None}
    v.update(kw)
    verdicts[name] = v
    if OUT_JSONL:
        with open(OUT_JSONL, "a") as f:
            f.write(json.dumps({"name": name, **v}) + "\n")
            f.flush()

for name, sql in sorted(oracle.items()):
    if name in EXCLUDE:
        print(f"  SKIP {name} (EXCLUDE)")
        continue
    if ONLY and name not in ONLY and name not in spark_errors:
        continue
    if name in spark_errors:
        print(f"  FAIL {name}: spark-side error: {spark_errors[name]}")
        record(name, err=f"spark error: {spark_errors[name]}"[:300])
        bad += 1
        continue
    spark_dir = f"{OUT}/{name}"
    if not os.path.isdir(spark_dir):
        if SKIP_MISSING and not ONLY:
            print(f"  WARN {name}: SKIP_MISSING without ONLY is ignored"
                  " — missing dump is a FAIL")
        print(f"  MISSING spark output: {name}")
        record(name, err="missing spark output")
        bad += 1
        continue
    t0 = time.time()
    timeout = float(os.environ.get("ORACLE_TIMEOUT", "0") or 0)
    timer = None
    timed_out = []

    def arm():
        # Timer is armed only around ORACLE statements — an interrupt
        # during the spark-dump scan must surface as an error, not be
        # misrecorded as "oracle timeout".
        global timer
        if timeout > 0:
            def _cut():
                timed_out.append(True)
                con.interrupt()
            timer = threading.Timer(timeout, _cut)
            timer.start()

    def disarm():
        global timer
        if timer is not None:
            timer.cancel()
            timer = None
    try:
        BIG = int(os.environ.get("BIG_ROWS", "2000000"))
        src = f"read_parquet('{spark_dir}/*.parquet')"
        n_spark = con.execute(f"SELECT count(*) FROM {src}").fetchone()[0]
        if n_spark > BIG:
            # DuckDB-side aggregate compare: row counts + an order-
            # independent SUM of per-row hashes over the name-sorted,
            # stringified columns (both sides stringify through DuckDB's
            # one formatter, so int32/int64 width differences and float
            # rendering cannot diverge).
            scols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()]
            arm()
            ocols = [r[0] for r in con.execute(f"DESCRIBE {sql}").fetchall()]
            disarm()
            if sorted(scols) != sorted(ocols):
                print(f"  FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
                record(name, spark_rows=n_spark)
                bad += 1
                continue
            # Multi-argument hash keeps the row encoding injective across
            # column boundaries (a '|' or chr(1) INSIDE a value cannot
            # collide with the delimiter); stringify each column through
            # DuckDB's one formatter so int widths / float rendering agree.
            expr = ", ".join(
                f"CAST(\"{c}\" AS VARCHAR)" for c in sorted(scols))
            sh = con.execute(
                f"SELECT count(*), SUM(hash({expr})) FROM {src}").fetchone()
            arm()
            oh = con.execute(
                f"SELECT count(*), SUM(hash({expr})) FROM ({sql})").fetchone()
            disarm()
            if sh == oh:
                print(f"  ok   {name} ({n_spark} rows, duckdb aggregate hash)"
                      f"  [{time.time()-t0:.1f}s]")
                record(name, rows_match=True, schema_match=True,
                       hash_match=True, spark_rows=sh[0], oracle_rows=oh[0],
                       err=None, mode="aggregate-hash")
                ok += 1
            else:
                print(f"  FAIL {name}: aggregate spark={sh} oracle={oh}")
                record(name, spark_rows=sh[0], oracle_rows=oh[0],
                       rows_match=sh[0] == oh[0], schema_match=True,
                       mode="aggregate-hash")
                bad += 1
            continue
        sdf = con.execute(f"SELECT * FROM {src}").fetchdf()
        arm()
        odf = con.execute(sql).fetchdf()
        disarm()
    except Exception as e:
        if timed_out:
            print(f"  SKIP {name} (oracle timeout > {timeout:.0f}s)")
            record(name, err=f"oracle timeout > {timeout:.0f}s")
        else:
            print(f"  ERROR {name}: {e}")
            record(name, err=str(e)[:300])
            bad += 1
        continue
    finally:
        disarm()
    scols, srows = canon(sdf)
    ocols, orows = canon(odf)
    if scols != ocols:
        print(f"  FAIL {name}: columns spark={scols} oracle={ocols}")
        record(name, spark_rows=len(srows), oracle_rows=len(orows))
        bad += 1
        continue
    if len(srows) != len(orows):
        print(f"  FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
        record(name, schema_match=True,
               spark_rows=len(srows), oracle_rows=len(orows))
        bad += 1
        continue
    mism = None
    for i, (a, b) in enumerate(zip(srows, orows)):
        a2, b2 = [norm(x) for x in a], [norm(x) for x in b]
        if a2 != b2:
            mism = (i, a2, b2)
            break
    if mism:
        print(f"  FAIL {name}: row {mism[0]} spark={mism[1]} oracle={mism[2]}")
        record(name, schema_match=True, rows_match=True,
               spark_rows=len(srows), oracle_rows=len(orows))
        bad += 1
        continue
    # The driver hashes *stringified* values, so an int on one side and a
    # float on the other ("3" vs "3.0") mismatches even when == in Python.
    # DuckDB's SUM(BIGINT) -> HUGEINT -> pandas float64 is the classic way
    # to trip this; treat any int/float family crossing as a failure.
    sd, od = dict(sdf.dtypes.astype(str)), dict(odf.dtypes.astype(str))
    def fam(dt):
        return "int" if dt.startswith(("int", "uint")) else \
               "float" if dt.startswith("float") else dt
    cross = {c: (sd[c], od[c]) for c in sd
             if c in od and {fam(sd[c]), fam(od[c])} == {"int", "float"}}
    if cross:
        print(f"  FAIL {name}: int/float dtype crossing {cross}")
        record(name, rows_match=True,
               spark_rows=len(srows), oracle_rows=len(orows))
        bad += 1
        continue
    dmism = {c: (sd[c], od[c]) for c in sd if sd[c] != od.get(c)}
    note = f"  [dtype diff: {dmism}]" if dmism else ""
    print(f"  ok   {name} ({len(srows)} rows){note}  [{time.time()-t0:.1f}s]")
    record(name, rows_match=True, schema_match=True, hash_match=True,
           spark_rows=len(srows), oracle_rows=len(orows))
    ok += 1

# Spark-side failures on queries with no oracle entry (rows-only class)
# are still red rows — _errors.json is authoritative for the whole map.
for name, msg in sorted(spark_errors.items()):
    if name not in oracle:
        print(f"  FAIL {name}: spark-side error (rows-only query): {msg}")
        record(name, err=f"spark error: {msg}"[:300])
        bad += 1

# queries without oracle → rows-only check
for d in sorted(glob.glob(f"{OUT}/*/")):
    name = os.path.basename(d.rstrip("/"))
    if name not in oracle:
        try:
            n = con.execute(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
            print(f"  rows-only {name}: {n} rows")
        except Exception as e:
            print(f"  rows-only {name}: ERROR {e}")

if OUT_JSON:
    with open(OUT_JSON, "w") as f:
        json.dump(verdicts, f, indent=0, sort_keys=True)
    print(f"wrote {OUT_JSON} ({len(verdicts)} verdicts)")

print(f"\n{ok} ok, {bad} fail")
sys.exit(1 if bad else 0)
