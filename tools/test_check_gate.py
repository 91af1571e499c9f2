#!/usr/bin/env python3
"""Gate test for tools/check.py (round-8 advice #2): a deliberately
broken query — Spark-side throw recorded in _errors.json, or a
registered dump that never landed — MUST surface as a red row and a
non-zero exit, even under the legacy SKIP_MISSING knob. Run:
    python3 tools/test_check_gate.py
"""
import json, os, shutil, subprocess, sys, tempfile

import duckdb

HERE = os.path.dirname(os.path.abspath(__file__))
CHECK = os.path.join(HERE, "check.py")
SF = "/root/testdata/sf0.001"


def run_check(out_dir, env_extra):
    env = dict(os.environ)
    env.update(env_extra)
    env["OUT_JSON"] = os.path.join(out_dir, "_verdicts.json")
    p = subprocess.run([sys.executable, CHECK, SF, out_dir],
                       capture_output=True, text=True, env=env)
    verdicts = {}
    if os.path.exists(env["OUT_JSON"]):
        verdicts = json.load(open(env["OUT_JSON"]))
    return p.returncode, verdicts, p.stdout


def build_fixture(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    # good: dump matches its oracle
    con = duckdb.connect()
    os.makedirs(f"{out_dir}/good", exist_ok=True)
    con.execute(
        f"COPY (SELECT 1 AS x) TO '{out_dir}/good/part-0.parquet' (FORMAT PARQUET)")
    # pipe_trap: two single-column encodings that the old '|'-concat
    # row hash could NOT tell apart across column boundaries.
    os.makedirs(f"{out_dir}/pipe_trap", exist_ok=True)
    con.execute(
        f"COPY (SELECT 'a|b' AS c1, 'c' AS c2) "
        f"TO '{out_dir}/pipe_trap/part-0.parquet' (FORMAT PARQUET)")
    json.dump({
        "good": "SELECT 1 AS x",
        "broken": "SELECT 1 AS x",          # has _errors.json entry
        "missing": "SELECT 1 AS x",         # no dump, no error record
        "pipe_trap": "SELECT 'a' AS c1, 'b|c' AS c2",  # must FAIL
    }, open(f"{out_dir}/oracle_sql.json", "w"))
    json.dump({"broken": "ParseException: [DATATYPE_MISSING_SIZE]"},
              open(f"{out_dir}/_errors.json", "w"))


def main():
    tmp = tempfile.mkdtemp(prefix="check_gate_")
    try:
        build_fixture(tmp)
        fails = []

        def expect(cond, msg):
            (print(f"  ok   {msg}") if cond else fails.append(msg))

        # 1. default run: broken + missing are red, good is green
        rc, v, _ = run_check(tmp, {})
        expect(rc != 0, "default run exits non-zero")
        expect(v.get("good", {}).get("hash_match") is True, "good is green")
        expect("spark error" in str(v.get("broken", {}).get("err")),
               "broken (Spark-side throw) is a red row")
        expect(v.get("missing", {}).get("err") == "missing spark output",
               "missing dump is a red row")
        expect(v.get("pipe_trap", {}).get("hash_match") is not True
               and v.get("pipe_trap", {}).get("err") is None
               or v.get("pipe_trap", {}).get("hash_match") is not True,
               "delimiter-injection rows do not false-match")

        # 2. SKIP_MISSING alone must NOT hide the missing dump
        rc, v, out = run_check(tmp, {"SKIP_MISSING": "1"})
        expect(rc != 0, "SKIP_MISSING without ONLY still exits non-zero")
        expect(v.get("missing", {}).get("err") == "missing spark output",
               "SKIP_MISSING without ONLY still fails the missing dump")
        expect("spark error" in str(v.get("broken", {}).get("err")),
               "SKIP_MISSING cannot hide a recorded Spark-side error")

        # 3. explicit subset: names outside ONLY skip; inside-and-missing fails
        rc, v, _ = run_check(tmp, {"ONLY": "good,missing"})
        expect("pipe_trap" not in v and "broken" not in {
            k for k, r in v.items() if r.get("err") == "missing spark output"},
            "ONLY skips names outside the subset")
        expect(v.get("missing", {}).get("err") == "missing spark output",
               "a name INSIDE ONLY with no dump still fails")
        # broken has a dump-less error record → still red even under ONLY
        expect(rc != 0, "subset run with a missing member exits non-zero")

        # 4. BIG_ROWS=0 forces the aggregate-hash path; pipe_trap must fail
        rc, v, _ = run_check(tmp, {"BIG_ROWS": "0", "ONLY": "good,pipe_trap"})
        expect(v.get("good", {}).get("hash_match") is True,
               "aggregate-hash path: good is green")
        expect(v.get("pipe_trap", {}).get("hash_match") is not True,
               "aggregate-hash path: delimiter injection cannot false-match")

        if fails:
            print("\nFAILED:")
            for f in fails:
                print(f"  FAIL {f}")
            sys.exit(1)
        print("\nall gate checks passed")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
