#!/usr/bin/env bash
# Pre-snapshot gate (round-8 discipline, after the r7 breakage: a commit
# landed 80 minutes before snapshot without re-running any gate, and a
# Spark-side parse error shipped). Run this on the EXACT tree you are
# about to snapshot; it must end with "PRE-SNAPSHOT GATE: GREEN".
#
#   bash tools/pre_snapshot.sh            # full: sbt test + Verify + check
#   FAST=1 bash tools/pre_snapshot.sh     # skip sbt test (plan-audit only)
#
# FAST legality (round-9 discipline, after r8 ended on a never-executed
# test): FAST is only legal when NOTHING under src/ (main OR test — a new
# test must EXECUTE), build.sbt, or project/ changed since the last FULL
# green run on this machine.
#
# Round-11 discipline (after the r10 breach — a source commit landed
# AFTER the green gate): a GREEN here covers THIS tree only. Before the
# final snapshot commit, run tools/gate_fresh.sh; it goes RED the moment
# any later edit touches src/build.sbt/project, so a post-gate source
# commit can no longer ship silently. The FULL pass records a content digest of
# those paths in target/.gate_last_full_green; FAST refuses without a
# matching digest and falls back to demanding a full run.
set -uo pipefail
cd "$(dirname "$0")/.."

fail() { echo "PRE-SNAPSHOT GATE: RED — $1" >&2; exit 1; }

# Digest of everything whose change invalidates a FAST gate. Content-
# based (not git SHAs), so uncommitted edits count too.
gate_digest() {
  { find src build.sbt project -type f \
      ! -path 'project/target/*' ! -path 'project/project/*' \
      -print0 | sort -z | xargs -0 sha256sum; } 2>/dev/null | sha256sum | cut -d' ' -f1
}
DIGEST_FILE=target/.gate_last_full_green

echo "== 1/3 scalatest =="
# Run the gate ALONE: a concurrent bench/TimeQ JVM on the same 32
# threads flakes the wall-clock-sensitive streaming tests. Full output
# goes to /tmp/gate_test_full.log so a failing SUITE NAME survives the
# tail (a red gate that can't say which test failed costs a rerun).
if [ "${FAST:-0}" = "1" ]; then
  [ -f "$DIGEST_FILE" ] || fail "FAST requested but no recorded full-green digest ($DIGEST_FILE) — run the full gate first"
  CUR=$(gate_digest)
  REC=$(cut -d' ' -f1 < "$DIGEST_FILE")
  [ "$CUR" = "$REC" ] || fail "FAST requested but src/build.sbt/project changed since the last FULL green run — a full 'sbt test' must execute on this tree"
  # QueryPlanAuditSpec alone plans every contract query (~2 min) and
  # catches the whole unparseable-SQL class.
  sbt -batch "testOnly graft.QueryPlanAuditSpec" > /tmp/gate_test_full.log 2>&1
else
  PRE_DIGEST=$(gate_digest)
  sbt -batch test > /tmp/gate_test_full.log 2>&1
fi
tail -8 /tmp/gate_test_full.log | tee /tmp/gate_test.out
grep -E "\*\*\* FAILED \*\*\*|Failed tests:" -A 3 /tmp/gate_test_full.log | head -12 || true
grep -q "All tests passed." /tmp/gate_test.out || fail "sbt test not green"

echo "== 2/3 Verify (sf0.01, full contract) =="
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /root/repo/target/verify_out" \
  > /tmp/gate_verify.out 2>&1 || fail "Verify crashed (see /tmp/gate_verify.out)"
ERRS=$(python3 -c "import json;print(len(json.load(open('target/verify_out/_errors.json'))))" 2>/dev/null || echo "?")
[ "$ERRS" = "0" ] || fail "Verify recorded $ERRS per-query failures (_errors.json)"

echo "== 3/3 DuckDB oracle compare =="
python3 tools/check.py /root/testdata/sf0.01 /root/repo/target/verify_out \
  2>&1 | tail -3 | tee /tmp/gate_check.out
grep -qE ", 0 fail$" /tmp/gate_check.out || fail "check.py reported failures"

# Record the digest the FULL suite actually ran against (captured BEFORE
# sbt test — a file edited mid-run must not count as covered).
if [ "${FAST:-0}" != "1" ]; then
  mkdir -p target
  echo "$PRE_DIGEST $(git rev-parse HEAD 2>/dev/null || echo no-git) $(date -u +%FT%TZ)" > "$DIGEST_FILE"
fi

echo "PRE-SNAPSHOT GATE: GREEN"
