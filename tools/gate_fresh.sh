#!/usr/bin/env bash
# Gate-freshness check (round-11 discipline, after the r10 breach: a
# source commit landed AFTER the full-green gate and the 438-test suite
# never re-ran on the final tree). Run this immediately before any
# snapshot / final commit: it fails unless the CURRENT content of
# src/ + build.sbt + project/ is byte-identical to what the last FULL
# green gate actually tested. Records-only commits (BENCH/SCALING/
# SURVEY/VERDICT files, tools/*.py|sh) keep the digest unchanged and
# pass; ANY source edit — committed or not — turns this red until
# pre_snapshot.sh runs again (FAST mode is fine if its own digest rule
# allows it, i.e. it won't be).
set -uo pipefail
cd "$(dirname "$0")/.."

DIGEST_FILE=target/.gate_last_full_green
[ -f "$DIGEST_FILE" ] || { echo "GATE FRESHNESS: RED — no recorded full-green digest; run tools/pre_snapshot.sh" >&2; exit 1; }

gate_digest() {
  { find src build.sbt project -type f \
      ! -path 'project/target/*' ! -path 'project/project/*' \
      -print0 | sort -z | xargs -0 sha256sum; } 2>/dev/null | sha256sum | cut -d' ' -f1
}

CUR=$(gate_digest)
read -r REC SHA WHEN < "$DIGEST_FILE"
if [ "$CUR" != "$REC" ]; then
  echo "GATE FRESHNESS: RED — src/build.sbt/project changed since the full-green gate (ran at $WHEN on $SHA). Re-run tools/pre_snapshot.sh on THIS tree before snapshotting." >&2
  exit 1
fi
echo "GATE FRESHNESS: GREEN — tree matches the full-green gate ($WHEN, $SHA)"
