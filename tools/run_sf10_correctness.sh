#!/bin/bash
# r11 verdict item 2: budgeted FULL-contract correctness sweep at 100x
# rows. Engine dumps all queries via Verify (skipped if the dump dir is
# already complete), then check.py replays every DuckDB oracle with a
# per-oracle timeout, STREAMING each verdict to a JSONL (kill-safe: the
# r12 first attempt lost ~85% of an 80-minute replay because the JSON
# only wrote at process end). Cuts and exclusions are explicit, never
# silent:
#  - ORACLE_TIMEOUT (default 600 s) cuts a slow oracle with a recorded
#    "oracle timeout".
#  - x_curation_cc is EXCLUDED by default: its DuckDB oracle (unrolled
#    CC rounds over the 100x co-purchase graph) spills >49 GB of DuckDB
#    temp and dies on local disk — recorded in the compose step, engine
#    behavior at 100x pinned by SCALING_sf10_full + the r11 graph-family
#    evidence instead.
# Usage: bash tools/run_sf10_correctness.sh
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
if [ ! -f /root/repo/target/verify_sf10_full/oracle_sql.json ] || [ "${FORCE_VERIFY:-0}" = "1" ]; then
  echo "== engine: Verify all queries at sf10 =="
  SPARK_GRAFT_NO_COALESCE=1 java $AO -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -Xmx48g \
    -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify /root/repo/target/sf10 /root/repo/target/verify_sf10_full \
    > /tmp/verify_sf10_full.log 2>&1 || { tail -5 /tmp/verify_sf10_full.log; exit 1; }
  grep -c "ok$" /tmp/verify_sf10_full.log
else
  echo "== engine dumps present, skipping Verify (FORCE_VERIFY=1 to redo) =="
fi
echo "== oracle: DuckDB replay, per-oracle timeout, JSONL-streamed =="
EXCLUDE="${EXCLUDE:-x_curation_cc}" \
  ORACLE_TIMEOUT="${ORACLE_TIMEOUT:-600}" \
  OUT_JSON=/root/repo/target/correctness_sf10_full.json \
  OUT_JSONL=/root/repo/target/correctness_sf10_full.jsonl \
  python3 tools/check.py /root/repo/target/sf10 /root/repo/target/verify_sf10_full \
  2>&1 | tee /tmp/check_sf10_full.log | tail -5
echo SF10_FULL_CORRECTNESS_DONE
