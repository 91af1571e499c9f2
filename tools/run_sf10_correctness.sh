#!/bin/bash
# r11 verdict item 2: budgeted FULL-contract correctness sweep at 100x
# rows. The r11 campaign measured performance for all 287 queries at
# sf10 but hash-verified only 11; this closes the "runs at 100x" vs
# "is right at 100x" gap. Engine dumps all 287 via Verify, then
# check.py replays every DuckDB oracle with a per-oracle timeout —
# any oracle too slow at 100x is recorded as an explicit cut in the
# verdict JSON (never a silent skip), to be adjudicated in
# CORRECTNESS_sf10.json. Usage: bash tools/run_sf10_correctness.sh
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
echo "== engine: Verify all queries at sf10 =="
SPARK_GRAFT_NO_COALESCE=1 java $AO -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -Xmx48g \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify /root/repo/target/sf10 /root/repo/target/verify_sf10_full \
  > /tmp/verify_sf10_full.log 2>&1 || { tail -5 /tmp/verify_sf10_full.log; exit 1; }
grep -c "ok$" /tmp/verify_sf10_full.log
echo "== oracle: DuckDB replay, per-oracle timeout =="
ORACLE_TIMEOUT="${ORACLE_TIMEOUT:-900}" \
  OUT_JSON=/root/repo/target/correctness_sf10_full.json \
  python3 tools/check.py /root/repo/target/sf10 /root/repo/target/verify_sf10_full \
  2>&1 | tail -25
echo SF10_FULL_CORRECTNESS_DONE
