#!/bin/bash
# r11 verdict item 1: CORRECTNESS spot-check at 100x rows on the worst
# wall-ratio queries from SCALING_sf10_full.json. Engine dumps via
# Verify (multi-part parquet), oracle replay via check.py with the
# in-DuckDB big-output hash path and an explicit per-oracle timeout —
# any oracle too slow at 100x is recorded as an explicit cut, never a
# silent skip. Usage: bash tools/run_sf10_spotcheck.sh q1,q2,...
set -u
cd /root/repo
NAMES="${1:?comma-separated query names}"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_NO_COALESCE=1 java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify /root/repo/target/sf10 /root/repo/target/verify_sf10_spot "$NAMES" \
  > /tmp/verify_sf10_spot.log 2>&1 || { tail -5 /tmp/verify_sf10_spot.log; exit 1; }
ONLY="$NAMES" ORACLE_TIMEOUT=900 OUT_JSON=/root/repo/target/correctness_sf10_spot.json \
  python3 tools/check.py /root/repo/target/sf10 /root/repo/target/verify_sf10_spot \
  2>&1 | tail -15
echo SF10_SPOTCHECK_DONE
