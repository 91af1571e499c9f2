#!/bin/bash
# Full-contract correctness gate at sf1 (10x rows, ScaleUp layout):
# Verify dumps every contract query, check.py replays every oracle in
# DuckDB over the same scaled tables; slow oracles are cut by
# ORACLE_TIMEOUT and recorded as such (never silently skipped).
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_NO_COALESCE=1 java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify /root/repo/target/sf1 /root/repo/target/verify_sf1_full \
  > /tmp/verify_sf1_full.log 2>&1
ORACLE_TIMEOUT=${ORACLE_TIMEOUT:-240} OUT_JSON=/root/repo/CORRECTNESS_sf1.json \
  python3 tools/check.py /root/repo/target/sf1 /root/repo/target/verify_sf1_full \
  > /tmp/check_sf1_full.log 2>&1
tail -3 /tmp/check_sf1_full.log
echo SF1_CORRECTNESS_DONE
