#!/bin/bash
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# refresh the one dump whose SPARK side changed + regenerate oracle_sql.json
SPARK_GRAFT_NO_COALESCE=1 java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify /root/repo/target/sf1 /root/repo/target/verify_sf1_full s3_file_identity \
  > /tmp/verify_sf1_redump.log 2>&1
ORACLE_TIMEOUT=240 OUT_JSON=/root/repo/CORRECTNESS_sf1.json \
  python3 tools/check.py /root/repo/target/sf1 /root/repo/target/verify_sf1_full \
  > /tmp/check_sf1_full2.log 2>&1
tail -3 /tmp/check_sf1_full2.log
echo SF1_RECHECK_DONE
