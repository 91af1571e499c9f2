#!/bin/bash
# r11: re-dump the one query whose SPARK-side result changed at 10x rows
# (d_embed_neardup — the candidate-bounded re-anchor; at sf1 the adaptive
# LSH bit count is > 0, so the pair set legitimately differs from the old
# all-pairs dump) + regenerate oracle_sql.json (the graph-family oracles
# gained the QUALIFY degree-cap mirrors — results unchanged since the
# caps never bind on uniform fixtures), then replay the FULL 287-query
# oracle compare at 10x rows -> CORRECTNESS_sf1.json.
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
SPARK_GRAFT_NO_COALESCE=1 java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Verify /root/repo/target/sf1 /root/repo/target/verify_sf1_full d_embed_neardup,x_cuped \
  > /tmp/verify_sf1_redump.log 2>&1
ORACLE_TIMEOUT=240 OUT_JSON=/root/repo/CORRECTNESS_sf1.json \
  python3 tools/check.py /root/repo/target/sf1 /root/repo/target/verify_sf1_full \
  > /tmp/check_sf1_full2.log 2>&1
tail -3 /tmp/check_sf1_full2.log
echo SF1_RECHECK_DONE
