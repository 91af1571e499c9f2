#!/bin/bash
# Round-10 verdict item 3: skewed-data scale probe. Generates the zipf
# twin of target/sf1 (same rows, hot-key layout), times the join/window/
# graph tail on both, composes SCALING_skew.json. SINGLE-TENANT.
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
J() { java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"; }
TAIL="tpch_q3 tpch_q9 tpch_q13 tpch_q18 tpch_q21 j1_left_join a1_aggregates p9_latest_per_key q_top_spenders x_sessionize x_session_window x_user_state x_rolling_actives x_event_window x_pagerank x_triangles"
if [ ! -d target/sf1 ]; then
  echo "== ScaleUp 10x uniform =="
  J graft.tools.ScaleUp /root/testdata/sf0.1 /root/repo/target/sf1 10 || exit 1
fi
if [ ! -d target/sf1skew ]; then
  echo "== ScaleUp 10x zipf =="
  J graft.tools.ScaleUp /root/testdata/sf0.1 /root/repo/target/sf1skew 10 zipf || exit 1
fi
echo "== TimeQ uniform (target/sf1) =="
J graft.tools.TimeQ /root/repo/target/sf1 $TAIL 2>/dev/null | tee /tmp/skew_uniform.log | grep timeq
echo "== TimeQ skewed (target/sf1skew) =="
J graft.tools.TimeQ /root/repo/target/sf1skew $TAIL 2>/dev/null | tee /tmp/skew_skewed.log | grep timeq
python3 tools/compose_skew.py /tmp/skew_uniform.log /tmp/skew_skewed.log
echo SKEW_PROBE_DONE
