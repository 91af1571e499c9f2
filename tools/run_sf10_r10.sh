#!/bin/bash
# Round-10 100x-rows probe over THIS round's new/changed operators:
# the d_semantic_keep LSH flatten, the incremental image index, the
# statistics-reordered join chain, plus the r9 second-session queries
# that only had 30x evidence. Writes SCALING_sf10_r10.json; the r9
# SCALING_sf10.json record stands for the untouched dedup/graph tail.
# Single-tenant.
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
J() { java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx28g \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"; }
TAIL="d_semantic_keep m_image_incremental x_stats_join_order x_phrase_search x_kcenter_select x_dsir_select x_doremi_mix"
if [ ! -d target/sf10 ]; then
  echo "== ScaleUp 100x =="
  J graft.tools.ScaleUp /root/testdata/sf0.1 /root/repo/target/sf10 100 || exit 1
fi
echo "== TimeQ sf0.1 =="
J graft.tools.TimeQ /root/testdata/sf0.1 $TAIL 2>/dev/null | tee /tmp/sf10_r10_small.log | grep timeq
echo "== TimeQ sf10 =="
J graft.tools.TimeQ /root/repo/target/sf10 $TAIL 2>/dev/null | tee /tmp/sf10_r10_big.log | grep timeq
python3 tools/compose_sf3.py /tmp/sf10_r10_small.log /tmp/sf10_r10_big.log 100 SCALING_sf10_r10.json
echo SF10_R10_PROBE_DONE
