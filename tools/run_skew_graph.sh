#!/bin/bash
# Round-11 verdict item 6: purchase-skew graph probe. Generates the
# zipfp twin of target/sf1 (zipf layout PLUS purchase user_id skew —
# the hot-purchaser workload r10 scoped out), times the co-purchase
# graph family on both, merges into SCALING_skew.json. SINGLE-TENANT.
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
J() { java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"; }
TAIL="x_pagerank x_triangles x_link_predict x_bfs_reach x_kcore x_sssp x_label_prop x_modularity x_hierarchy x_recursive_cte"
if [ ! -d target/sf1 ]; then
  echo "== ScaleUp 10x uniform =="
  J graft.tools.ScaleUp /root/testdata/sf0.1 /root/repo/target/sf1 10 || exit 1
fi
if [ ! -d target/sf1zipfp ]; then
  echo "== ScaleUp 10x zipfp (purchase-skewed) =="
  J graft.tools.ScaleUp /root/testdata/sf0.1 /root/repo/target/sf1zipfp 10 zipfp || exit 1
fi
echo "== TimeQ uniform (target/sf1) =="
J graft.tools.TimeQ /root/repo/target/sf1 $TAIL 2>/dev/null | tee /tmp/skewp_uniform.log | grep timeq
echo "== TimeQ purchase-skewed (target/sf1zipfp) =="
J graft.tools.TimeQ /root/repo/target/sf1zipfp $TAIL 2>/dev/null | tee /tmp/skewp_skewed.log | grep timeq
python3 tools/compose_skew_graph.py /tmp/skewp_uniform.log /tmp/skewp_skewed.log
echo SKEW_GRAPH_PROBE_DONE
