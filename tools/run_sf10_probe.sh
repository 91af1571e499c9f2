#!/bin/bash
# 100x-rows probe: the iterative/dedup/curation tail PLUS the relational
# anchors — "would this still work at 100x" evidence beyond the 10x/30x
# records. Single-tenant.
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
J() { java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx28g \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"; }
TAIL="x_pagerank x_bfs_reach x_sssp x_kcore x_label_prop x_triangles x_link_predict x_hierarchy x_fs_em d_dup_clusters x_curation_cc x_golden_record d_minhash_lsh d_ppjoin d_incremental m_image_neardup m_binary_scan tpch_q1 tpch_q18 tpch_q21 d_exact_dedup a1_aggregates"
if [ ! -d target/sf10 ]; then
  echo "== ScaleUp 100x =="
  J graft.tools.ScaleUp /root/testdata/sf0.1 /root/repo/target/sf10 100 || exit 1
fi
echo "== TimeQ sf0.1 =="
J graft.tools.TimeQ /root/testdata/sf0.1 $TAIL 2>/dev/null | tee /tmp/sf10_small.log | grep timeq
echo "== TimeQ sf10 =="
J graft.tools.TimeQ /root/repo/target/sf10 $TAIL 2>/dev/null | tee /tmp/sf10_big.log | grep timeq
python3 tools/compose_sf3.py /tmp/sf10_small.log /tmp/sf10_big.log 100 SCALING_sf10.json
echo SF10_PROBE_DONE
