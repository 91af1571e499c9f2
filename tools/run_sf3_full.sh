#!/bin/bash
# Round-10 verdict item 2: FULL-contract weak-scaling campaign at 30x
# rows (matched conditions -- both legs are full min-of-2 Bench runs taken
# back-to-back, the SCALING_sf1 protocol at 30x). Run SINGLE-TENANT on the
# committed engine SHA.
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() {
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_TWO_PASS=1 \
  java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g \
    -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
}
if [ ! -d target/sf3 ]; then
  echo "== ScaleUp 30x =="
  java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g \
    -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.ScaleUp /root/testdata/sf0.1 /root/repo/target/sf3 30 || exit 1
fi
echo "== bench sf0.1 (full, two-pass) =="
run /root/testdata/sf0.1 > /tmp/bench_sf01_r10.log 2>&1 && cp bench_local.json tools/bench_sf01_r10.json || { tail -5 /tmp/bench_sf01_r10.log; exit 1; }
echo "== bench sf3 (full, two-pass) =="
run /root/repo/target/sf3 > /tmp/bench_sf3_r10.log 2>&1 && cp bench_local.json tools/bench_sf3_r10.json || { tail -5 /tmp/bench_sf3_r10.log; exit 1; }
echo "== compose =="
python3 tools/compose_sf3_full.py tools/bench_sf01_r10.json tools/bench_sf3_r10.json
echo SF3_FULL_CAMPAIGN_DONE
