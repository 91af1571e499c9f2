#!/bin/bash
# Round-11 verdict item 1: FULL-contract weak-scaling campaign at 100x
# rows (the SCALING_sf3_full protocol at 100x — both legs full min-of-2
# Bench runs back-to-back). Both r10 100x-only defects were invisible at
# 30x; this closes the "visible only at 100x on an untested query" hole.
# Run SINGLE-TENANT on the committed engine SHA.
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() {
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_TWO_PASS=1 \
  java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g \
    -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
}
if [ ! -d target/sf10 ]; then
  echo "== ScaleUp 100x =="
  java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g \
    -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.ScaleUp /root/testdata/sf0.1 /root/repo/target/sf10 100 || exit 1
fi
echo "== bench sf0.1 (full, two-pass) =="
run /root/testdata/sf0.1 > /tmp/bench_sf01_r11.log 2>&1 && cp bench_local.json tools/bench_sf01_r11.json || { tail -5 /tmp/bench_sf01_r11.log; exit 1; }
echo "== bench sf10 (full, two-pass) =="
run /root/repo/target/sf10 > /tmp/bench_sf10_r11.log 2>&1 && cp bench_local.json tools/bench_sf10_r11.json || { tail -5 /tmp/bench_sf10_r11.log; exit 1; }
echo "== compose =="
python3 tools/compose_sf10_full.py tools/bench_sf01_r11.json tools/bench_sf10_r11.json
echo SF10_FULL_CAMPAIGN_DONE
