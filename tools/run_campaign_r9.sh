#!/bin/bash
# Round-9 record refresh (runbook order): sf0.1 bench -> sf1 bench ->
# compose SCALING_sf1.json -> sf1 full correctness. Run SINGLE-TENANT on
# the committed final engine SHA; target/sf1 must exist (ScaleUp).
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() {
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_TWO_PASS=1 \
  java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx16g \
    -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
}
echo "== bench sf0.1 =="
run /root/testdata/sf0.1 > /tmp/bench_sf01_r9.log 2>&1 && cp bench_local.json tools/bench_sf01_r9.json || exit 1
echo "== bench sf1 =="
run /root/repo/target/sf1 > /tmp/bench_sf1_r9.log 2>&1 && cp bench_local.json tools/bench_sf1_r9.json || exit 1
echo "== compose =="
python3 tools/compose_scaling.py tools/bench_sf01_r9.json tools/bench_sf1_r9.json
echo "== sf1 correctness =="
bash tools/run_sf1_correctness.sh
echo CAMPAIGN_R9_DONE
