#!/bin/bash
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() {
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_TWO_PASS=1 \
  java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx16g \
    -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
}
run /root/testdata/sf0.1 > /tmp/bench_sf01_v2.log 2>&1 && cp bench_local.json tools/bench_sf01_r7.json
run /root/repo/target/sf1 > /tmp/bench_sf1_v3.log 2>&1 && cp bench_local.json tools/bench_sf1_r7.json
echo BENCH_BOTH_DONE
