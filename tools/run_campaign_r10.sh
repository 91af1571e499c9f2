#!/bin/bash
# Round-10 record campaign (runbook order, SINGLE-TENANT, committed SHA):
#   1. full two-pass bench at sf0.1, sf1 (10x), sf3 (30x)
#   2. compose SCALING_sf1.json (refresh, 287-query contract) and
#      SCALING_sf3_full.json (verdict item 2: matched-conditions 30x)
#   3. skew probe (verdict item 3): TimeQ tail uniform vs zipf twin
#   4. DuckDB crossover at all three SFs (verdict item 6)
#   5. sf1 full correctness (Verify + DuckDB oracle at 10x rows)
# Prereq: target/sf1, target/sf1skew, target/sf3 exist (ScaleUp).
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() {
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_TWO_PASS=1 \
  java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g \
    -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench
}
echo "== bench sf0.1 =="
run /root/testdata/sf0.1 > /tmp/bench_sf01_r10.log 2>&1 && cp bench_local.json tools/bench_sf01_r10.json || { tail -5 /tmp/bench_sf01_r10.log; exit 1; }
echo "== bench sf1 =="
run /root/repo/target/sf1 > /tmp/bench_sf1_r10.log 2>&1 && cp bench_local.json tools/bench_sf1_r10.json || { tail -5 /tmp/bench_sf1_r10.log; exit 1; }
echo "== bench sf3 =="
run /root/repo/target/sf3 > /tmp/bench_sf3_r10.log 2>&1 && cp bench_local.json tools/bench_sf3_r10.json || { tail -5 /tmp/bench_sf3_r10.log; exit 1; }
echo "== compose scaling records =="
python3 tools/compose_scaling.py tools/bench_sf01_r10.json tools/bench_sf1_r10.json
python3 tools/compose_sf3_full.py tools/bench_sf01_r10.json tools/bench_sf3_r10.json
echo "== skew probe =="
J() { java $AO -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" "$@"; }
TAIL="tpch_q3 tpch_q9 tpch_q13 tpch_q18 tpch_q21 j1_left_join a1_aggregates p9_latest_per_key q_top_spenders x_sessionize x_session_window x_user_state x_rolling_actives x_event_window x_pagerank x_triangles"
J graft.tools.TimeQ /root/repo/target/sf1 $TAIL 2>/dev/null | tee /tmp/skew_uniform.log | grep timeq
J graft.tools.TimeQ /root/repo/target/sf1skew $TAIL 2>/dev/null | tee /tmp/skew_skewed.log | grep timeq
python3 tools/compose_skew.py /tmp/skew_uniform.log /tmp/skew_skewed.log
echo "== duckdb crossover =="
python3 tools/bench_duckdb.py /root/testdata/sf0.1 tools/bench_sf01_r10.json 3 > /tmp/duckdb_sf01.log 2>&1 && tail -3 /tmp/duckdb_sf01.log
python3 tools/bench_duckdb.py /root/repo/target/sf1 tools/bench_sf1_r10.json 3 > /tmp/duckdb_sf1.log 2>&1 && tail -3 /tmp/duckdb_sf1.log
python3 tools/bench_duckdb.py /root/repo/target/sf3 tools/bench_sf3_r10.json 3 > /tmp/duckdb_sf3.log 2>&1 && tail -3 /tmp/duckdb_sf3.log
echo "== sf1 correctness =="
bash tools/run_sf1_correctness.sh
echo CAMPAIGN_R10_DONE
