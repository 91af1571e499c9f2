#!/bin/bash
# r11 verdict item 4: kill a REAL executor process under each checkpoint
# mode and record survival. local-cluster[2,8,4096] = two separate
# executor JVMs; the probe SIGKILLs one mid-iteration (killAfterSec
# lands inside the CC loop). Composes SCALING_executor_kill.json.
# Usage: bash tools/run_killprobe.sh
set -u
cd /root/repo
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
run() {
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  java $AO -Dspark.ui.enabled=false \
    -Dspark.executor.extraClassPath=/root/repo/target/scala-2.13/classes \
    -Xmx8g -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.tools.KillProbe "$@" 2>&1 | grep -oP '(?<=\[killprobe\] json=).*'
}
REF=$(run reference)
REL=$(run reliable 400000 12)
LOC=$(run local 400000 12)
python3 - "$REF" "$REL" "$LOC" <<'PY'
import json, sys
ref, rel, loc = (json.loads(a) for a in sys.argv[1:4])
out = {
  "probe": ("real executor-process loss under each checkpoint mode: "
            "local-cluster[2,8,4096] (two separate executor JVMs), "
            "SIGKILL one CoarseGrainedExecutorBackend 12 s into the "
            "connected-components loop (400k-node chain graph, "
            "~40 s reference wall). The standalone worker relaunches a "
            "replacement executor; what differs is whether the loop's "
            "truncated-lineage state is recoverable by it."),
  "reference": ref, "reliable_with_kill": rel, "local_with_kill": loc,
  "verdict": {
    "reliable_survives": rel.get("outcome") == "completed"
        and rel.get("hash") == ref.get("hash")
        and rel.get("killed_pid") not in ("none", None),
    "reliable_hash_matches_reference": rel.get("hash") == ref.get("hash"),
    "local_fails_as_documented": loc.get("outcome") == "failed"
        and "CHECKPOINT" in loc.get("error", "").upper(),
    "reliable_recovery_overhead_x": round(
        rel["wall_sec"] / ref["wall_sec"], 2)
        if rel.get("outcome") == "completed" else None,
  },
}
json.dump(out, open("SCALING_executor_kill.json", "w"), indent=1)
print(json.dumps(out["verdict"]))
PY
echo KILLPROBE_DONE
