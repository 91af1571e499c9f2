#!/bin/bash
# r11 verdict item 8: streaming-at-scale probe. Runs graft.tools
# .StreamScale against the 10x-rows event stream (target/sf1 staged as
# a time-ordered multi-file landing) and composes SCALING_streaming
# .json with per-path throughput and bounded-state evidence.
# Usage: bash tools/run_streamscale.sh [sfDir] [files]
set -u
cd /root/repo
SF="${1:-/root/repo/target/sf1}"
FILES="${2:-24}"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
rm -rf target/streamscale
java $AO -Dspark.ui.enabled=false -Xmx48g \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.tools.StreamScale "$SF" "$FILES" 2>&1 | tee /tmp/streamscale.log \
  | grep -E "\[streamscale\]"
python3 - <<'PY'
import json, re
paths = []
staged = None
for line in open("/tmp/streamscale.log"):
    m = re.search(r"\[streamscale\] json=(\{.*\})", line)
    if m:
        paths.append(json.loads(m.group(1)))
    m2 = re.search(r"staged (\d+) rows in (\d+) files from (\S+)", line)
    if m2:
        staged = {"rows": int(m2.group(1)), "files": int(m2.group(2)),
                  "src": m2.group(3)}
if not paths:
    raise SystemExit("run_streamscale: no path records parsed")
out = {
  "probe": ("stateful streaming paths driven by a 10x-rows event stream "
            "(sf1 events staged as a time-ordered landing dir, one file "
            "per micro-batch, noop sink, fresh checkpoint per path). "
            "rows_per_sec = total input rows / wall including all "
            "micro-batch scheduling; bounded-state evidence = "
            "max_state_rows stays far below total rows when watermark "
            "expiry works (sessions close, dedup ids age out, join "
            "buffers drain)."),
  "staged": staged,
  "paths": {p["path"]: {k: v for k, v in p.items() if k != "path"}
            for p in paths},
}
json.dump(out, open("SCALING_streaming.json", "w"), indent=1)
print("wrote SCALING_streaming.json:",
      {k: v["rows_per_sec"] for k, v in out["paths"].items()})
PY
echo STREAMSCALE_DONE
