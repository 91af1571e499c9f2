#!/usr/bin/env python3
"""Compose a SCALING_sf{N}.json record from two TimeQ logs (scale probe
over the iterative/dedup/curation tail — the families whose scaling is
round- or pair-space-bound and therefore least predictable from the
full-contract 10x record).
Usage: compose_sf3.py <small_log> <big_log> [factor] [out_json]"""
import json, re, sys

FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 30
OUT = sys.argv[4] if len(sys.argv) > 4 else "SCALING_sf3.json"
DIRNAME = f"sf{FACTOR // 10}"

def parse(path):
    out = {}
    for line in open(path):
        m = re.match(r"\[timeq\] (\S+)\s+([0-9.]+) s", line.strip())
        if m:
            out[m.group(1)] = float(m.group(2))
    return out

small, big = parse(sys.argv[1]), parse(sys.argv[2])
per = {}
for q in sorted(set(small) & set(big)):
    r = round(big[q] / small[q], 2) if small[q] > 0 else None
    per[q] = {"sf0.1_sec": small[q], "big_sec": big[q], "ratio": r}
# flag anything scaling worse than half-linear (factor/2) — at 30x that
# is 15x, at 100x it is 50x
bar = FACTOR / 2.0
over = {q: v["ratio"] for q, v in per.items()
        if v["sf0.1_sec"] >= 0.2 and v["ratio"] and v["ratio"] > bar}
out = {
    "probe": (f"weak-scaling probe at {FACTOR}x rows; TimeQ min-of-2 "
              "noop-sink walls, local[32]. Scaled data: "
              f"graft.tools.ScaleUp factor {FACTOR} (disjoint per-copy "
              "key spaces)"),
    "source": "/root/testdata/sf0.1",
    "scaled_dir": (f"target/{DIRNAME} (regenerate: sbt 'runMain "
                   "graft.tools.ScaleUp /root/testdata/sf0.1 "
                   f"/root/repo/target/{DIRNAME} {FACTOR}')"),
    "rows_factor": FACTOR,
    "n_queries": len(per),
    f"over_half_linear_{bar:.0f}x": over,
    "queries": per,
}
json.dump(out, open(OUT, "w"), indent=1)
print(f"{len(per)} queries; over {bar:.0f}x: {over}")
