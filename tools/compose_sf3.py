#!/usr/bin/env python3
"""Compose SCALING_sf3.json from two TimeQ logs (30x-rows probe over the
iterative/dedup/curation tail — the families whose scaling is round- or
pair-space-bound and therefore least predictable from the 10x record).
Usage: compose_sf3.py <small_log> <big_log> [notes_json]"""
import json, re, sys

def parse(path):
    out = {}
    for line in open(path):
        m = re.match(r"\[timeq\] (\S+)\s+([0-9.]+) s", line.strip())
        if m:
            out[m.group(1)] = float(m.group(2))
    return out

small, big = parse(sys.argv[1]), parse(sys.argv[2])
notes = json.load(open(sys.argv[3])) if len(sys.argv) > 3 else {}
per = {}
for q in sorted(set(small) & set(big)):
    r = round(big[q] / small[q], 2) if small[q] > 0 else None
    per[q] = {"sf0.1_sec": small[q], "sf3_sec": big[q], "ratio": r}
    if q in notes:
        per[q]["diagnosis"] = notes[q]
over = {q: v["ratio"] for q, v in per.items()
        if v["sf0.1_sec"] >= 0.2 and v["ratio"] and v["ratio"] > 15.0}
missing = [q for q in over if "diagnosis" not in per[q]]
out = {
    "probe": ("weak-scaling probe at 30x rows over the iterative graph / "
              "dedup / curation tail; TimeQ min-of-2 noop-sink walls, "
              "local[32]. Scaled data: graft.tools.ScaleUp factor 30 "
              "(disjoint per-copy key spaces)"),
    "source": "/root/testdata/sf0.1",
    "scaled_dir": "target/sf3 (regenerate: sbt 'runMain graft.tools.ScaleUp /root/testdata/sf0.1 /root/repo/target/sf3 30')",
    "rows_factor": 30,
    "n_queries": len(per),
    "over_15x": over,
    "queries": per,
}
json.dump(out, open("SCALING_sf3.json", "w"), indent=1)
print(f"{len(per)} queries; over_15x: {over}")
if missing:
    print(f"DIAGNOSIS MISSING for: {missing}")
