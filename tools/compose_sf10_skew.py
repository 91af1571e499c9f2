#!/usr/bin/env python3
"""Compose SCALING_sf10_skew.json: the r11-verdict item-5 probe — the
skewed-layout twin run at 100x rows (target/sf10 uniform vs
target/sf10zipfp, ScaleUp zipfp mode: zipf-head key mass 10/5/2.5 pct
of ALL rows on keys 0/1/2 for o_custkey, l_suppkey and user_id
INCLUDING purchase events). At 100x the hot key's absolute size crosses
spill thresholds the sf1 probe never reached; AQE skew-splitting and
the degree-capped co-purchase derivation are the mechanisms under test.
Bar: no entry over 2x its uniform twin, else adjudicated in-record.

Usage: python3 tools/compose_sf10_skew.py <uniform.log> <skewed.log>
(TimeQ logs over the same query tail, min-of-2 passes per leg.)"""
import json, re, sys

UNI = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skew10_uniform.log"
SKW = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skew10_skewed.log"

def parse(path):
    out = {}
    for line in open(path):
        m = re.match(r"\[timeq\] (\S+)\s+([0-9.]+) s", line)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out

uni, skw = parse(UNI), parse(SKW)
common = sorted(set(uni) & set(skw))
if not common:
    raise SystemExit("compose_sf10_skew: no common queries in the two logs")
per_query = {}
for q in common:
    a, b = uni[q], skw[q]
    per_query[q] = {"uniform_sec": round(a, 3), "skewed_sec": round(b, 3),
                    "ratio": round(b / a, 2) if a > 0 else None}
ratios = {q: v["ratio"] for q, v in per_query.items()
          if v["uniform_sec"] >= 0.2 and v["ratio"] is not None}
worst = sorted(ratios.items(), key=lambda kv: -kv[1])
out = {
    "probe": ("skewed-layout twin at 100x rows (zipfp: hot keys on "
              "o_custkey, l_suppkey, and user_id INCLUDING purchase "
              "events, so the degree-capped co-purchase graph and AQE "
              "skew-join both face a hot key whose ABSOLUTE size is "
              "100x the sf1 probe's). min-of-2 passes per leg (TimeQ), "
              "both legs back-to-back on the same host."),
    "uniform_dir": "target/sf10 (ScaleUp 100)",
    "skewed_dir": "target/sf10zipfp (ScaleUp 100 zipfp)",
    "bar": "no entry over 2.0x its uniform twin, else adjudicated",
    "n_queries": len(common),
    "over_2x": {q: r for q, r in worst if r > 2.0},
    "worst_8": dict(worst[:8]),
    "queries": per_query,
}
json.dump(out, open("SCALING_sf10_skew.json", "w"), indent=1, sort_keys=False)
print(f"{len(common)} queries; worst: {worst[:8]}")
