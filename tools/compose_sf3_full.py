#!/usr/bin/env python3
"""Compose SCALING_sf3_full.json from two FULL-contract Bench records
taken back-to-back on the same host (matched conditions by construction
-- the round-9 lesson: tail probes with cold/warm denominator mismatch
manufacture false ratio flags):
  tools/bench_sf01_r10.json  (SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1)
  tools/bench_sf3_r10.json   (SPARK_GRAFT_SF_DIR=target/sf3, 30x rows)
Both runs use SPARK_GRAFT_TWO_PASS=1 (per-query min over two full passes).
The scale bound of interest at 30x rows is HALF-LINEAR = 15x."""
import json, sys

SMALL = sys.argv[1] if len(sys.argv) > 1 else "tools/bench_sf01_r10.json"
BIG = sys.argv[2] if len(sys.argv) > 2 else "tools/bench_sf3_r10.json"
small = json.load(open(SMALL))
big = json.load(open(BIG))
qs_s, qs_b = small["queries"], big["queries"]
common = sorted(set(qs_s) & set(qs_b))

per_query = {}
for q in common:
    a, b = float(qs_s[q]), float(qs_b[q])
    per_query[q] = {"sf0.1_sec": round(a, 3), "sf3_sec": round(b, 3),
                    "ratio": round(b / a, 2) if a > 0 else None}

ratios = {q: v["ratio"] for q, v in per_query.items()
          # sub-200ms small-leg walls are fixed overhead (session,
          # planning, file listing); ratios over them measure noise
          if v["sf0.1_sec"] >= 0.2 and v["ratio"] is not None}
worst = sorted(ratios.items(), key=lambda kv: -kv[1])
out = {
    "probe": ("weak-scaling at 30x rows, FULL contract, min-of-2 full "
              "passes per SF (SPARK_GRAFT_TWO_PASS=1), both records taken "
              "back-to-back on the same host so every ratio is "
              "matched-conditions. Scaled data: graft.tools.ScaleUp "
              "(disjoint per-copy key spaces, fact-accretion weak scaling)"),
    "source": "/root/testdata/sf0.1",
    "scaled_dir": "target/sf3 (regenerate: sbt 'runMain graft.tools.ScaleUp /root/testdata/sf0.1 /root/repo/target/sf3 30')",
    "rows_factor": 30,
    "half_linear_bound": 15.0,
    "passes": 2,
    "cpus": 32,
    "n_queries": len(common),
    "total_sf0.1_sec": round(sum(float(v) for v in qs_s.values()), 1),
    "total_sf3_sec": round(sum(float(v) for v in qs_b.values()), 1),
    "failed_sf0.1": small.get("failed", []),
    "failed_sf3": big.get("failed", []),
    "over_15x": {q: r for q, r in worst if r > 15.0},
    # filled by hand after per-entry adjudication (compare BIG-leg
    # absolute walls across records before reading a ratio as real)
    "over_15x_adjudication": {},
    "worst_10": dict(worst[:10]),
    "queries": per_query,
}
json.dump(out, open("SCALING_sf3_full.json", "w"), indent=1, sort_keys=False)
print(f"{len(common)} queries; total {out['total_sf0.1_sec']}s -> {out['total_sf3_sec']}s "
      f"({out['total_sf3_sec']/out['total_sf0.1_sec']:.2f}x)")
print(f"worst ratios: {worst[:8]}")
print(f"over 15x: {[q for q, r in worst if r > 15]}")
