#!/usr/bin/env python3
"""Compose SCALING_sf10_full.json from two FULL-contract Bench records
taken back-to-back on the same host (matched conditions by construction):
  tools/bench_sf01_r11.json  (SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1)
  tools/bench_sf10_r11.json  (SPARK_GRAFT_SF_DIR=target/sf10, 100x rows)
Both runs use SPARK_GRAFT_TWO_PASS=1 (per-query min over two full passes).
The scale bound of interest at 100x rows is HALF-LINEAR = 50x.

r11 addition — the shuffle-volume regression gate: both Bench records
now carry per-query "shuffle_mb" (read+write bytes from task metrics,
pass 1). For the top-20 big-leg movers the campaign asserts shuffle
bytes grew at most LINEARLY in rows (ratio <= 100x with a 1.2 tolerance
for partial-agg layout noise); anything over is listed for adjudication
— a super-linear shuffle means a plan stopped being map-side-bounded
even if wall clock hides it behind parallelism."""
import json, sys

SMALL = sys.argv[1] if len(sys.argv) > 1 else "tools/bench_sf01_r11.json"
BIG = sys.argv[2] if len(sys.argv) > 2 else "tools/bench_sf10_r11.json"
small = json.load(open(SMALL))
big = json.load(open(BIG))
qs_s, qs_b = small["queries"], big["queries"]
common = sorted(set(qs_s) & set(qs_b))

per_query = {}
for q in common:
    a, b = float(qs_s[q]), float(qs_b[q])
    per_query[q] = {"sf0.1_sec": round(a, 3), "sf10_sec": round(b, 3),
                    "ratio": round(b / a, 2) if a > 0 else None}

ratios = {q: v["ratio"] for q, v in per_query.items()
          # sub-200ms small-leg walls are fixed overhead (session,
          # planning, file listing); ratios over them measure noise
          if v["sf0.1_sec"] >= 0.2 and v["ratio"] is not None}
worst = sorted(ratios.items(), key=lambda kv: -kv[1])

# ---- shuffle-volume gate (top-20 big-leg wall movers) ----
# Guard: an input without shuffle_mb (older record, or a clipped capture
# passed instead of bench_local.json) would default every volume to 0 and
# the gate would silently report "nothing over linear" — 'no data' must
# not read as 'pass'.
missing_shuffle = [name for name, rec in (("small", small), ("big", big))
                   if "shuffle_mb" not in rec]
if missing_shuffle:
    raise SystemExit(
        f"compose_sf10_full: input record(s) {missing_shuffle} lack "
        "'shuffle_mb' — the shuffle-volume gate cannot run; pass full "
        "bench_local.json-style records (Bench emits shuffle_mb since r10)")
sh_s = small.get("shuffle_mb", {})
sh_b = big.get("shuffle_mb", {})
movers = sorted(common, key=lambda q: -float(qs_b[q]))[:20]
ROWS = 100.0
TOL = 1.2  # partial-agg/AQE layout noise allowance on the linear bound
shuffle_gate = {}
shuffle_over = {}
for q in movers:
    a = float(sh_s.get(q, 0.0))
    b = float(sh_b.get(q, 0.0))
    if a < 1.0:   # sub-MB small legs are metadata noise, record absolute
        shuffle_gate[q] = {"sf0.1_mb": round(a, 2), "sf10_mb": round(b, 1),
                           "ratio": None}
        continue
    r = b / a
    shuffle_gate[q] = {"sf0.1_mb": round(a, 1), "sf10_mb": round(b, 1),
                       "ratio": round(r, 1)}
    if r > ROWS * TOL:
        shuffle_over[q] = round(r, 1)

out = {
    "probe": ("weak-scaling at 100x rows, FULL contract, min-of-2 full "
              "passes per SF (SPARK_GRAFT_TWO_PASS=1), both records taken "
              "back-to-back on the same host so every ratio is "
              "matched-conditions. Scaled data: graft.tools.ScaleUp "
              "(disjoint per-copy key spaces, fact-accretion weak scaling)"),
    "source": "/root/testdata/sf0.1",
    "scaled_dir": "target/sf10 (regenerate: sbt 'runMain graft.tools.ScaleUp /root/testdata/sf0.1 /root/repo/target/sf10 100')",
    "rows_factor": 100,
    "half_linear_bound": 50.0,
    "passes": 2,
    "cpus": 32,
    "n_queries": len(common),
    "total_sf0.1_sec": round(sum(float(v) for v in qs_s.values()), 1),
    "total_sf10_sec": round(sum(float(v) for v in qs_b.values()), 1),
    "failed_sf0.1": small.get("failed", []),
    "failed_sf10": big.get("failed", []),
    "over_50x": {q: r for q, r in worst if r > 50.0},
    # filled by hand after per-entry adjudication (compare BIG-leg
    # absolute walls across records before reading a ratio as real)
    "over_50x_adjudication": {},
    "worst_10": dict(worst[:10]),
    "shuffle_gate_top20_movers": shuffle_gate,
    "shuffle_over_linear": shuffle_over,
    "queries": per_query,
}
json.dump(out, open("SCALING_sf10_full.json", "w"), indent=1, sort_keys=False)
print(f"{len(common)} queries; total {out['total_sf0.1_sec']}s -> {out['total_sf10_sec']}s "
      f"({out['total_sf10_sec']/out['total_sf0.1_sec']:.2f}x)")
print(f"worst ratios: {worst[:8]}")
print(f"over 50x: {[q for q, r in worst if r > 50]}")
print(f"shuffle over linear: {shuffle_over}")
