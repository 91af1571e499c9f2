#!/usr/bin/env python3
"""Merge the purchase-skew graph-family probe into SCALING_skew.json
(round-11 verdict item 6 — the hole the r10 campaign scoped out).

Twin pair at the SAME row count (10x rows):
  target/sf1      uniform ScaleUp layout
  target/sf1zipfp ScaleUp zipfp: the zipf layout PLUS purchase user_id
                  skew (10/5/2.5 pct of ALL purchase rows on users
                  0/1/2) — each hot purchaser touches ~a tenth of every
                  copy's product keys and would be a near-complete
                  co-purchase hub; the degree-capped edge derivation
                  (keys/user <= 1024, users/key <= 256, smallest-id
                  evidence-weighted truncation, oracle-mirrored) is what
                  bounds the graph family's work here. Unlike the layout
                  twin this IS a workload change — the capped edge set
                  differs by construction — so the bar reads "the graph
                  family's wall survives a hot purchaser", not "identical
                  work, different layout"."""
import json, re, sys

UNI = sys.argv[1] if len(sys.argv) > 1 else "/tmp/skewp_uniform.log"
SKW = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skewp_skewed.log"

def parse(path):
    out = {}
    for line in open(path):
        m = re.match(r"\[timeq\] (\S+)\s+([0-9.]+) s", line)
        if m:
            out[m.group(1)] = float(m.group(2))
    return out

uni, skw = parse(UNI), parse(SKW)
common = sorted(set(uni) & set(skw))
per_query = {}
for q in common:
    a, b = uni[q], skw[q]
    per_query[q] = {"uniform_sec": round(a, 3), "skewed_sec": round(b, 3),
                    "ratio": round(b / a, 2) if a > 0 else None}
ratios = {q: v["ratio"] for q, v in per_query.items()
          if v["uniform_sec"] >= 0.2 and v["ratio"] is not None}
worst = sorted(ratios.items(), key=lambda kv: -kv[1])

doc = json.load(open("SCALING_skew.json"))
doc["graph_family_purchase_skew"] = {
    "probe": ("graph family over the co-purchase graph, uniform "
              "(target/sf1) vs purchase-skewed twin (target/sf1zipfp, "
              "ScaleUp zipfp: zipf layout PLUS purchase user_id skew). "
              "TimeQ min-of-2 per leg, back-to-back on the same host."),
    "semantics_note": ("the degree caps are evidence-weighted truncation "
                       "(keys/user <= 1024, users/key <= 256, smallest "
                       "ids kept): hot purchasers and hot keys are "
                       "stopword-like — their marginal pairs carry the "
                       "least co-purchase evidence at quadratic cost. "
                       "The caps never bind on uniform fixtures (max 25 "
                       "keys/user, 218 users/key at every probed SF); "
                       "the oracle replays the truncation exactly "
                       "(QUALIFY row_number mirrors)."),
    "bar": "no entry over 2.0x its uniform twin",
    "n_queries": len(common),
    "over_2x": {q: r for q, r in worst if r > 2.0},
    "worst_8": dict(worst[:8]),
    "queries": per_query,
}
# The scope note in the r10 record is now closed — point at the new section.
doc["purchase_skew_scope_note"] = (
    "CLOSED in r11: see graph_family_purchase_skew — the degree-capped "
    "edge derivation bounds the hot-purchaser hub and the graph tail is "
    "measured on a purchase-skewed twin.")
json.dump(doc, open("SCALING_skew.json", "w"), indent=1, sort_keys=False)
print(f"{len(common)} queries; worst: {worst[:10]}")
print(f"over 2x: {[q for q, r in worst if r > 2.0]}")
