#!/usr/bin/env python3
"""Fold the sf1 artifact: two bench halves (each per-query median of
the in-JVM RUNS=3) + dedup_simhash as the median of three fresh-JVM
solo medians -> BENCH_sf1.json.

  usage: merge_sf1.py OUT H1 H2 SOLO1 SOLO2 SOLO3
"""
import json
import statistics
import sys

out, h1p, h2p, *solos = sys.argv[1:]
h1 = json.loads(open(h1p).read().strip().splitlines()[0])
h2 = json.loads(open(h2p).read().strip().splitlines()[0])
assert not h1.get("failed") and not h2.get("failed"), "half failures"
assert not (set(h1["queries"]) & set(h2["queries"])), "halves overlap"
solo_vals = [json.loads(open(p).read().strip().splitlines()[0])
             ["queries"]["dedup_simhash"] for p in solos]
merged = dict(h1["queries"])
merged.update(h2["queries"])
merged["dedup_simhash"] = round(statistics.median(solo_vals), 4)
total = round(sum(merged.values()), 3)
line = {
    "metric": "total", "value": total, "unit": "sec",
    "queries": {k: merged[k] for k in sorted(merged)}, "failed": [],
    "runs": "halves median-of-3; dedup_simhash = median of 3 fresh-JVM "
            "solo medians",
    "sf": h1["sf"],
    "note": f"two halves merged ({len(h1['queries'])}+{len(h2['queries'])}) "
            "under the 10-min exec cap, median-of-3 each. dedup_simhash is "
            "the MEDIAN OF THREE FRESH-JVM solo medians ("
            + "/".join(f"{v:.1f}" for v in solo_vals) +
            f" -> {merged['dedup_simhash']:.1f}) per the r12 methodology "
            "- the documented cross-JVM JIT/GC band on byte-identical plans.",
}
with open(out, "w") as f:
    f.write(json.dumps(line) + "\n")
print(f"{out}: {total} s over {len(merged)} queries")
