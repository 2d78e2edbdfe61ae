#!/usr/bin/env python3
"""Merge N graft.Bench JSON lines into one per-query-MEDIAN artifact.

The committed per-round bench artifacts are per-query medians across
three fresh-JVM full runs (single in-JVM runs swing +/-16 s on
identical plans — BENCHNOTES r13). This script is that fold:

  usage: merge_bench.py OUT IN1 IN2 [IN3 ...]

Every input must carry the same query set and zero failures; the
output line keeps the first input's sf (all inputs must agree),
replaces `runs` with the median-of-N provenance string, records the
per-run totals in a `note`, and sets value = sum of per-query medians.
"""
import json
import statistics
import sys

out, ins = sys.argv[1], sys.argv[2:]
runs = [json.loads(open(p).read().strip().splitlines()[0]) for p in ins]
keys = set(runs[0]["queries"])
for r in runs:
    assert set(r["queries"]) == keys, "query sets differ"
    assert not r.get("failed"), f"failures present: {r['failed']}"
    assert r["sf"] == runs[0]["sf"], \
        f"scale factors differ: {r['sf']} vs {runs[0]['sf']}"
merged = {k: round(statistics.median([r["queries"][k] for r in runs]), 4)
          for k in sorted(keys)}
total = round(sum(merged.values()), 3)
line = {
    "metric": "total", "value": total, "unit": "sec",
    "queries": merged, "failed": [],
    "runs": f"median-of-{len(runs)}-fresh-JVM-full-runs",
    "sf": runs[0]["sf"],
    "note": "per-run totals: " + ", ".join(
        f"{sum(r['queries'].values()):.1f}" for r in runs),
}
with open(out, "w") as f:
    f.write(json.dumps(line) + "\n")
print(f"{out}: {total} s over {len(keys)} queries "
      f"(runs: {line['note']})")
