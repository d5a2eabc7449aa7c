#!/usr/bin/env python3
"""Compare two Bench JSON artifacts (complete files or truncated log tails).

Usage: python3 scripts/bench_compare.py <old.json> <new.json> [ratio]

Prints per-query old→new timings sorted by regression ratio, flagging
queries slower than `ratio` (default 1.3) and >0.3s absolute delta.
"""
import json
import re
import sys


def load(path):
    txt = open(path).read()
    # driver artifacts wrap a (possibly truncated) log tail in {"tail": ...}
    try:
        wrapper = json.loads(txt)
        if isinstance(wrapper, dict) and "tail" in wrapper:
            txt = wrapper["tail"]
    except json.JSONDecodeError:
        pass
    # artifact may be a raw log tail; find the last {"metric": ...} line
    m = None
    for line in txt.splitlines():
        if '"metric"' in line and '"queries"' in line:
            m = line[line.index('{"metric"'):]
    if m is None:
        m = txt
    try:
        return json.loads(m)["queries"]
    except json.JSONDecodeError:
        # truncated tail: salvage "name":secs pairs
        pairs = re.findall(r'"([A-Za-z0-9_]+)":([0-9.]+)', m)
        return {k: float(v) for k, v in pairs if k not in ("value",)}


old, new = load(sys.argv[1]), load(sys.argv[2])
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
common = sorted(set(old) & set(new), key=lambda q: new[q] / max(old[q], 1e-9),
                reverse=True)
regressions = 0
for q in common:
    r = new[q] / max(old[q], 1e-9)
    flag = ""
    if r > thresh and new[q] - old[q] > 0.3:
        flag = "  <-- REGRESSION"
        regressions += 1
    print(f"{q:38s} {old[q]:7.2f} -> {new[q]:7.2f}  ({r:5.2f}x){flag}")
print(f"\ncommon {len(common)}: total {sum(old[q] for q in common):.1f} -> "
      f"{sum(new[q] for q in common):.1f} s; "
      f"only-old: {sorted(set(old)-set(new))}; "
      f"only-new: {sorted(set(new)-set(old))}")
sys.exit(1 if regressions else 0)
