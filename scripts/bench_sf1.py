#!/usr/bin/env python3
"""Build the checked-in sf1 bench artifact from two Bench runs.

Usage:
  python3 scripts/bench_sf1.py <sf01_bench.json> <sf1_bench.json> <out.json>

Joins the per-query maps, computes sf1/sf0.1 wall ratios, and attaches a
MACHINE-READABLE triage label to every query whose wall grew more than
10x for the 10x data (the same ceiling the round-11 sweep used):

  fixed        - was super-linear, re-planned; ratio should now be <10x
                 (listed so a regression past 10x is loud)
  output_bound - the ANSWER grows super-linearly on this fixture; wall is
                 sub-output-linear
  by_contract  - the operator's contract is super-linear (exact ground
                 truth eval, exact similarity join on a densifying
                 fixture, n^1.5 IVF graph build)
  attribution  - shared memoized setup charged to this query (should not
                 occur since Bench's explicit setup line items)
  unreviewed   - NEW >10x query; the build must triage it before the
                 artifact is committed (exit 1 so it can't slip through)

The label map is maintained here, next to the code that enforces it, so
the triage travels as data instead of ARCHITECTURE.md prose.
"""
import json
import sys

# round-11/12 triage decisions (see ARCHITECTURE.md "sf1 campaign" for the
# full reasoning per query)
TRIAGE = {
    "f_levenshtein_dedup": "output_bound",   # result pairs grow ~100x
    "dedup_prefix_join": "output_bound",     # exact join: candidates ∝ true pairs
    "dedup_lsh_eval": "by_contract",         # compares vs exact ground truth
    "sim_knn_graph": "by_contract",          # n·nProbe·√n = n^1.5 graph build
    "j_interval_overlap": "fixed",           # histogram+kernel plan (r11)
    "j_record_linkage": "fixed",             # scaling blocking key (r11)
    "dedup_ngram_jaccard": "by_contract",    # closed-vocab DF-capped index:
    "dedup_containment": "by_contract",      #   every shingle's df scales with
    "dedup_clusters_ngram": "by_contract",   #   the corpus (worst case; LSH is
    "dedup_strip_spans": "by_contract",      #   the designed scale path)
}
CEILING = 10.0


def load(path):
    d = json.loads(open(path).read())
    return d


def main():
    sf01, sf1, out = sys.argv[1], sys.argv[2], sys.argv[3]
    a, b = load(sf01), load(sf1)
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    ratios = {q: round(qb[q] / max(qa[q], 1e-3), 2) for q in common}
    flagged = {q: r for q, r in ratios.items() if r > CEILING}
    triage = {}
    unreviewed = []
    for q, r in sorted(flagged.items(), key=lambda kv: -kv[1]):
        label = TRIAGE.get(q, "unreviewed")
        if label == "unreviewed":
            unreviewed.append(q)
        triage[q] = {"ratio": r, "sf01_sec": round(qa[q], 3),
                     "sf1_sec": round(qb[q], 3), "label": label}
    # 'fixed' entries are listed even when under the ceiling, so the next
    # reader sees the fix held
    for q, label in TRIAGE.items():
        if label == "fixed" and q in common and q not in triage:
            triage[q] = {"ratio": ratios[q], "sf01_sec": round(qa[q], 3),
                         "sf1_sec": round(qb[q], 3), "label": "fixed"}
    artifact = {
        "metric": "total", "unit": "sec",
        "sf": b.get("sf"), "baseline_sf": a.get("sf"),
        "value": round(sum(qb.values()), 1),
        "baseline_value": round(sum(qa[q] for q in common), 1),
        "wall_ratio_10x_data": round(
            sum(qb[q] for q in common) / max(sum(qa[q] for q in common),
                                             1e-3), 2),
        "setup": b.get("setup"),
        "env": b.get("env"),
        "contaminated": b.get("contaminated"),
        "retime_median_ratio": b.get("retime_median_ratio"),
        "queries": {q: round(v, 3) for q, v in qb.items()},
        "vs_sf01_ratio": ratios,
        "triage_over_10x": triage,
    }
    json.dump(artifact, open(out, "w"), indent=1)
    print(f"wrote {out}: sf1 total {artifact['value']}s vs sf0.1 "
          f"{artifact['baseline_value']}s ({artifact['wall_ratio_10x_data']}x "
          f"wall for 10x data); {len(flagged)} queries over {CEILING}x, "
          f"{len(unreviewed)} unreviewed")
    if unreviewed:
        print("UNREVIEWED >10x queries (triage before committing): "
              + ", ".join(unreviewed))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
