#!/usr/bin/env bash
# Partition-count invariance gate: run the FULL verify suite + DuckDB
# compare at deliberately awkward parallelism/shuffle-partition counts.
# The determinism contract (ARCHITECTURE.md "Determinism contract")
# claims every result is ORDER-INDEPENDENT: double sums ride exact
# scaled-integer aggregates (Det.dsum), ties carry explicit tiebreaks,
# and no query depends on partial-aggregation or merge order. Partition
# count is the knob that actually perturbs that order — different counts
# change how rows group into partial aggregates, the merge tree shape,
# and row arrival order at every exchange — so "N pass, 0 fail" at odd,
# non-divisible counts (5, 13) AND the driver's own counts (4, 8, 32,
# exercised by the other gates) is direct evidence the contract holds,
# not just that one lucky ordering hashes right.
#
# Usage: scripts/crosspart_verify.sh [cpus ...]   (default: 5 13)
#   env: SPARK_GRAFT_SF (default sf0.01 — the driver's gated SF)
set -euo pipefail
cd "$(dirname "$0")/.."
PARTS=("$@")
[ $# -eq 0 ] && PARTS=(5 13)
sf=${SPARK_GRAFT_SF:-sf0.01}
dir=/root/testdata/$sf
fail=0
for p in "${PARTS[@]}"; do
  out=/tmp/crosspart_$p
  rm -rf "$out"
  echo "=== local[$p], shuffle.partitions=$p, $sf ==="
  SPARK_GRAFT_CPUS=$p \
    sbt -batch "runMain graft.Verify $dir $out" >/dev/null 2>&1
  python3 scripts/check.py "$dir" "$out" | grep -E "^FAIL|pass, " || fail=1
done
exit $fail
