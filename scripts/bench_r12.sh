#!/usr/bin/env bash
# Round-12 bench chain: three full self-cleaning bench runs (flat sf0.1
# baseline, flat sf1, skewed sf1 — all local[32]) plus the two derived
# artifacts:
#   BENCH_sf1_r12.json      sf1 vs sf0.1   (profile sf1,  10x ceiling)
#   BENCH_sf1skew_r12.json  sf1skew vs sf1 (profile skew,  3x ceiling)
# Run on a QUIET machine (the bench self-cleans contaminated passes, but
# that costs a full re-run). ~50-60 min end to end.
set -euo pipefail
cd "$(dirname "$0")/.."
CPUS=${SPARK_GRAFT_CPUS:-32}

run() { # run <sfdir> <out.json>
  echo "=== bench $1 ==="
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=$CPUS \
    SPARK_GRAFT_BENCH_OUT=$2 \
    sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' || true
  test -s "$2"
}

run /root/testdata/sf0.1 /tmp/bench_sf01_r12.json
run testdata/sf1        /tmp/bench_sf1_r12.json
run testdata/sf1skew    /tmp/bench_sf1skew_r12.json

python3 scripts/bench_sf1.py /tmp/bench_sf01_r12.json \
  /tmp/bench_sf1_r12.json BENCH_sf1_r12.json sf1 || true
python3 scripts/bench_sf1.py /tmp/bench_sf1_r12.json \
  /tmp/bench_sf1skew_r12.json BENCH_sf1skew_r12.json skew || true
