#!/usr/bin/env bash
# Round-15 bench chain — the clean numbers of record the last two rounds
# failed to land (VERDICT r14 item 1). Produces, all at local[32]:
#   bench_out.json           full suite, sf0.1 (repo-root committed
#                            artifact; also copied to /tmp as the sf1
#                            ratio baseline)
#   BENCH_sf1_r15.json       full suite, flat sf1 vs sf0.1   (ceiling 10x)
#   BENCH_sf1skew_r15.json   full suite, skewed sf1 vs sf1   (ceiling 3x)
#   BENCH_sf10_r15.json      sf10 families vs restricted sf1 (ceiling 10x)
#   BENCH_sf10skew_r15.json  skewed sf10 vs flat sf10        (ceiling 3x)
#
# PRECONDITIONS (both verified before this round's launch):
#   - the four lakes on disk are byte-identical to the ones
#     scripts/verify_scale.sh regenerated AND hash-swept green at the
#     round-14 close (mtimes 13:48 this VM-day; no GenSf run since) —
#     regeneration is deliberately skipped here because the 4-lake regen
#     churn is the leading suspect for r14's page-cache contamination;
#   - quiet machine: zero sibling JVMs, steal <2%, load_before <2.
# Every Bench leg now runs under the r15 contamination gate
# (Bench.passContaminated: retime median >= 2.0 OR first-pass ambient
# load > cores/4 condemns a pass and triggers a full re-run).
#
# The sf10 run sets and their exclusions are unchanged from
# scripts/bench_r14.sh (rationale in its header); the drift guard below
# keeps the skew set reconciled with the flat set.
set -euo pipefail
cd "$(dirname "$0")/.."
CPUS=${SPARK_GRAFT_CPUS:-32}

SF10_QUERIES="dedup_exact dedup_minhash_lsh dedup_incremental_minhash \
dedup_simhash dedup_embedding_cosine \
f_levenshtein_dedup sim_bruteforce_topk sim_ivf_topk sim_kmeans_train \
sim_knn_vote a_itemsets3 q_item_recs q_attribution_linear g_walk_sample \
q_stream_replay q_stream_restart_replay q_stream_neardup_replay \
q_stream_join_replay"

SF10SKEW_QUERIES="dedup_exact dedup_minhash_lsh dedup_incremental_minhash \
dedup_simhash dedup_embedding_cosine \
f_levenshtein_dedup sim_bruteforce_topk sim_ivf_topk sim_kmeans_train \
sim_knn_vote a_itemsets3 q_item_recs q_attribution_linear g_walk_sample \
q_stream_replay q_stream_restart_replay q_stream_neardup_replay"
# drift guard: the skew set must be the flat set minus exactly
# q_stream_join_replay (excluded at k=100: hot-user pair set is ~50M rows
# through one stateful task — see bench_r14.sh)
expected=$(echo "$SF10_QUERIES" | tr -s ' \\' ' ' | sed 's/ *q_stream_join_replay *$//; s/ *$//')
actual=$(echo "$SF10SKEW_QUERIES" | tr -s ' \\' ' ' | sed 's/ *$//')
if [ "$expected" != "$actual" ]; then
  echo "bench_r15: SF10SKEW_QUERIES drifted from SF10_QUERIES minus"
  echo "q_stream_join_replay — reconcile the two lists"
  exit 1
fi

settle() { # wait (up to 12 min) for BOTH the 1-min load (<1.5) and the
  # 5-min load (<3.0) to decay: each leg ends at full tilt, and the next
  # leg's timed region must see AMBIENT load, not our own tail. The first
  # r15 chain attempt launched at 1-min load 2.18 with 5-min load 7.98
  # and its first 60 queries read 2.3x a clean run — the 1-min figure
  # alone is a liar minutes after a full-tilt run ends.
  local waited=0
  while [ "$(awk '{print ($1 > 1.5 || $2 > 3.0)}' /proc/loadavg)" = "1" ] \
      && [ $waited -lt 720 ]; do
    sleep 15; waited=$((waited + 15))
  done
}

run() { # run <sfdir> <out.json> [queries...]
  local sfdir=$1 out=$2; shift 2
  settle
  echo "=== bench $sfdir ${*:-(full)} [$(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg)] ==="
  SPARK_GRAFT_SF_DIR=$sfdir SPARK_GRAFT_CPUS=$CPUS \
    SPARK_GRAFT_BENCH_OUT=$out \
    sbt -batch "runMain graft.Bench $*" 2>&1 | grep -E '"metric"|\[bench\]' || true
  test -s "$out"
}

# the sf0.1 leg IS the round's committed artifact (bench_out.json carries
# the prev_round chain); a /tmp copy serves as the sf1 ratio baseline
run /root/testdata/sf0.1 bench_out.json
cp bench_out.json /tmp/bench_sf01_r15.json
run testdata/sf1        /tmp/bench_sf1_r15.json
run testdata/sf1skew    /tmp/bench_sf1skew_r15.json
# sf10 legs (and their restricted-sf1 baseline) at a 24 GiB heap: one JVM
# standing in for a 10x cluster's aggregate memory; full-suite sf1 legs
# stay at the 8 GiB default for r12-artifact comparability
export SPARK_DRIVER_MEM=24g
run testdata/sf1        /tmp/bench_sf1_restricted_r15.json  $SF10_QUERIES
run testdata/sf10       /tmp/bench_sf10_r15.json            $SF10_QUERIES
run testdata/sf10skew   /tmp/bench_sf10skew_r15.json        $SF10SKEW_QUERIES
unset SPARK_DRIVER_MEM

status=0
python3 scripts/bench_sf1.py /tmp/bench_sf01_r15.json \
  /tmp/bench_sf1_r15.json BENCH_sf1_r15.json sf1 || status=1
python3 scripts/bench_sf1.py /tmp/bench_sf1_r15.json \
  /tmp/bench_sf1skew_r15.json BENCH_sf1skew_r15.json skew || status=1
python3 scripts/bench_sf1.py /tmp/bench_sf1_restricted_r15.json \
  /tmp/bench_sf10_r15.json BENCH_sf10_r15.json sf10 || status=1
python3 scripts/bench_sf1.py /tmp/bench_sf10_r15.json \
  /tmp/bench_sf10skew_r15.json BENCH_sf10skew_r15.json skew10 || status=1
if [ $status -ne 0 ]; then
  echo "bench_r15: UNREVIEWED over-ceiling queries or vacuity failures —"
  echo "triage before committing"
fi
exit $status
