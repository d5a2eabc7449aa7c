#!/usr/bin/env bash
# Round-14 bench chain (finishes what bench_r13.sh stranded — the r13
# chain died on the missing skewed-sf10 leg and none of the four final
# artifacts were built). Produces, all at local[32]:
#   BENCH_sf1_r14.json       full suite, flat sf1 vs sf0.1   (ceiling 10x)
#   BENCH_sf1skew_r14.json   full suite, skewed sf1 vs sf1   (ceiling 3x)
#   BENCH_sf10_r14.json      sf10 families vs restricted sf1 (ceiling 10x)
#   BENCH_sf10skew_r14.json  skewed sf10 vs flat sf10        (ceiling 3x)
#
# PRECONDITION: scripts/verify_scale.sh ran green on the same four lakes
# (regeneration + restricted hash sweep) — artifacts must never be built
# over a silently-regressed scale lake.
#
# The sf10 runs are RESTRICTED to the scale-critical families the 100 TB
# posture rests on. Exclusions from the sf10 set, each because the
# query's CONTRACT is super-linear on a k=100 replica lake (they are
# measured to sf1 and labeled in bench_sf1.py, not silently dropped):
#   dedup_prefix_join  exact all-pairs Jaccard — true output ~C(100,2)
#                      per near-dup family, 110x the sf1 answer
#   dedup_lsh_eval     compares vs exact all-pairs ground truth
#   dedup_ngram_jaccard / dedup_containment / dedup_strip_spans /
#   dedup_clusters_ngram
#                      df-capped inverted index, worst-case corpus-
#                      scaling posting lists (LSH is the scale path).
#                      clusters_ngram measured: at k=100 the closed
#                      ~31-word vocabulary makes cross-replica shingle
#                      collisions corpus-wide, candidates grow ~n² and
#                      an 8 GiB-heap run OOMs after 50 min — the
#                      designed corpus-clustering path at this scale is
#                      the banded dedup_minhash_lsh family, which stays
#                      in the set
#   sim_knn_graph      n^1.5 by contract (corpus-wide kNN build)
# The *_sf10_probe queries are correctness instruments (graded in
# verify_scale.sh's sf10 sweep); they re-run the full headline pipelines
# so benching them would double-count q_item_recs / sim_knn_vote wall.
#
# Unreviewed >ceiling queries FAIL this script (no || true — statuses
# collected, nonzero exit at the end, every artifact still produced
# first so the failure is inspectable).
set -euo pipefail
cd "$(dirname "$0")/.."
CPUS=${SPARK_GRAFT_CPUS:-32}

# scale-critical families, oracle-feasible at sf10 (see header)
SF10_QUERIES="dedup_exact dedup_minhash_lsh dedup_incremental_minhash \
dedup_simhash dedup_embedding_cosine \
f_levenshtein_dedup sim_bruteforce_topk sim_ivf_topk sim_kmeans_train \
sim_knn_vote a_itemsets3 q_item_recs q_attribution_linear g_walk_sample \
q_stream_replay q_stream_restart_replay q_stream_neardup_replay \
q_stream_join_replay"

# skewed sf10 drops q_stream_join_replay: its pair output is quadratic
# on the hot user BY CONTRACT (sf1skew: 62x pairs for 5x wall, labeled
# output_bound), and keyed streaming state is single-task per key in the
# engine's own execution model — at k=100 the hot user's pair set alone
# is ~50M rows through one stateful task (measured: one task, 42+ CPU-
# min, still going). The query stays in the FLAT sf10 set and its skew
# behavior stays measured/oracled at sf1skew. Built EXPLICITLY (not via
# string substitution — a rename must break this line, not silently
# re-admit the query), then guarded against drift from SF10_QUERIES.
SF10SKEW_QUERIES="dedup_exact dedup_minhash_lsh dedup_incremental_minhash \
dedup_simhash dedup_embedding_cosine \
f_levenshtein_dedup sim_bruteforce_topk sim_ivf_topk sim_kmeans_train \
sim_knn_vote a_itemsets3 q_item_recs q_attribution_linear g_walk_sample \
q_stream_replay q_stream_restart_replay q_stream_neardup_replay"
# drift guard: the skew set must be the flat set minus exactly
# q_stream_join_replay
expected=$(echo "$SF10_QUERIES" | tr -s ' \\' ' ' | sed 's/ *q_stream_join_replay *$//; s/ *$//')
actual=$(echo "$SF10SKEW_QUERIES" | tr -s ' \\' ' ' | sed 's/ *$//')
if [ "$expected" != "$actual" ]; then
  echo "bench_r14: SF10SKEW_QUERIES drifted from SF10_QUERIES minus"
  echo "q_stream_join_replay — reconcile the two lists"
  exit 1
fi

run() { # run <sfdir> <out.json> [queries...]
  local sfdir=$1 out=$2; shift 2
  echo "=== bench $sfdir ${*:-(full)} ==="
  SPARK_GRAFT_SF_DIR=$sfdir SPARK_GRAFT_CPUS=$CPUS \
    SPARK_GRAFT_BENCH_OUT=$out \
    sbt -batch "runMain graft.Bench $*" 2>&1 | grep '"metric"' || true
  test -s "$out"
}

run /root/testdata/sf0.1 /tmp/bench_sf01_r14.json
run testdata/sf1        /tmp/bench_sf1_r14.json
run testdata/sf1skew    /tmp/bench_sf1skew_r14.json
# the sf10 legs (and their restricted-sf1 baseline, so the ratio is
# apples-to-apples) run at a 24 GiB heap: a 10x lake on ONE JVM gets the
# heap a 10x cluster would bring in aggregate; the full-suite sf1 legs
# stay at the 8 GiB default so they remain comparable to the r12
# artifacts. Recorded in each artifact's env block.
export SPARK_DRIVER_MEM=24g
run testdata/sf1        /tmp/bench_sf1_restricted_r14.json  $SF10_QUERIES
run testdata/sf10       /tmp/bench_sf10_r14.json            $SF10_QUERIES
run testdata/sf10skew   /tmp/bench_sf10skew_r14.json        $SF10SKEW_QUERIES
unset SPARK_DRIVER_MEM

status=0
python3 scripts/bench_sf1.py /tmp/bench_sf01_r14.json \
  /tmp/bench_sf1_r14.json BENCH_sf1_r14.json sf1 || status=1
python3 scripts/bench_sf1.py /tmp/bench_sf1_r14.json \
  /tmp/bench_sf1skew_r14.json BENCH_sf1skew_r14.json skew || status=1
python3 scripts/bench_sf1.py /tmp/bench_sf1_restricted_r14.json \
  /tmp/bench_sf10_r14.json BENCH_sf10_r14.json sf10 || status=1
python3 scripts/bench_sf1.py /tmp/bench_sf10_r14.json \
  /tmp/bench_sf10skew_r14.json BENCH_sf10skew_r14.json skew10 || status=1
if [ $status -ne 0 ]; then
  echo "bench_r14: UNREVIEWED over-ceiling queries — triage before committing"
fi
exit $status
