#!/usr/bin/env bash
# Scale-lake CI of record (round 13, VERDICT r12 item 6).
#
# Regenerates BOTH generated sf1 lakes from scratch (flat + skewed —
# they are gitignored, so every run re-derives them from the driver's
# sf0.1 under GenSfSpec's pinned generation contracts) and hash-verifies
# a restricted query sweep on each against the DuckDB oracle. Any
# regeneration failure or hash mismatch exits nonzero, so a round's
# bench artifacts cannot be built over a silently-regressed scale lake.
#
# Usage:
#   scripts/verify_scale.sh                  # default scale-critical set
#   scripts/verify_scale.sh q1 q2 ...        # restricted to given queries
#   SKIP_REGEN=1 scripts/verify_scale.sh ... # reuse lakes already on disk
#
# The default set is the scale-critical families the 100 TB posture
# rests on (dedup/LSH, ANN/IVF, itemsets, attribution, streaming state)
# plus every query re-planned by a skew/scale fix in r11-r13 — the exact
# set the r12 judge re-verified by hand, now one command.
set -euo pipefail
cd "$(dirname "$0")/.."

QUERIES=("$@")
if [ ${#QUERIES[@]} -eq 0 ]; then
  QUERIES=(
    # dedup / LSH family
    dedup_exact dedup_minhash_lsh dedup_lsh_eval dedup_incremental_minhash
    dedup_simhash dedup_ngram_jaccard dedup_clusters_ngram
    dedup_embedding_cosine dedup_prefix_join
    # ANN / IVF family
    sim_bruteforce_topk sim_ivf_topk sim_knn_graph sim_knn_vote
    sim_kmeans_train
    # itemsets + attribution (r12 skew kills)
    a_itemsets3 q_item_recs q_attribution_linear g_walk_sample
    # fuzzy-match blocking (r11 j_record_linkage, r13 f_levenshtein_dedup)
    j_record_linkage f_levenshtein_dedup
    # streaming state end-states (+ the r13 restart/recovery oracle)
    q_stream_replay q_stream_join_replay q_stream_neardup_replay
    q_stream_restart_replay
  )
fi

if [ "${SKIP_REGEN:-0}" != "1" ]; then
  echo "=== regenerating testdata/sf1 (flat, k=10) ==="
  sbt -batch "runMain graft.GenSf /root/testdata/sf0.1 testdata/sf1 10" \
    > /tmp/gensf_flat.log 2>&1 || { tail -20 /tmp/gensf_flat.log; exit 1; }
  echo "=== regenerating testdata/sf1skew (skewed, k=10) ==="
  sbt -batch "runMain graft.GenSf /root/testdata/sf0.1 testdata/sf1skew 10 skew" \
    > /tmp/gensf_skew.log 2>&1 || { tail -20 /tmp/gensf_skew.log; exit 1; }
fi

status=0
for lake in testdata/sf1 testdata/sf1skew; do
  out="/tmp/verify_scale_$(basename "$lake")"
  echo "=== verify ${QUERIES[*]} on $lake ==="
  sbt -batch "runMain graft.Verify $lake $out ${QUERIES[*]}" \
    > "/tmp/verify_scale_$(basename "$lake").log" 2>&1 \
    || { tail -20 "/tmp/verify_scale_$(basename "$lake").log"; status=1; continue; }
  python3 scripts/check.py "$lake" "$out" "${QUERIES[@]}" || status=1
done

if [ $status -ne 0 ]; then
  echo "verify_scale: FAIL — a scale lake regressed; do not build artifacts"
else
  echo "verify_scale: OK (${#QUERIES[@]} queries x 2 lakes hash-green)"
fi
exit $status
