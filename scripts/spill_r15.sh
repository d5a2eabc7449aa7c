#!/usr/bin/env bash
# Round-15 constrained-memory spill evidence (VERDICT r14 item 5, carried
# since r12): run the TEN heaviest flat-sf1 queries (by the r12 clean
# artifact's walls — the dedup/LSH/curation family that dominates the sf1
# suite) under 2 / 4 / 8 GiB driver heaps with graft.tools.SpillProbe,
# which reports per-query wall + listener-collected memoryBytesSpilled /
# diskBytesSpilled / peakExecutionMemory. The evidence target: every run
# completes with ZERO OOMs, and the constrained heaps show nonzero spill
# where the 8 GiB run shows little/none — i.e. heavy shuffles SPILL
# through UnsafeExternalSorter/ExternalAppendOnlyMap instead of dying.
# Afterwards, the same ten queries are re-verified hash-green against the
# DuckDB oracle at the TIGHTEST heap (2 GiB), so "it spilled" is also
# "it stayed correct".
#
# Output: /tmp/spill_r15_{2,4,8}g.log (SPILL lines), summarized into
# ARCHITECTURE.md's Round-15 MEMORY table.
set -euo pipefail
cd "$(dirname "$0")/.."

QUERIES="dedup_prefix_join t_leakage_safe_split dedup_clusters_ngram \
dedup_canonical_source dedup_soft_weights q_stream_neardup_replay \
dedup_embedding_cosine dedup_lsh_eval dedup_ngram_jaccard dedup_containment"

for heap in 2g 4g 8g; do
  echo "=== SpillProbe testdata/sf1 @ $heap [$(date -u +%H:%M:%S)] ==="
  SPARK_DRIVER_MEM=$heap SPARK_GRAFT_CPUS=32 \
    sbt -batch "runMain graft.tools.SpillProbe testdata/sf1 $QUERIES" \
    2>&1 | grep -E 'SPILL|OutOfMemory|java.lang.OutOfMemoryError' \
    | tee "/tmp/spill_r15_${heap}.log"
  # an empty log means the JVM died before any SPILL line — fail loudly
  test -s "/tmp/spill_r15_${heap}.log"
done

echo "=== hash-verify the ten queries at the 2 GiB heap ==="
SPARK_DRIVER_MEM=2g \
  sbt -batch "runMain graft.Verify testdata/sf1 /tmp/verify_spill2g $QUERIES" \
  > /tmp/verify_spill2g.log 2>&1 \
  || { tail -20 /tmp/verify_spill2g.log; exit 1; }
python3 scripts/check.py testdata/sf1 /tmp/verify_spill2g $QUERIES
