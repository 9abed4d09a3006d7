#!/bin/bash
# Filtered-bench A/B runner for the r17 adjudication (VERDICT item 1).
# Usage: ab_bench.sh <tag> <cpus> <prefer_smj> [extra env...]
# Writes the bench's full JSON line to /root/repo/plans/r17/ab_<tag>.json
set -u
TAG="$1"; CPUS="$2"; SMJ="$3"
Q="b_dist_brandes b_dup_clusters q397_implicit_mf2 q385_implicit_mf \
q297_tcloseness q324_louvain_multilevel q295_louvain q256_hits \
q194_kcore q133_day2_clusters q138_day2_winnow q92_corpus_pipeline"
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
SPARK_GRAFT_CPUS="$CPUS" \
SPARK_GRAFT_PREFER_SMJ="$SMJ" \
sbt "runMain graft.Bench $Q" 2>/dev/null \
  | grep '"metric":"total","value"' | head -1 \
  > "plans/r17/ab_${TAG}.json"
echo "done: plans/r17/ab_${TAG}.json"
