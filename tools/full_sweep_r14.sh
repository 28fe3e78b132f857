#!/bin/bash
# Round-14: regenerate the fourth-decade full-suite record on the
# POST-clustersCore-fix tree (r13 verdict #2) with the new per-query
# I/O metrics riding in every artifact (verdict #3), under VERSIONED
# filenames (r13 ADVICE — never overwrite a cited artifact in place).
# Back-to-back sf10 then sf100 on an idle machine: one ambient band,
# same-run decade ratios. Exclusions: q_r_fs/q_r_erclust only
# (output Theta(sum block^2) by their fixed blocking spec), as in
# every full-suite record since round 10.
set -e -o pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
echo "=== sf10 full $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_FILE=BENCH_SF10_FULL_R14.json \
  SPARK_GRAFT_SKIP=q_r_fs,q_r_erclust \
  java -Xmx8g -cp "$CP" graft.Bench 2>/tmp/bench_sf10_r14.log | tail -1 > /tmp/bench_sf10_r14.json
echo "=== sf100 full $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_FILE=BENCH_SF100_FULL_R14.json \
  SPARK_GRAFT_SKIP=q_r_fs,q_r_erclust \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  SPARK_GRAFT_PASSES=1 \
  java -Xmx64g -cp "$CP" graft.Bench 2>/tmp/bench_sf100_r14.log | tail -1 > /tmp/bench_sf100_r14.json
echo "=== done $(date -u +%H:%M:%S)"
