#!/bin/bash
# Round-15: versioned three-SF sweep on the FINAL round-15 tree —
# closes r14 verdict #4 (q_d_ingest2 was absent from the r14 decade
# artifacts because it landed after that sweep ran; this sweep runs on
# committed HEAD and every artifact now self-declares its commit SHA,
# so "final tree" is checkable from the file). Adds q_d_ingest3 (the
# exact-confirm twin) as well. Back-to-back on an idle machine: one
# ambient band, same-run decade ratios. Exclusions: q_r_fs/q_r_erclust
# only (output Theta(sum block^2) by their fixed blocking spec), as in
# every full-suite record since round 10.
set -e -o pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
echo "=== sf0.1 full $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_FILE=BENCH_SF01_FULL_R15.json \
  SPARK_GRAFT_SKIP=q_r_fs,q_r_erclust \
  java -Xmx8g -cp "$CP" graft.Bench 2>/tmp/bench_sf01_r15.log | tail -1 > /tmp/bench_sf01_r15.json
echo "=== sf10 full $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_FILE=BENCH_SF10_FULL_R15.json \
  SPARK_GRAFT_SKIP=q_r_fs,q_r_erclust \
  java -Xmx8g -cp "$CP" graft.Bench 2>/tmp/bench_sf10_r15.log | tail -1 > /tmp/bench_sf10_r15.json
echo "=== sf100 full $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_FILE=BENCH_SF100_FULL_R15.json \
  SPARK_GRAFT_SKIP=q_r_fs,q_r_erclust \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  SPARK_GRAFT_PASSES=1 \
  java -Xmx64g -cp "$CP" graft.Bench 2>/tmp/bench_sf100_r15.log | tail -1 > /tmp/bench_sf100_r15.json
echo "=== done $(date -u +%H:%M:%S)"
