#!/bin/bash
# Round-13 session-2: the FULL-suite fourth-decade record round 12
# deferred for wall-clock ("a full suite at sf100 would run ~2 h").
# Back-to-back sf10 FULL suite then sf100 FULL suite on an idle
# machine so both artifacts share one ambient band and the per-row
# sf100/sf10 decade ratios are same-run coherent. Exclusions: only
# q_r_fs/q_r_erclust (output Theta(sum block^2) by their fixed
# blocking spec), same as every full-suite record since round 10.
set -e -o pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
echo "=== sf10 full $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_FILE=BENCH_SF10_LOCAL.json \
  SPARK_GRAFT_SKIP=q_r_fs,q_r_erclust \
  java -Xmx8g -cp "$CP" graft.Bench 2>/tmp/bench_sf10_full.log | tail -1 > /tmp/bench_sf10_full.json
echo "=== sf100 full $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_FILE=BENCH_SF100_LOCAL.json \
  SPARK_GRAFT_SKIP=q_r_fs,q_r_erclust \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  java -Xmx64g -cp "$CP" graft.Bench 2>/tmp/bench_sf100_full.log | tail -1 > /tmp/bench_sf100_full.json
echo "=== done $(date -u +%H:%M:%S)"
