#!/bin/bash
# Coherent three-SF bench records in ONE session (round-11 verdict ask #8):
# sf0.1 -> BENCH_LOCAL.json, sf1 -> BENCH_SF1_LOCAL.json,
# sf10 -> BENCH_SF10_LOCAL.json, back-to-back on an idle machine so the
# three artifacts share one ambient band. sf10 excludes the two
# spec-output-quadratic rows (q_r_fs blocked-FS pair output and
# q_r_erclust on top of it are Theta(sum block^2) by definition), same
# exclusion as the round-10 record for like-with-like ratios.
set -e -o pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
echo "=== sf0.1 $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_FILE=BENCH_LOCAL.json \
  java -Xmx8g -cp "$CP" graft.Bench 2>/tmp/bench_sf01.log | tail -1 > /tmp/bench_sf01.json
echo "=== sf1 $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_FILE=BENCH_SF1_LOCAL.json \
  java -Xmx8g -cp "$CP" graft.Bench 2>/tmp/bench_sf1.log | tail -1 > /tmp/bench_sf1.json
echo "=== sf10 $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_FILE=BENCH_SF10_LOCAL.json \
  SPARK_GRAFT_SKIP=q_r_fs,q_r_erclust \
  java -Xmx8g -cp "$CP" graft.Bench 2>/tmp/bench_sf10.log | tail -1 > /tmp/bench_sf10.json
echo "=== done $(date -u +%H:%M:%S)"
