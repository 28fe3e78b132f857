#!/bin/bash
# Round-16: versioned three-SF sweep + MECHANICAL solo re-measure of
# census-flagged rows (r15 verdict #7): after the suite, decade_census
# classifies sf10<->sf100, and every page-cache / plan-regression
# flagged row is re-run SOLO at sf100 (min-of-2, idle) with the result
# folded into the sf100 artifact as "flagged_solo" — in-suite cache
# contention never needs prose adjudication again. Run from a CLEAN
# committed tree (the commit field is the artifact's provenance).
# Exclusions: q_r_fs/q_r_erclust only (output Theta(sum block^2) by
# their fixed blocking spec), as in every full-suite record since r10.
set -e -o pipefail
cd /root/repo
CP="target/scala-2.13/classes:/opt/spark/jars/*"
SKIP=q_r_fs,q_r_erclust
echo "=== sf0.1 full $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_FILE=BENCH_SF01_FULL_R16.json \
  SPARK_GRAFT_SKIP=$SKIP \
  java -Xmx8g -cp "$CP" graft.Bench 2>/tmp/bench_sf01_r16.log | tail -1 > /tmp/bench_sf01_r16.json
echo "=== sf10 full $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf10 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_FILE=BENCH_SF10_FULL_R16.json \
  SPARK_GRAFT_SKIP=$SKIP \
  java -Xmx8g -cp "$CP" graft.Bench 2>/tmp/bench_sf10_r16.log | tail -1 > /tmp/bench_sf10_r16.json
echo "=== sf100 full $(date -u +%H:%M:%S)"
SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf100 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_FILE=BENCH_SF100_FULL_R16.json \
  SPARK_GRAFT_SKIP=$SKIP \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
  SPARK_GRAFT_PASSES=1 \
  java -Xmx64g -cp "$CP" graft.Bench 2>/tmp/bench_sf100_r16.log | tail -1 > /tmp/bench_sf100_r16.json
echo "=== decade census + flagged-row extraction $(date -u +%H:%M:%S)"
python3 tools/decade_census.py BENCH_SF10_FULL_R16.json BENCH_SF100_FULL_R16.json \
  --emit-flagged /tmp/flagged_r16.json | tail -20
FLAGGED=$(python3 -c "
import json
d = json.load(open('/tmp/flagged_r16.json'))
print(','.join(d['page_cache'] + d['plan_regression']))")
if [ -n "$FLAGGED" ]; then
  echo "=== sf100 SOLO re-measure of flagged rows (min-of-2) $(date -u +%H:%M:%S)"
  echo "    $FLAGGED"
  SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf100 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_FILE=BENCH_SF100_FLAGGED_SOLO_R16.json \
    SPARK_GRAFT_ONLY=$FLAGGED \
    SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
    java -Xmx64g -cp "$CP" graft.Bench 2>/tmp/bench_sf100_solo_r16.log | tail -1 > /tmp/bench_sf100_solo_r16.json
  python3 - <<'EOF'
import json
full = json.load(open('BENCH_SF100_FULL_R16.json'))
solo = json.load(open('BENCH_SF100_FLAGGED_SOLO_R16.json'))
flags = json.load(open('/tmp/flagged_r16.json'))
full['flagged_solo'] = {
    'note': 'census-flagged rows re-run solo min-of-2 on the same tree; '
            'in-suite vs solo gap is page-cache/contention, not plan cost',
    'classes': {k: v for k, v in flags.items() if v},
    'queries': solo['queries'],
    'calibration': solo.get('calibration'),
}
with open('BENCH_SF100_FULL_R16.json', 'w') as f:
    f.write(json.dumps(full) + '\n')
print('flagged_solo folded into BENCH_SF100_FULL_R16.json:',
      len(solo['queries']), 'rows')
EOF
fi
echo "=== done $(date -u +%H:%M:%S)"
