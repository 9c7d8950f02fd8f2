#!/bin/bash
# Alternating same-session A/B: r3 worktree vs current main, 3 runs each.
# Writes one JSON file per run under /tmp/ab_out.
# pipefail: rc must reflect bench.py (a timeout-killed run that printed a
# partial '"metric"' line would otherwise report grep's rc=0 and feed
# truncated timings into the A/B medians)
set -u -o pipefail
OUT=/tmp/ab_out; mkdir -p $OUT
for i in 1 2 3; do
  for side in r3 r5; do
    if [ $side = r3 ]; then DIR=/tmp/r3ab; else DIR=/root/repo; fi
    echo "=== run $i side $side ($(date +%H:%M:%S)) ==="
    (cd $DIR && PYTHONPATH=$DIR timeout 400 python bench.py 2>/dev/null \
       | grep '"metric"' > $OUT/${side}_$i.json)
    rc=$?
    echo "rc=$rc"
    if [ $rc -ne 0 ]; then rm -f $OUT/${side}_$i.json; fi
  done
done
echo DONE
