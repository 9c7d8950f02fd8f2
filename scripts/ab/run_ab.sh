#!/bin/bash
# Alternating same-session A/B: r3 worktree vs current main, 3 runs each.
# Writes one JSON file per run under /tmp/ab_out.
set -u
OUT=/tmp/ab_out; mkdir -p $OUT
for i in 1 2 3; do
  for side in r3 r5; do
    if [ $side = r3 ]; then DIR=/tmp/r3ab; else DIR=/root/repo; fi
    echo "=== run $i side $side ($(date +%H:%M:%S)) ==="
    (cd $DIR && PYTHONPATH=$DIR timeout 400 python bench.py 2>/dev/null \
       | grep '"metric"' > $OUT/${side}_$i.json)
    echo "rc=$?"
  done
done
echo DONE
