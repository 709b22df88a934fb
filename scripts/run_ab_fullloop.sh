#!/bin/bash
# Same-hour interleaved A/B of previous-round code vs HEAD on the identical
# full-loop 528k protocol (run_scaling.py --one full <cpus>), used to separate
# host-phase drift from engine change when a recorded efficiency moves.
#
# Setup: `git worktree add /tmp/r4tree <prev-round-sha>` (round 5 used 97f85f9).
# Each (cycle, cpus, version) cell is a fresh process; versions alternate within
# a cycle so host drift hits both alike.  Read best-of per (version, cpus).
#
# Round-5 run (2026-08-17, /tmp/ab_full.log):
#   r4 local[2] best 203.19 s   r5 local[2] best 184.97 s
#   r4 local[8] best 123.00 s   r5 local[8] best  62.43 s   (r5 2.0x faster)
#   same-hour 2->8 efficiency: r4 0.41, r5 0.74
set -euo pipefail
PREV_TREE=${PREV_TREE:-/tmp/r4tree}
LOG=${LOG:-/tmp/ab_full.log}
for cycle in 1 2; do
  for cpus in 2 8; do
    for ver in prev head; do
      dir=$([ $ver = prev ] && echo "$PREV_TREE" || echo /root/repo)
      out=$(cd "$dir" && python scripts/run_scaling.py --one full "$cpus" 2>/dev/null | tail -1)
      echo "AB cycle=$cycle ver=$ver cpus=$cpus $out" | tee -a "$LOG"
    done
  done
done
