#!/bin/bash
# Round-4c chip queue: wait for the scale_fast25 babysitter to exit
# (done step 25000 or deadline), then chain the endpoint chip session, a
# solo headline bench, and an overnight resume of the reference-exact
# parity run (banks checkpoints every 100 steps; any progress extends the
# matched-step parity curve and round 5 can continue from it). ONE chip
# process at a time (verify-skill rule).
set -u
BABYSIT_PID=$1
PARITY_DEADLINE=${2:-0}   # epoch; 0 = skip stage C
cd /root/repo

while kill -0 "$BABYSIT_PID" 2>/dev/null; do sleep 60; done
echo "watcher_r4c: babysitter $BABYSIT_PID exited at $(date)" >&2

# Leftover train process (deadline kill path leaves none, but be safe).
if [ -f /tmp/fast.pid ] && kill -0 "$(cat /tmp/fast.pid)" 2>/dev/null; then
  kill "$(cat /tmp/fast.pid)" 2>/dev/null; sleep 10
fi

timeout 7200 python exp/chip_session_r4c.py > exp/chip_session_r4c.log 2>&1
echo "watcher_r4c: chip session done ($?) at $(date)" >&2

timeout 3600 python bench.py > exp/BENCH_local_r4c.json 2>&1
echo "watcher_r4c: bench done ($?) at $(date)" >&2

if [ "$PARITY_DEADLINE" -gt 0 ]; then
  # Parity cadence rules (see babysit.sh header): ~13-18 s/step, so
  # print_every=25 lines land every ~6-8 min -> stale_s 2400; grace 2400
  # covers the 15-25 min compile+first-fetch warmup per launch.
  bash exp/babysit.sh exp/scale_parity 25000 /tmp/parity.pid \
    "$PARITY_DEADLINE" 2400 2400 >> exp/scale_parity/babysit_events.log 2>&1
  echo "watcher_r4c: parity babysitter exited at $(date)" >&2
fi
