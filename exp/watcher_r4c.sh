#!/bin/bash
# Round-4c chip queue: wait for the scale_fast25 babysitter to exit
# (done step 25000 or deadline), then chain the endpoint chip session and
# a solo headline bench. ONE chip process at a time (verify-skill rule).
set -u
BABYSIT_PID=$1
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
