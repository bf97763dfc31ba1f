#!/bin/bash
# Round-5 chip queue: wait for the scale_r5q babysitter to exit (done step
# 25000 or the deadline), then chain, ONE chip process at a time:
#   A. endpoint chip session (eval with the FIXED float64 color_correct,
#      lidar_eval, replay sweeps, dense-GT raydrop loop with the new
#      iou/precision/recall summary, sweep_bench with the compute/transfer
#      decomposition)
#   B. solo headline bench for BENCH_r05-style numbers
#   C. execute_flagship_multichip on the 8-device VIRTUAL CPU mesh (no
#      chip; placed here because the 1-CPU host cannot feed the train run
#      and this job at the same time)
set -u
BABYSIT_PID=$1
cd /root/repo

while kill -0 "$BABYSIT_PID" 2>/dev/null; do sleep 60; done
echo "watcher_r5: babysitter $BABYSIT_PID exited at $(date)" >&2

if [ -f /tmp/r5q.pid ] && kill -0 "$(cat /tmp/r5q.pid)" 2>/dev/null; then
  kill "$(cat /tmp/r5q.pid)" 2>/dev/null; sleep 10
fi

timeout 9000 python exp/chip_session_r5b.py > exp/chip_session_r5b.log 2>&1
echo "watcher_r5: chip session done ($?) at $(date)" >&2

timeout 3600 python bench.py > exp/BENCH_local_r5.json 2>&1
echo "watcher_r5: bench done ($?) at $(date)" >&2

if [ -f exp/MULTICHIP_exec_r5.json ]; then
  echo "watcher_r5: multichip execute already done (artifact exists), skipping" >&2
else
  # NB: the JAX_PLATFORMS env var is hijacked by the axon site customization
  # (verify-skill gotcha) — switch platforms via jax.config.update instead.
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    timeout 7200 python -c "
import jax
jax.config.update('jax_platforms', 'cpu')
import json, time, __graft_entry__ as g
t0 = time.time()
g.execute_flagship_multichip(8)
json.dump({'n_devices': 8, 'executed': True, 'wall_s': round(time.time()-t0, 1)},
          open('exp/MULTICHIP_exec_r5.json', 'w'), indent=1)
" > exp/multichip_exec_r5.log 2>&1
  echo "watcher_r5: multichip execute done ($?) at $(date)" >&2
fi
