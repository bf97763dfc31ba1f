#!/bin/bash
# Babysit a training run on the tunneled TPU backend, which wedges every
# ~45-75 min of continuous stepping (pid alive, 0 steps; observed 4x in
# round 4, all solo — not a concurrency artifact). Kill+resume from the
# run's config snapshot recovers every time.
#
# Usage: babysit.sh <exp_dir> <done_step> <pidfile> [deadline_epoch]
# Resumes with --config_json <exp_dir>/config.json when the pid dies or
# metrics.jsonl goes >15 min stale. Exits when done_step is reached, the
# deadline passes (killing the run), or resume itself keeps failing.
set -u
EXP_DIR=$1; DONE_STEP=$2; PIDFILE=$3; DEADLINE=${4:-0}
METRICS=$EXP_DIR/metrics.jsonl
LOG=$EXP_DIR/babysit_train.log
cd /root/repo

last_step() {
  tail -1 "$METRICS" 2>/dev/null | sed -n 's/.*"step": \([0-9]*\).*/\1/p'
}

relaunch() {
  nohup timeout 21600 python -m nerf_lidar_tpu.cli train \
    --config_json "$EXP_DIR/config.json" >> "$LOG" 2>&1 &
  echo $! > "$PIDFILE"
  touch "$METRICS" 2>/dev/null || true
  echo "babysit: (re)launched pid $(cat $PIDFILE) at $(date)" >&2
  sleep 300
}

touch "$METRICS" 2>/dev/null || true
while true; do
  step=$(last_step)
  if [ "${step:-0}" -ge "$DONE_STEP" ]; then
    echo "babysit: done at step $step, $(date)" >&2; exit 0
  fi
  if [ "$DEADLINE" -gt 0 ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    pid=$(cat "$PIDFILE" 2>/dev/null)
    kill "$pid" 2>/dev/null; pkill -9 -P "$pid" 2>/dev/null
    echo "babysit: deadline hit at step ${step:-?}, killed run, $(date)" >&2
    exit 0
  fi
  if ! kill -0 "$(cat "$PIDFILE" 2>/dev/null)" 2>/dev/null; then
    echo "babysit: run died at step ${step:-?}" >&2
    relaunch; continue
  fi
  age=$(( $(date +%s) - $(stat -c %Y "$METRICS" 2>/dev/null || date +%s) ))
  # Before the first metrics line the run is in its first compile, which
  # for the big parity config exceeds 20 min — allow 40 min there.
  thresh=900
  if [ ! -s "$METRICS" ]; then thresh=2400; fi
  if [ "$age" -gt "$thresh" ]; then
    echo "babysit: WEDGE (metrics ${age}s stale) at step ${step:-?}" >&2
    pid=$(cat "$PIDFILE")
    kill "$pid" 2>/dev/null; pkill -9 -P "$pid" 2>/dev/null
    sleep 5
    relaunch; continue
  fi
  sleep 60
done
