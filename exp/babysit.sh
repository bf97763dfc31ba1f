#!/bin/bash
# Babysit a training run on the tunneled TPU backend, which wedges every
# ~45-75 min of continuous stepping (pid alive, 0 steps; observed 5x in
# round 4, all solo — not a concurrency artifact). Kill+resume from the
# run's config snapshot recovers every time.
#
# Usage: babysit.sh <exp_dir> <done_step> <pidfile> [deadline_epoch] [grace_s]
#        [stale_s]
# Resumes with --config_json <exp_dir>/config.json when the pid dies or
# metrics.jsonl goes >stale_s stale. Exits when done_step is reached or the
# deadline passes (killing the run). grace_s (default 2400) suppresses the
# wedge check for that long after every (re)launch — big configs pay
# 15-25 min of compile+first-fetch warmup before their first metrics line,
# which a shorter grace mistakes for a wedge (kill-loop).
#
# stale_s (default 900) MUST exceed the config's inter-metrics-line wall
# time or the babysitter kills HEALTHY runs: the reference-exact parity
# config steps at ~15-18 s/step, so its print_every=100 lines land every
# ~25-30 min and the 900 s default produced a kill-loop (observed
# 2026-08-18, scale_parity attempt 2 — and retroactively part of why
# attempt 1 never banked a checkpoint). Rule: stale_s > print_every x
# worst-case s/step, or lower print_every so lines land well inside it.
set -u
EXP_DIR=$1; DONE_STEP=$2; PIDFILE=$3; DEADLINE=${4:-0}; GRACE=${5:-2400}
STALE=${6:-900}
METRICS=$EXP_DIR/metrics.jsonl
LOG=$EXP_DIR/babysit_train.log
cd /root/repo

last_step() {
  tail -1 "$METRICS" 2>/dev/null | sed -n 's/.*"step": \([0-9]*\).*/\1/p'
}

LAUNCH_TS=$(date +%s)

relaunch() {
  nohup timeout 21600 python -m nerf_lidar_tpu.cli train \
    --config_json "$EXP_DIR/config.json" >> "$LOG" 2>&1 &
  echo $! > "$PIDFILE"
  touch "$METRICS" 2>/dev/null || true
  LAUNCH_TS=$(date +%s)
  echo "babysit: (re)launched pid $(cat $PIDFILE) at $(date)" >&2
  sleep 60
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
  since_launch=$(( $(date +%s) - LAUNCH_TS ))
  age=$(( $(date +%s) - $(stat -c %Y "$METRICS" 2>/dev/null || date +%s) ))
  if [ "$since_launch" -gt "$GRACE" ] && [ "$age" -gt "$STALE" ]; then
    echo "babysit: WEDGE (metrics ${age}s stale) at step ${step:-?}" >&2
    pid=$(cat "$PIDFILE")
    kill "$pid" 2>/dev/null; pkill -9 -P "$pid" 2>/dev/null
    sleep 5
    relaunch; continue
  fi
  sleep 60
done
