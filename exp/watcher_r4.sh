#!/bin/bash
# Round-4 chip queue: babysits the scale_speed 25k run (auto-resuming a
# wedged process — observed signature: pid alive, ~0 steps for 10+ min),
# then chains the post-training chip session, solo bench, and the parity
# run. ONE chip process at a time throughout (verify-skill rule).
cd /root/repo
METRICS=exp/scale_speed/metrics.jsonl
DONE_STEP=25000

last_step() {
  tail -1 "$METRICS" 2>/dev/null | sed -n 's/.*"step": \([0-9]*\).*/\1/p'
}

echo "watcher: babysitting train pid $(cat /tmp/run.pid)" >&2
touch "$METRICS"  # reset the staleness clock for the warmup window
while true; do
  step=$(last_step)
  if [ "${step:-0}" -ge "$DONE_STEP" ]; then break; fi
  if ! kill -0 "$(cat /tmp/run.pid)" 2>/dev/null; then
    step=$(last_step)
    if [ "${step:-0}" -ge "$DONE_STEP" ]; then break; fi
    echo "watcher: train died at step ${step:-?}; resuming at $(date)" >&2
    nohup timeout 14400 python -m nerf_lidar_tpu.cli train \
      --config_json exp/scale_speed/config.json \
      >> exp/scale_speed/train2.log 2>&1 &
    echo $! > /tmp/run.pid
    touch "$METRICS"
    sleep 300  # warmup grace
    continue
  fi
  # Wedge detector: pid alive but metrics stale for 10+ min.
  if [ -f "$METRICS" ]; then
    age=$(( $(date +%s) - $(stat -c %Y "$METRICS") ))
    if [ "$age" -gt 900 ]; then
      echo "watcher: WEDGE (metrics ${age}s stale) — kill+resume $(date)" >&2
      pid=$(cat /tmp/run.pid)
      kill "$pid" 2>/dev/null
      pkill -9 -P "$pid" 2>/dev/null  # the timeout/python children
      sleep 5
      nohup timeout 14400 python -m nerf_lidar_tpu.cli train \
        --config_json exp/scale_speed/config.json \
        >> exp/scale_speed/train2.log 2>&1 &
      echo $! > /tmp/run.pid
      touch "$METRICS"
      sleep 300
      continue
    fi
  fi
  sleep 60
done
echo "watcher: training complete at step $(last_step), $(date)" >&2

# Stage A: post-training artifact session (eval, lidar_eval, sweeps,
# raydrop+KITTI, sweep_bench, dynamic check) batched into one process.
timeout 9000 python exp/chip_session_r4.py > exp/chip_session_r4.log 2>&1
echo "watcher: chip session done ($?) at $(date)" >&2

# Stage B: solo headline bench for BASELINE.md round-4 tables.
timeout 3600 python bench.py > exp/BENCH_local_r4.json 2>&1
echo "watcher: bench done ($?) at $(date)" >&2

# Stage C: reference-exact parity run (VERDICT r3 ask 1c). Bounded to 6h;
# the session kills it earlier via /tmp/parity.pid if round end nears.
nohup timeout 21600 python -m nerf_lidar_tpu.cli train \
  --config nuscenes_multi --data_dir exp/data/nusc_scale \
  --exp_name scale_parity \
  --set batch_size=4096 --set max_steps=25000 --set checkpoint_every=2500 \
  --set lidar_supervision=true \
  --set model.instance_obj=true \
  --set track_refine=true --set patch_size=32 \
  --set train_render_every=2500 \
  > exp/scale_parity_train.log 2>&1 &
echo $! > /tmp/parity.pid
echo "watcher: parity run launched pid $(cat /tmp/parity.pid) at $(date)" >&2
