#!/bin/bash
# Round-4 chip queue: runs the moment the scale_speed 25k run exits.
# ONE process per stage, chip kept exclusive throughout (verify-skill rule).
cd /root/repo
echo "watcher: waiting for train pid $(cat /tmp/run.pid)" >&2
while kill -0 "$(cat /tmp/run.pid)" 2>/dev/null; do sleep 60; done
echo "watcher: training exited at $(date)" >&2

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
