#!/bin/bash
# Round-5c chip queue: wait for watcher_r5 ($1 = its pid) to finish its
# chain (scale_r5q endpoint session + bench + multichip execute), then,
# ONE chip process at a time:
#   A. profile_recipe with the round-5c rungs (objects_nodiff /
#      objects_spectral / trackrefine / full_spectralobj) — decomposes
#      the remaining objects overhead against VERDICT r4 #1's >=35k
#      full-recipe bar and measures the spectral-obj candidate.
#   B. obj-field quality shootout: two 1500-step full-recipe trainings on
#      the at-scale scene (hashed obj field vs configs.spectral_obj_variant)
#      with endpoint evals — the quality evidence a flagship config change
#      needs (exp/objq_hash, exp/objq_spec).
#   C. parity banking (VERDICT r4 #8): resume exp/scale_parity under the
#      babysitter until $2 (deadline epoch) — extends the matched-step
#      reference-exact curve from its round-4 step-200 anchor.
set -u
WATCHER_PID=$1
PARITY_DEADLINE=$2
cd /root/repo

while kill -0 "$WATCHER_PID" 2>/dev/null; do sleep 60; done
echo "watcher_r5c: watcher_r5 $WATCHER_PID exited at $(date)" >&2

timeout 4200 python exp/profile_recipe.py > exp/profile_recipe_r5c.log 2>&1
echo "watcher_r5c: profile_recipe done ($?) at $(date)" >&2

# B: same recipe knobs as the scale_r5q run but 1500 steps, on the speed
# flagship base (the config the bench full-recipe number quotes).
SETS="--set batch_size=4096 --set max_steps=1500 --set checkpoint_every=500
      --set print_every=100 --set train_render_every=500
      --set lidar_supervision=true --set model.instance_obj=true
      --set track_refine=true --set patch_size=32"
SPEC="--set model.obj_mlp.grid.encoder=dense_fourier
      --set model.obj_mlp.grid.fourier_freqs=96
      --set model.obj_mlp.grid.fourier_dense_res=32
      --set model.obj_mlp.grid.fourier_pooled=true
      --set model.obj_mlp.grid.interp=tetra"
for arm in hash spec; do
  EXTRA=""
  if [ "$arm" = "spec" ]; then EXTRA="$SPEC"; fi
  timeout 4500 python -m nerf_lidar_tpu.cli train \
    --config nuscenes_multi_speed --data_dir exp/data/nusc_scale \
    --exp_name objq_$arm $SETS $EXTRA \
    > exp/objq_${arm}_train.log 2>&1
  echo "watcher_r5c: objq_$arm train done ($?) at $(date)" >&2
  timeout 2400 python -m nerf_lidar_tpu.cli eval \
    --config_json exp/objq_$arm/config.json \
    >> exp/objq_${arm}_train.log 2>&1
  echo "watcher_r5c: objq_$arm eval done ($?) at $(date)" >&2
done

# C: parity banking until the deadline (babysit relaunches from
# exp/scale_parity/config.json; checkpoint_every=100 / print_every=25 are
# already in that snapshot — round-4 postmortem settings).
bash exp/babysit.sh exp/scale_parity 25000 /tmp/parity_r5c.pid \
  "$PARITY_DEADLINE" 2400 2400 >> exp/scale_parity_babysit_r5c.log 2>&1
echo "watcher_r5c: parity banking done at $(date)" >&2
