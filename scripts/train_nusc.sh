#!/bin/bash
# Launcher analog of reference zipnerf/scripts/run/train_nusc.sh — same
# operating points (batch 16384 multi-chip / 4096 single-chip debug,
# 40k steps), TPU-native launch model: ONE python process per host; jax
# shards the batch over every local chip automatically (no
# accelerate/NCCL rendezvous — XLA derives the ICI psum from shardings).
#
# Usage: scripts/train_nusc.sh NUM_HOSTS TAG SCENE CONFIG
#   NUM_HOSTS  1 = this host only; >1 = run this script once per host
#              with --multihost coordination via jax.distributed
#              (TPU pods auto-detect; elsewhere set JAX_COORDINATOR_ADDRESS,
#              JAX_NUM_PROCESSES, JAX_PROCESS_ID)
#   TAG        experiment tag (exp dir = <config>/<scene>/<tag>)
#   SCENE      scene dir name under $DATA_ROOT
#   CONFIG     config name, e.g. nuscenes_multi (see configs.py)
set -eu
NUM_HOSTS=$1; TAG=$2; SCENE=$3; CONFIG=$4
DATA_DIR="${DATA_ROOT:?set DATA_ROOT}/${SCENE}"
EXPERIMENT="${CONFIG}/${SCENE}/${TAG}"
BATCH_SIZE=16384
MAX_STEPS=40000

if [ "$NUM_HOSTS" -eq 1 ]; then
  echo 'one host training (local chips shard automatically)'
  BATCH_SIZE=4096
  python -m nerf_lidar_tpu.cli train --config "$CONFIG" \
    --data_dir "$DATA_DIR" --exp_name "$EXPERIMENT" \
    --set batch_size=$BATCH_SIZE --set factor=1 \
    --set max_steps=$MAX_STEPS
else
  echo "multi-host training over $NUM_HOSTS hosts"
  python -m nerf_lidar_tpu.cli train --config "$CONFIG" \
    --data_dir "$DATA_DIR" --exp_name "$EXPERIMENT" \
    --set batch_size=$BATCH_SIZE --set factor=1 \
    --set max_steps=$MAX_STEPS --multihost
fi
