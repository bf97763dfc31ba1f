#!/bin/bash
# Launcher analog of reference zipnerf/scripts/run/render_video_nusc.sh:
# scene-edit video rendering; --hq applies the reference's test-time
# sampling bump (num_prop_samples 256, render_video.py:130). The render
# entry shards ray chunks over every visible chip automatically.
#
# Usage: scripts/render_video_nusc.sh NUM_HOSTS TAG SCENE CONFIG [MODE]
#   MODE: replay | laneshift | removal | rotate   (default replay)
set -eu
NUM_HOSTS=$1; TAG=$2; SCENE=$3; CONFIG=$4; MODE=${5:-replay}
DATA_DIR="${DATA_ROOT:?set DATA_ROOT}/${SCENE}"
EXPERIMENT="${CONFIG}/${SCENE}/${TAG}"

python -m nerf_lidar_tpu.cli render_video --config "$CONFIG" \
  --data_dir "$DATA_DIR" --exp_name "$EXPERIMENT" \
  --set factor=1 --mode "$MODE" --hq --video --fps 6 --num_frames 12
