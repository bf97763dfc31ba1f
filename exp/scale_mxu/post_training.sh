#!/bin/bash
# Post-25k artifact sequence for scale_mxu (run solo on the chip).
set -x
cd /root/repo
C="--config_json exp/scale_mxu/config.json"
# 1. Final eval table (test views, PSNR/SSIM + color-corrected).
timeout 3000 python -m nerf_lidar_tpu.cli eval $C \
  > exp/scale_mxu/eval_25k.log 2>&1
# 2. LiDAR replay fidelity at the final checkpoint.
timeout 3000 python -m nerf_lidar_tpu.cli lidar_eval $C \
  > exp/scale_mxu/lidar_eval_25k.log 2>&1
# 3. Product artifact: simulated sweeps WITH the dynamic vehicle.
timeout 3000 python -m nerf_lidar_tpu.cli render_lidar $C --mode replay \
  --num_sweeps 4 > exp/scale_mxu/render_lidar_25k.log 2>&1
# 4. Scene-edit: removal mode (no vehicles in the sweeps).
timeout 3000 python -m nerf_lidar_tpu.cli render_lidar $C --mode replay \
  --obj_mode removal --num_sweeps 2 \
  > exp/scale_mxu/render_lidar_removal.log 2>&1
