#!/bin/bash
# Round-5d chip session (sequential, chip-exclusive — one process at a time):
#   A. sweep_bench on the speed flagship with the chunk ladder — the
#      <1 s/sweep north-star shot. The quality config went 3.17 -> 2.10 s
#      at render_chunk_size 17600 (exp/chip_session_r5b.log); by that ratio
#      the speed config's round-4 1.404 s projects to ~0.93 s. Fresh init:
#      the scale_speed 25k checkpoint was not retained and sweep throughput
#      is weight-independent (static shapes).
#   B. profile_recipe with the round-5c decomposition rungs
#      (objects_nodiff / objects_spectral / trackrefine / full_spectralobj)
#      — the r5c watcher ran it with exp/ on sys.path and died on import;
#      the launcher is fixed in the script itself now.
#   C. bench.py refresh -> exp/BENCH_local_r5d.json.
#   D. resume parity banking (VERDICT r4 #8) until the deadline.
set -u
cd /root/repo
DEADLINE=${1:-1787189500}

timeout 2400 python experiments/sweep_bench.py \
  nuscenes_multi_speed scale_speed fresh > exp/sweep_bench_r5d.log 2>&1
echo "r5d: sweep_bench done ($?) at $(date)" >&2

timeout 5400 python exp/profile_recipe.py > exp/profile_recipe_r5d.log 2>&1
echo "r5d: profile_recipe done ($?) at $(date)" >&2

timeout 1800 python bench.py > exp/BENCH_local_r5d.json 2> exp/bench_r5d.err
echo "r5d: bench done ($?) at $(date)" >&2

bash exp/babysit.sh exp/scale_parity 25000 /tmp/parity_r5c.pid \
  "$DEADLINE" 2400 2400 >> exp/scale_parity_babysit_r5c.log 2>&1
echo "r5d: parity banking done at $(date)" >&2
