"""Host input-pipeline throughput: RayBatcher rate on the at-scale scene.

VERDICT round-2 weak #8 / roadmap item 3: does the numpy batcher starve an
8-chip mesh? Measures pure batch-construction rate (no device_put, no TPU)
for the full recipe (patches + lidar + road-aug) and the stripped bench
config, single-threaded and with the prefetcher's 2-worker thread pool.

Run: python experiments/batcher_bench.py   (CPU only; safe while the chip
is busy).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from nerf_lidar_tpu import configs  # noqa: E402
from nerf_lidar_tpu.cli import load_scene_for  # noqa: E402
from nerf_lidar_tpu.data.batching import RayBatcher  # noqa: E402


def rate(make, seconds=6.0):
    make()  # warm
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        make()
        n += 1
    return n / (time.perf_counter() - t0)


def threaded_rate(makers, seconds=6.0):
    """Aggregate rate of len(makers) worker threads (numpy releases the GIL
    on the big fancy-indexing/concat ops, so threads do scale some)."""
    import threading
    counts = [0] * len(makers)
    stop = threading.Event()

    def work(i):
        while not stop.is_set():
            makers[i]()
            counts[i] += 1

    threads = [threading.Thread(target=work, args=(i,))
               for i in range(len(makers))]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join()
    return sum(counts) / (time.perf_counter() - t0)


def main():
    cfg = configs.nuscenes_single_fast()
    import dataclasses
    cfg = dataclasses.replace(cfg, data_dir="exp/data/nusc_scale",
                              batch_size=4096)
    scene = load_scene_for(cfg, "train")

    variants = {
        "full_recipe": dict(patch_size=8, lidar_supervision=True,
                            aug_road=True),
        "stripped": dict(patch_size=1, lidar_supervision=False,
                         aug_road=False),
    }
    out = {}
    for name, kw in variants.items():
        b = RayBatcher(scene.data, cfg.batch_size, seed=0, **kw)
        r1 = rate(b.next)
        workers = [RayBatcher(scene.data, cfg.batch_size, seed=i, **kw)
                   for i in range(4)]
        r4 = threaded_rate([w.next for w in workers])
        out[name] = dict(
            rays_per_batch=b.total_rays,
            batches_per_sec_1thr=round(r1, 2),
            rays_per_sec_1thr=round(r1 * b.total_rays),
            batches_per_sec_4thr=round(r4, 2),
            rays_per_sec_4thr=round(r4 * b.total_rays),
        )
        print(name, out[name], flush=True)

    ncpu = os.cpu_count()
    print(f"host_cpus={ncpu}")
    # Consumption targets (round-2/3 measured per-chip rates).
    for chips, per_chip in [(1, 27000), (8, 27000)]:
        need = chips * per_chip
        have = out["stripped"]["rays_per_sec_4thr"]
        print(f"target {chips}x{per_chip} = {need} rays/s -> "
              f"{'OK' if have >= need else 'SHORT'} "
              f"(have {have}, ratio {have/need:.2f})")


if __name__ == "__main__":
    main()
