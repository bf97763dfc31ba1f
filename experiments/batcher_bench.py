"""Host input-pipeline throughput: can the numpy RayBatcher feed an
8-chip DP mesh? (VERDICT round-2 weak #8 / next-round #10.)

Measures batches/s (= rays/s) of RayBatcher.next() alone, single-thread
and with the BatchPrefetcher's 2-worker setup, on the at-scale scene,
full recipe (patches + lidar + road-aug). Pure host measurement — no
device work. Compare against N_chips x per-chip train rays/s."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")

from nerf_lidar_tpu import configs
from nerf_lidar_tpu.data import nuscenes
from nerf_lidar_tpu.data.batching import RayBatcher


def run(batch_size=4096, n=40):
    cfg = configs.nuscenes_single_fast()
    scene = nuscenes.load_scene("exp/data/nusc_scale", split="train",
                                sensor_num=6, load_lidar=True,
                                load_objects=True, semantic_dilate=True)
    data = scene.data
    mk = lambda seed: RayBatcher(data, batch_size, 32,
                                 lidar_supervision=True,
                                 lidar_batch_ratio=4, aug_road=True,
                                 aug_delta=0.1, seed=seed)

    b = mk(0)
    b.next()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        b.next()
    dt = time.perf_counter() - t0
    solo = batch_size * n / dt
    print(json.dumps({"batcher_rays_per_sec_1thread": round(solo)}))

    # 2-worker prefetcher arrangement (what cli.py train uses).
    import itertools
    import threading
    workers = [mk(1000 + w) for w in range(2)]
    locks = [threading.Lock() for _ in workers]
    rr = itertools.count()

    def make_batch():
        w = next(rr) % len(workers)
        with locks[w]:
            return workers[w].next()

    from nerf_lidar_tpu.train.prefetch import BatchPrefetcher
    pf = BatchPrefetcher(make_batch, depth=3, num_workers=2)
    pf.next()
    t0 = time.perf_counter()
    for _ in range(n):
        pf.next()
    dt = time.perf_counter() - t0
    pf.close()
    two = batch_size * n / dt
    print(json.dumps({"batcher_rays_per_sec_2workers": round(two)}))
    return solo, two


if __name__ == "__main__":
    run()
