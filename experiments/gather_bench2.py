"""Follow-up probes: table-size cliff, parallel-op scaling, scatter variants.

Findings from gather_bench.py round 1 (v5e, jax 0.9):
  gather 2^19xC16 f32: 45M idx/s;  2^15/2^12: 186M idx/s  (4x cliff)
  4 parallel gather ops on 2^19: 100M idx/s total
  scatter-add 2^19: 15.6M idx/s (all forms)
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

LOOP = 20


def chain_int(s):
    return (s * 0).astype(jnp.int32)


def timeit(fn, *args, iters=3):
    out = fn(*args)
    float(jax.device_get(out))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.device_get(out))
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, n_ops, secs):
    rate = n_ops / secs / 1e6
    print(json.dumps({"probe": name, "rate_M_per_s": round(rate, 1),
                      "secs": round(secs, 4)}), flush=True)
    return rate


def bench_gather(R, C, N, dtype=jnp.float32, k=1, tag=""):
    """k independent lane-form gathers totalling N indices."""
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (C, R), jnp.float32).astype(dtype)
    idxs = [jax.random.randint(jax.random.PRNGKey(i), (N // k,), 0, R,
                               jnp.int32) for i in range(k)]

    @jax.jit
    def run(tbl, *idxs):
        def body(i, carry):
            idxs, acc = carry
            s = 0.0
            for j in range(k):
                out = jnp.take(tbl, idxs[j], axis=1)
                s = s + out[0].sum().astype(jnp.float32)
            idxs = tuple((ix + 1 + chain_int(s)) % R for ix in idxs)
            return idxs, acc + s
        _, acc = jax.lax.fori_loop(0, LOOP, body, (tuple(idxs), 0.0))
        return acc

    secs = timeit(run, tbl, *idxs)
    mb = R * C * np.dtype(dtype).itemsize / 2**20
    return report(
        f"gather R=2^{int(np.log2(R))} C={C} {np.dtype(dtype).name} "
        f"({mb:.0f}MB) k={k}{tag}", N * LOOP, secs)


def bench_scatter(R, C, N, k=1, dtype=jnp.float32):
    """Scatter-add N updates; k duplicate tables summed at the end."""
    key = jax.random.PRNGKey(0)
    idxs = [jax.random.randint(jax.random.PRNGKey(i), (N // k,), 0, R,
                               jnp.int32) for i in range(k)]
    vals = [jax.random.normal(key, (C, N // k), jnp.float32).astype(dtype)
            for _ in range(k)]

    @jax.jit
    def run(*args):
        idxs, vals = args[:k], args[k:]
        def body(i, carry):
            idxs, acc = carry
            tbls = [jnp.zeros((C, R), dtype).at[:, idxs[j]].add(vals[j])
                    for j in range(k)]
            tbl = tbls[0]
            for t in tbls[1:]:
                tbl = tbl + t
            s = tbl[0].sum().astype(jnp.float32)
            idxs = tuple((ix + 1 + chain_int(s)) % R for ix in idxs)
            return idxs, acc + s
        _, acc = jax.lax.fori_loop(0, LOOP, body, (tuple(idxs), 0.0))
        return acc

    secs = timeit(run, *idxs, *vals)
    return report(f"scatter R=2^{int(np.log2(R))} C={C} "
                  f"{np.dtype(dtype).name} k={k}", N * LOOP, secs)


def main():
    N = 2**20
    # ---- cliff location (single op, f32, C=16): 2MB .. 64MB
    for lg in (16, 17, 18, 19, 20):
        bench_gather(2**lg, 16, N)
    # rows vs bytes: 2^17 x C64 = 32MB (same bytes as 2^19 x C16)
    bench_gather(2**17, 64, N)
    # bf16 2^19 = 16MB
    bench_gather(2**19, 16, N, dtype=jnp.bfloat16)
    bench_gather(2**18, 16, N, dtype=jnp.bfloat16)

    # ---- parallel-op scaling
    for k in (4, 8, 16):
        bench_gather(2**19, 16, N, k=k)
    for k in (4, 8):
        bench_gather(2**17, 16, N, k=k)
        bench_gather(2**15, 16, N, k=k)

    # ---- scatter variants
    bench_scatter(2**19, 16, N // 4, k=1)
    bench_scatter(2**19, 16, N // 4, k=4)
    bench_scatter(2**19, 16, N // 4, k=8)
    bench_scatter(2**17, 16, N // 4, k=1)
    bench_scatter(2**17, 16, N // 4, k=4)
    bench_scatter(2**17, 16, N // 4, k=8)
    bench_scatter(2**15, 16, N // 4, k=4)
    bench_scatter(2**12, 16, N // 4, k=1)


if __name__ == "__main__":
    main()
