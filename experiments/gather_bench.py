"""Microbenchmarks for hash-table access primitives on one TPU chip.

Round-1 finding of record: XLA table gathers run at ~50M indices/s on v5e
regardless of table size / row width — the structural bottleneck for
instant-ngp fields on TPU (ROADMAP.md). Round 2 re-probes the space before
building: gather formulations (lane vs sublane, sorted, hint flags),
scatter-add (the backward), one-hot matmuls (MXU-resident gather for small
tables), and Mosaic in-kernel gather capability on jax 0.9.

Measurement discipline (ROADMAP.md): the tunneled backend's
block_until_ready returns early; every timing is bounded by device_get of a
scalar that depends on the full chain, and every benched op runs inside a
fori_loop with a data dependency between iterations.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=3):
    """Run jitted fn (returns scalar), fetch value; report best seconds."""
    out = fn(*args)
    float(jax.device_get(out))  # compile + warmup
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.device_get(out))
        best = min(best, time.perf_counter() - t0)
    return best


def report(name, n_ops, secs, unit="Midx/s"):
    rate = n_ops / secs / 1e6
    print(json.dumps({"probe": name, "rate_M_per_s": round(rate, 1),
                      "secs": round(secs, 4)}), flush=True)
    return rate


LOOP = 20


def chain_int(s):
    # int32 zero that depends on s, to chain loop iterations.
    return (s * 0).astype(jnp.int32)


# ---------------------------------------------------------------- gathers
def bench_gather_lane(R, C, N, sort=False):
    """tbl [C, R], take along axis=1 (lane dim) — the production form."""
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (C, R), jnp.float32)
    idx = jax.random.randint(key, (N,), 0, R, jnp.int32)
    if sort:
        idx = jnp.sort(idx)

    @jax.jit
    def run(tbl, idx):
        def body(i, carry):
            idx, acc = carry
            out = jnp.take(tbl, idx, axis=1)
            s = out[0].sum()
            return (idx + 1 + chain_int(s)) % R, acc + s
        _, acc = jax.lax.fori_loop(0, LOOP, body, (idx, 0.0))
        return acc

    secs = timeit(run, tbl, idx)
    return report(f"gather_lane R=2^{int(np.log2(R))} C={C} N={N}"
                  + (" sorted" if sort else ""), N * LOOP, secs)


def bench_gather_row(R, C, N):
    """tbl [R, C], take along axis=0 (sublane-major rows)."""
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (R, C), jnp.float32)
    idx = jax.random.randint(key, (N,), 0, R, jnp.int32)

    @jax.jit
    def run(tbl, idx):
        def body(i, carry):
            idx, acc = carry
            out = jnp.take(tbl, idx, axis=0)
            s = out[:, 0].sum()
            return (idx + 1 + chain_int(s)) % R, acc + s
        _, acc = jax.lax.fori_loop(0, LOOP, body, (idx, 0.0))
        return acc

    secs = timeit(run, tbl, idx)
    return report(f"gather_row R=2^{int(np.log2(R))} C={C} N={N}",
                  N * LOOP, secs)


def bench_gather_2d_idx(R, C, N):
    """idx shaped [N//128, 128] (2D) — lane-form gather of 2D index array."""
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (C, R), jnp.float32)
    idx = jax.random.randint(key, (N // 128, 128), 0, R, jnp.int32)

    @jax.jit
    def run(tbl, idx):
        def body(i, carry):
            idx, acc = carry
            out = jnp.take(tbl, idx, axis=1)  # [C, N//128, 128]
            s = out[0].sum()
            return (idx + 1 + chain_int(s)) % R, acc + s
        _, acc = jax.lax.fori_loop(0, LOOP, body, (idx, 0.0))
        return acc

    secs = timeit(run, tbl, idx)
    return report(f"gather_2didx R=2^{int(np.log2(R))} C={C} N={N}",
                  N * LOOP, secs)


def bench_gather_parallel_ops(R, C, N, k):
    """k independent gather ops per iteration — probes op-level pipelining."""
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (C, R), jnp.float32)
    idxs = [jax.random.randint(jax.random.PRNGKey(i), (N // k,), 0, R,
                               jnp.int32) for i in range(k)]

    @jax.jit
    def run(tbl, *idxs):
        def body(i, carry):
            idxs, acc = carry
            s = 0.0
            for j in range(k):
                out = jnp.take(tbl, idxs[j], axis=1)
                s = s + out[0].sum()
            idxs = tuple((ix + 1 + chain_int(s)) % R for ix in idxs)
            return idxs, acc + s
        _, acc = jax.lax.fori_loop(0, LOOP, body, (tuple(idxs), 0.0))
        return acc

    secs = timeit(run, tbl, *idxs)
    return report(f"gather_{k}ops R=2^{int(np.log2(R))} C={C} N={N}",
                  N * LOOP, secs)


# ---------------------------------------------------------------- scatter
def bench_scatter_add(R, C, N):
    """tbl.at[:, idx].add(vals) — the gather transpose (lane form)."""
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, R, jnp.int32)
    vals = jax.random.normal(key, (C, N), jnp.float32)

    @jax.jit
    def run(idx, vals):
        def body(i, carry):
            idx, acc = carry
            tbl = jnp.zeros((C, R), jnp.float32).at[:, idx].add(vals)
            s = tbl[0].sum()
            return (idx + 1 + chain_int(s)) % R, acc + s
        _, acc = jax.lax.fori_loop(0, LOOP, body, (idx, 0.0))
        return acc

    secs = timeit(run, idx, vals)
    return report(f"scatter_lane R=2^{int(np.log2(R))} C={C} N={N}",
                  N * LOOP, secs)


def bench_scatter_row(R, C, N):
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, R, jnp.int32)
    vals = jax.random.normal(key, (N, C), jnp.float32)

    @jax.jit
    def run(idx, vals):
        def body(i, carry):
            idx, acc = carry
            tbl = jnp.zeros((R, C), jnp.float32).at[idx].add(vals)
            s = tbl[:, 0].sum()
            return (idx + 1 + chain_int(s)) % R, acc + s
        _, acc = jax.lax.fori_loop(0, LOOP, body, (idx, 0.0))
        return acc

    secs = timeit(run, idx, vals)
    return report(f"scatter_row R=2^{int(np.log2(R))} C={C} N={N}",
                  N * LOOP, secs)


def bench_segment_sum(R, C, N):
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, R, jnp.int32)
    vals = jax.random.normal(key, (N, C), jnp.float32)

    @jax.jit
    def run(idx, vals):
        def body(i, carry):
            idx, acc = carry
            tbl = jax.ops.segment_sum(vals, idx, num_segments=R)
            s = tbl[:, 0].sum()
            return (idx + 1 + chain_int(s)) % R, acc + s
        _, acc = jax.lax.fori_loop(0, LOOP, body, (idx, 0.0))
        return acc

    secs = timeit(run, idx, vals)
    return report(f"segment_sum R=2^{int(np.log2(R))} C={C} N={N}",
                  N * LOOP, secs)


# ---------------------------------------------------------- one-hot matmul
def bench_onehot_matmul(R, C, N, dtype=jnp.bfloat16):
    """feats[n] = tbl[idx[n]] via one_hot(idx) @ tbl — MXU-resident gather."""
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (R, C), jnp.float32).astype(dtype)
    idx = jax.random.randint(key, (N,), 0, R, jnp.int32)

    @jax.jit
    def run(tbl, idx):
        def body(i, carry):
            idx, acc = carry
            oh = jax.nn.one_hot(idx, R, dtype=dtype)
            out = jnp.dot(oh, tbl, preferred_element_type=jnp.float32)
            s = out[:, 0].sum()
            return (idx + 1 + chain_int(s)) % R, acc + s
        _, acc = jax.lax.fori_loop(0, LOOP, body, (idx, 0.0))
        return acc

    secs = timeit(run, tbl, idx)
    return report(f"onehot_matmul R=2^{int(np.log2(R))} C={C} N={N} "
                  f"{dtype.__name__}", N * LOOP, secs)


def bench_onehot_weighted(R, C, N, K=4, dtype=jnp.bfloat16):
    """Fused interp: W[n,r] = sum_k w_k (idx_k[n]==r); feats = W @ tbl.

    One matmul performs gather AND barycentric interpolation for K corners.
    """
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (R, C), jnp.float32).astype(dtype)
    idx = jax.random.randint(key, (K, N), 0, R, jnp.int32)
    w = jax.random.uniform(key, (K, N), jnp.float32)

    @jax.jit
    def run(tbl, idx, w):
        def body(i, carry):
            idx, acc = carry
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
            W = 0.0
            for k in range(K):
                W = W + jnp.where(idx[k][:, None] == iota,
                                  w[k][:, None], 0.0)
            out = jnp.dot(W.astype(dtype), tbl,
                          preferred_element_type=jnp.float32)
            s = out[:, 0].sum()
            return (idx + 1 + chain_int(s)) % R, acc + s
        _, acc = jax.lax.fori_loop(0, LOOP, body, (idx, 0.0))
        return acc

    secs = timeit(run, tbl, idx, w)
    return report(f"onehot_weighted R=2^{int(np.log2(R))} C={C} N={N} K={K}",
                  N * K * LOOP, secs)


# ----------------------------------------------------- Mosaic capabilities
def probe_mosaic_gather():
    """Which gather forms lower inside a Pallas TPU kernel on this jax?"""
    results = {}

    def try_kernel(name, kernel, out_shape, *args):
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                          for _ in args],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(*args)
            jax.block_until_ready(out)
            results[name] = "ok"
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL: {str(e)[:120]}"

    key = jax.random.PRNGKey(0)
    # 1. lane-gather within one (8,128) tile (round-1 verified).
    tbl = jax.random.normal(key, (8, 128), jnp.float32)
    idx = jax.random.randint(key, (8, 128), 0, 128, jnp.int32)
    try_kernel("take_along_axis (8,128)",
               lambda t, i, o: o.__setitem__(
                   slice(None), jnp.take_along_axis(t[:], i[:], axis=1)),
               jax.ShapeDtypeStruct((8, 128), jnp.float32), tbl, idx)

    # 2. lane-gather on a taller tile (256, 128).
    tbl = jax.random.normal(key, (256, 128), jnp.float32)
    idx = jax.random.randint(key, (256, 128), 0, 128, jnp.int32)
    try_kernel("take_along_axis (256,128)",
               lambda t, i, o: o.__setitem__(
                   slice(None), jnp.take_along_axis(t[:], i[:], axis=1)),
               jax.ShapeDtypeStruct((256, 128), jnp.float32), tbl, idx)

    # 3. row gather: out[n] = tbl[idx[n]] with tbl (512, 128), idx (256,)
    tbl = jax.random.normal(key, (512, 128), jnp.float32)
    idx = jax.random.randint(key, (256,), 0, 512, jnp.int32)
    try_kernel("take rows (512,128)<-256",
               lambda t, i, o: o.__setitem__(
                   slice(None), jnp.take(t[:], i[:], axis=0)),
               jax.ShapeDtypeStruct((256, 128), jnp.float32), tbl, idx)

    # 4. sublane gather via take_along_axis on axis 0.
    tbl = jax.random.normal(key, (128, 128), jnp.float32)
    idx = jax.random.randint(key, (128, 128), 0, 128, jnp.int32)
    try_kernel("take_along_axis axis0 (128,128)",
               lambda t, i, o: o.__setitem__(
                   slice(None), jnp.take_along_axis(t[:], i[:], axis=0)),
               jax.ShapeDtypeStruct((128, 128), jnp.float32), tbl, idx)

    # 5. big-table lane gather: tbl (8, 2^15) idx (8, 128)
    tbl = jax.random.normal(key, (8, 2**15), jnp.float32)
    idx = jax.random.randint(key, (8, 128), 0, 2**15, jnp.int32)
    try_kernel("take_along_axis (8, 2^15)",
               lambda t, i, o: o.__setitem__(
                   slice(None), jnp.take_along_axis(t[:], i[:], axis=1)),
               jax.ShapeDtypeStruct((8, 128), jnp.float32), tbl, idx)

    for k, v in results.items():
        print(json.dumps({"probe": f"mosaic {k}", "result": v}), flush=True)
    return results


def bench_pallas_tile_gather(N):
    """Round-1 verified (8,128) lane-gather, rate when driven over a grid."""
    R, C = 128, 8  # transposed: tbl [8 sublanes? no — [8,128] tile
    key = jax.random.PRNGKey(0)
    tbl = jax.random.normal(key, (8, 128), jnp.float32)
    idx = jax.random.randint(key, (N // 128, 8, 128), 0, 128, jnp.int32)

    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(
            t_ref[:], i_ref[0], axis=1)[None]

    @jax.jit
    def run(tbl, idx):
        def body(i, carry):
            idx, acc = carry
            out = pl.pallas_call(
                kernel,
                grid=(N // 128,),
                out_shape=jax.ShapeDtypeStruct((N // 128, 8, 128),
                                               jnp.float32),
                in_specs=[
                    pl.BlockSpec((8, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(tbl, idx)
            s = out[:, 0, 0].sum()
            return (idx + 1 + chain_int(s)) % 128, acc + s
        _, acc = jax.lax.fori_loop(0, LOOP, body, (idx, 0.0))
        return acc

    try:
        secs = timeit(run, tbl, idx)
        return report(f"pallas_tile_gather N={N} (8x128 lanes)",
                      N * 8 * LOOP, secs)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"probe": "pallas_tile_gather",
                          "result": f"FAIL: {str(e)[:160]}"}), flush=True)


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    N = 2**20
    # Production-relevant sizes: fine level (2^19, C16), mid (2^17, C4).
    bench_gather_lane(2**19, 16, N)
    bench_gather_lane(2**19, 16, N, sort=True)
    bench_gather_lane(2**15, 16, N)
    bench_gather_lane(2**12, 16, N)
    bench_gather_row(2**19, 16, N)
    bench_gather_2d_idx(2**19, 16, N)
    bench_gather_parallel_ops(2**19, 16, N, 4)
    bench_gather_lane(2**19, 16, N // 8)

    bench_scatter_add(2**19, 16, N // 4)
    bench_scatter_row(2**19, 16, N // 4)
    bench_segment_sum(2**19, 16, N // 4)

    bench_onehot_matmul(2**12, 16, 2**17)
    bench_onehot_matmul(2**13, 16, 2**17)
    bench_onehot_matmul(2**14, 16, 2**16)
    bench_onehot_weighted(2**12, 16, 2**17, K=4)
    bench_onehot_weighted(2**13, 16, 2**16, K=4)

    probe_mosaic_gather()
    bench_pallas_tile_gather(2**17)


if __name__ == "__main__":
    main()
