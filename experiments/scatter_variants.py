"""Measure scatter-add strategies for the hash-grid backward on v5e.

The fast-config backward scatters ~11.5M (index, C16-row) adds per step
across tables of 4096 (tiled coarse) and 2^17 (hashed) rows; round-1/2
measurements put XLA's native scatter at ~55M idx/s (<=2^17 rows). This
script measures the candidates from ROADMAP.md on the real chip:

  a. XLA scatter-add (baseline, what ops/grid.py ships);
  b. sort + segment_sum (argsort keys, permute vals, segment-reduce);
  c. chunked one-hot matmul in plain XLA (MXU-resident scatter);
  d. Pallas kernel: one-hot built in VMEM, accumulated via MXU matmul
     over a [rows, C] VMEM accumulator (no HBM one-hot traffic).

Timing rule for this tunneled backend: bound every measurement by
device_get of a value that depends on the full chain (block_until_ready
returns early here — see BASELINE.md).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_lidar_tpu.utils import compile_cache

compile_cache.enable()

C = 16


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.tree.map(lambda x: jax.device_get(x.ravel()[0]), out)  # warm+compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # chain-dependent fetch
    s = jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    return dt, s


@functools.partial(jax.jit, static_argnames=("rows",))
def xla_scatter(idx, vals, rows):
    return jnp.zeros((rows, C), vals.dtype).at[idx].add(vals)


@functools.partial(jax.jit, static_argnames=("rows",))
def sort_segment(idx, vals, rows):
    order = jnp.argsort(idx)
    idx_s = idx[order]
    vals_s = jnp.take(vals, order, axis=0)
    return jax.ops.segment_sum(vals_s, idx_s, num_segments=rows,
                               indices_are_sorted=True)


@functools.partial(jax.jit, static_argnames=("rows", "block"))
def onehot_matmul(idx, vals, rows, block=2048):
    n = idx.shape[0]
    nb = n // block
    idxb = idx[: nb * block].reshape(nb, block)
    valsb = vals[: nb * block].reshape(nb, block, C)

    def body(acc, inp):
        i, v = inp
        oh = jax.nn.one_hot(i, rows, dtype=v.dtype)  # [block, rows]
        return acc + jnp.einsum("br,bc->rc", oh, v,
                                preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((rows, C), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (idxb, valsb))
    return acc


def pallas_mxu_scatter(idx, vals, rows, block=1024):
    """out[r] += sum_{i: idx[i]==r} vals[i] via MXU matmul per block.

    One-hot [block, rows] is built in VMEM from iota compares and
    contracted against the vals block; the [rows, C] accumulator stays in
    VMEM across the whole grid (same out block every step)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = idx.shape[0]
    nb = n // block

    def kernel(idx_ref, vals_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        ids = idx_ref[:]  # [block]
        rows_iota = jax.lax.broadcasted_iota(jnp.int32, (block, rows), 1)
        oh = (rows_iota == ids[:, None]).astype(jnp.float32)
        out_ref[:] += jax.lax.dot_general(
            oh, vals_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,)),
            pl.BlockSpec((block, C), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((rows, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, C), jnp.float32),
        interpret=jax.default_backend() not in ("tpu",),
    )(idx, vals)


def main():
    rng = np.random.RandomState(0)
    print(f"backend: {jax.default_backend()}")
    for rows in (4096, 2**17):
        for n in (1 << 20, 1 << 22):
            idx = jnp.asarray(rng.randint(0, rows, n, dtype=np.int32))
            vals = jnp.asarray(rng.randn(n, C).astype(np.float32))
            base, _ = timeit(xla_scatter, idx, vals, rows)
            print(f"rows={rows:7d} n={n>>20}M xla_scatter   "
                  f"{n / base / 1e6:8.1f}M idx/s ({base*1e3:.1f} ms)")
            t, _ = timeit(sort_segment, idx, vals, rows)
            print(f"rows={rows:7d} n={n>>20}M sort_segment  "
                  f"{n / t / 1e6:8.1f}M idx/s ({t*1e3:.1f} ms)")
            if rows <= 8192:
                t, _ = timeit(onehot_matmul, idx, vals, rows)
                print(f"rows={rows:7d} n={n>>20}M onehot_xla    "
                      f"{n / t / 1e6:8.1f}M idx/s ({t*1e3:.1f} ms)")
                t, _ = timeit(jax.jit(functools.partial(
                    pallas_mxu_scatter, rows=rows)), idx, vals)
                print(f"rows={rows:7d} n={n>>20}M pallas_mxu    "
                      f"{n / t / 1e6:8.1f}M idx/s ({t*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
