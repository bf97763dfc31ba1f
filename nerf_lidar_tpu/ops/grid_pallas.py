"""Pallas TPU experiments for the hash-grid encoder, and the record of why
the production encode path (ops/grid.py) uses XLA's native gather.

SURVEY.md section 7.3 flags the hash-grid kernel as the mandatory custom-op
port. On GPU the win comes from fusing hash+gather+lerp in one CUDA kernel
with register accumulation (reference gridencoder.cu:87-245). On TPU the
trade-offs differ, and we verified them empirically on a v5e:

1. Mosaic (the Pallas TPU compiler) has no vector table-gather primitive:
   `jnp.take(table, idx, axis=0)` inside a kernel fails to lower ("Shape
   mismatch in input, indices and output"): its dynamic-gather is the
   elementwise/lane form `out[i, j] = op[i, idx[i, j]]` and only lowers for
   a single (8, 128) tile (probed: [8,128] lane-gather compiles; [512,128]
   sublane-gather does not). Hash tables are 2^21 x C — far beyond a tile —
   so a Pallas kernel cannot express the random row lookup the encoder
   needs, short of one scalar DMA per corner (8 x 16-byte DMAs per sample:
   orders of magnitude slower than XLA's pipelined gather).

2. XLA's native TPU gather is already the hardware-idiomatic primitive for
   this access pattern, and its transpose is a *deterministic* scatter-add
   (an upgrade over the reference's atomicAdd backward). What actually cost
   performance was memory *layout*, not the gather itself: keeping the big
   axis in the 128-lane dimension (coordinate-major [3, N] / [C, N]
   intermediates, ops/grid.py:_encode_levels) plus per-level remat took the
   step from OOM-at-4096-rays to 5.1M rays/s/chip.

3. The fusion opportunity that remains on-TPU (hash-index + trilinear
   weights + erf downweighting around the gathers) is elementwise VPU work
   that XLA fuses on its own; re-expressing it in Pallas would only pin
   scheduling XLA already gets right.

The kernel below is kept as a compiled, tested demonstration of the
single-tile lane-gather that DOES lower, so future work on a block-sorted
gather (bucketing points by table tile, then tile-local Pallas gathers) has
a verified starting point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_gather_kernel(tbl_ref, idx_ref, out_ref):
    # out[i, j] = tbl[i, idx[i, j]] — the only gather form Mosaic lowers.
    out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=1)


def tile_lane_gather(tbl: jax.Array, idx: jax.Array) -> jax.Array:
    """Lane-dimension gather within one (8, 128) VMEM tile.

    tbl: [8, 128] float32; idx: [8, 128] int32 in [0, 128).
    Returns out[i, j] = tbl[i, idx[i, j]].
    """
    assert tbl.shape == (8, 128) and idx.shape == (8, 128)
    return pl.pallas_call(
        _tile_gather_kernel,
        interpret=jax.default_backend() not in ("tpu",),
        out_shape=jax.ShapeDtypeStruct((8, 128), tbl.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tbl, idx)
