"""Device-side (JAX/XLA) compute steps of the encode pipeline.

This module holds the jit-compiled, batched-over-superblocks entry points.
The philosophy (SURVEY.md section 7): everything per-pixel/per-block and
batchable runs on device; the serial entropy tail runs on host.

`intra_analysis_step` is the lookahead-style intra cost model (reference
analog: src/api/lookahead.rs estimate_intra_costs): evaluate cheap intra
predictors for every 8x8 sub-block of a batch of 64x64 superblocks and
return per-SB cost maps.  It is the flagship single-chip step while the full
RDO pipeline is under construction, and the unit of sharding for the
multi-chip dry run.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@jax.jit
def intra_analysis_step(sbs: jax.Array, qidx: jax.Array) -> jax.Array:
    """sbs: (N, 64, 64) int32 luma superblocks.  Returns (N, 8, 8) int32
    per-8x8-block minimal intra prediction cost (DC/H/V/Paeth candidates,
    predicted from source neighbors - the lookahead approximation)."""
    n = sbs.shape[0]
    # split into 8x8 blocks: axes (n, by, bx, y, x)
    blocks = jnp.moveaxis(sbs.reshape(n, 8, 8, 8, 8), 2, 3)

    # neighbor rows/cols from the source (edge blocks see the 128 pad value)
    padded = jnp.pad(sbs, ((0, 0), (1, 0), (1, 0)), constant_values=128)
    # row above each block: padded rows 0,8,..56 -> (n, by, bx, x)
    above = padded[:, 0:64:8, 1:].reshape(n, 8, 8, 8)
    # column left of each block: padded cols 0,8,..56 -> (n, by, y, bx) -> (n, by, bx, y)
    left = jnp.moveaxis(padded[:, 1:, 0:64:8].reshape(n, 8, 8, 8), 2, 3)

    dc = (above.sum(-1) + left.sum(-1) + 8) // 16  # (n, by, bx)
    pred_dc = dc[..., None, None]
    pred_h = left[..., :, None] * jnp.ones((1, 1, 1, 1, 8), jnp.int32)
    pred_v = above[..., None, :] * jnp.ones((1, 1, 1, 8, 1), jnp.int32)

    def sad(pred):
        return jnp.abs(blocks - pred).sum((-1, -2))

    costs = jnp.stack([sad(pred_dc), sad(pred_h), sad(pred_v)], axis=-1)
    bias = 2 + (qidx.astype(jnp.int32) >> 5)
    return costs.min(-1) + bias


def sharded_intra_analysis(mesh: Mesh, sbs: jax.Array, qidx: jax.Array) -> jax.Array:
    """Shard the SB batch across the mesh's `sb` axis and run one step."""
    sharding = NamedSharding(mesh, P("sb", None, None))
    sbs = jax.device_put(sbs, sharding)
    fn = jax.jit(
        intra_analysis_step,
        in_shardings=(sharding, NamedSharding(mesh, P())),
        out_shardings=NamedSharding(mesh, P("sb", None, None)),
    )
    return fn(sbs, qidx)
