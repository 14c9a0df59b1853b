"""Pallas TPU z-buffer kernel for triangle rasterization.

The visibility resolver of the nvdiffrast replacement (see
mesh_raster.py): per screen tile, stream chunks of binned triangles and
keep the nearest (smallest NDC depth) covering triangle per pixel. This
kernel is intentionally NON-differentiable — it only picks winners; the
differentiable quantities (barycentrics, attributes) are re-derived in
jnp from the winner ids, which gives exact autodiff gradients without a
hand-written backward (the nvdiffrast "deferred shading" decomposition).

Unlike the gaussian compositor there is no sequential dependency: the
z-test is a pure min-reduction, so chunks combine associatively and the
whole tile is two vectorized reductions per chunk.

Feature row layout ([ROWS, chunk] f32):
  0 x0, 1 y0, 2 x1, 3 y1, 4 x2, 5 y2  (screen-pixel coords)
  6 z0, 7 z1, 8 z2                    (NDC depth, screen-affine)
  9 tri_id+1 (f32; exact below 2^24; 0 = padding slot)
  10.. pad (ROWS = 16)

Output per tile: [PIX, 8]: 0 tri_id+1 (0 = miss), 1 z, rest pad.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 16
OUT_CH = 8
_f32 = jnp.float32
BIG = 3.4e38  # python float: jnp scalars would be captured tracers in pallas


def _pixel_coords(tile_id, grid_x, tile):
    ty = tile_id // grid_x
    tx = tile_id - ty * grid_x
    pid = jax.lax.broadcasted_iota(jnp.int32, (tile * tile, 1), 0)
    px = (tx * tile + pid % tile).astype(_f32)
    py = (ty * tile + pid // tile).astype(_f32)
    return px, py


def _ztest_kernel(chunk_start_ref, n_chunks_ref, feat_hbm, out_ref,
                  buf, sems, *, grid_x: int, chunk: int, tile: int):
    pix = tile * tile
    t = pl.program_id(0)
    n_chunks = n_chunks_ref[t]
    start = chunk_start_ref[t]
    px, py = _pixel_coords(t, grid_x, tile)

    def feat_dma(slot, c):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds((start + c) * chunk, chunk)],
            buf.at[slot], sems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        feat_dma(0, 0).start()

    def body(c, carry):
        zbest, idbest = carry
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            feat_dma(1 - slot, c + 1).start()

        feat_dma(slot, c).wait()
        f = buf[slot]
        ids = f[9:10, :]  # [1, C] f32 (tri_id+1; 0 for padding)

        x0, y0 = f[0:1, :], f[1:2, :]
        x1, y1 = f[2:3, :], f[3:4, :]
        x2, y2 = f[4:5, :], f[5:6, :]
        z0, z1, z2 = f[6:7, :], f[7:8, :], f[8:9, :]

        # Edge functions at each pixel center: [PIX, C].
        e0 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        e1 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
        e2 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)  # [1, C]

        # Inside test in float arithmetic (Mosaic rejects i1-vector selects):
        # for positive area all edges must be >= 0, for negative area <= 0.
        smin = jnp.minimum(jnp.minimum(e0, e1), e2)
        smax = jnp.maximum(jnp.maximum(e0, e1), e2)
        inside_f = jnp.where(area > 0.0, smin, -smax)  # >= 0 iff inside
        valid = (inside_f >= 0.0) & (area != 0.0) & (ids > 0.0)

        inv_a = 1.0 / jnp.where(area != 0.0, area, 1.0)
        b0 = e0 * inv_a
        b1 = e1 * inv_a
        b2 = e2 * inv_a
        z = b0 * z0 + b1 * z1 + b2 * z2

        zc = jnp.where(valid, z, BIG)
        # Per-pixel min across the chunk + matching id.
        zmin = jnp.min(zc, axis=1, keepdims=True)           # [PIX, 1]
        hit = zc <= zmin                                     # ties -> any
        idw = jnp.max(jnp.where(hit & valid, ids, 0.0), axis=1, keepdims=True)
        better = (zmin < zbest) & (idw > 0.0)
        zbest = jnp.where(better, zmin, zbest)
        idbest = jnp.where(better, idw, idbest)
        return zbest, idbest

    init = (jnp.full((pix, 1), BIG, _f32), jnp.zeros((pix, 1), _f32))
    zbest, idbest = jax.lax.fori_loop(0, n_chunks, body, init)
    out_ref[0] = jnp.concatenate(
        [idbest, jnp.where(idbest > 0.0, zbest, 0.0),
         jnp.zeros((pix, OUT_CH - 2), _f32)], axis=1
    )


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit, static_argnames=("grid_x", "num_tiles", "chunk", "tile")
)
def ztest(dup_feat, chunk_starts, n_chunks, *, grid_x, num_tiles,
          chunk, tile):
    """Resolve per-pixel nearest triangle.

    dup_feat: [ROWS, K_aligned] triangle screen features per duplicate
    (row 9 = tri_id+1 as f32, 0 for padding).
    Returns [num_tiles, tile*tile, OUT_CH].
    """
    pix = tile * tile
    kernel = functools.partial(
        _ztest_kernel, grid_x=grid_x, chunk=chunk, tile=tile
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, pix, OUT_CH), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, chunk), _f32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, pix, OUT_CH), _f32),
        interpret=_use_interpret(),
    )(chunk_starts, n_chunks, dup_feat)
