"""Tile-sharded rendering: the sequence/context-parallel axis.

SURVEY.md §2.3 / §5: the structural analogue of sequence parallelism in
this workload is the **pixel/tile dimension** — per-tile front-to-back
compositing over depth-sorted gaussians is exactly the sequential
structure of blockwise attention. This module shards the tile grid across
a ``tile`` mesh axis:

- projection + binning run REPLICATED (cheap, and the duplicate lists
  depend on all gaussians);
- each device runs the Pallas compositing kernel over its contiguous slab
  of tile rows and produces its image slab (no communication in forward —
  tiles are independent);
- backward: each device computes gradients for the duplicates of its own
  tiles; the gather-VJP segment-sum back to per-gaussian features is a
  partial sum, combined with ONE ``psum`` over the tile axis.

Composes with the data axis of dp.py into a 2D (data, tile) mesh: views
shard over ``data``, each view's pixels shard over ``tile``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.binning import TILE, bin_gaussians
from ..ops.project import project_gaussians
from ..ops.rasterize import (
    GaussianRender,
    _composite_cols,
    build_feature_cols,
)
from ..ops.rasterize_pallas import OUT_CH


def rasterize_projected_tile_sharded(
    mean2d, depth, conic, color, opacity, radius,
    width: int, height: int, bg,
    axis_name: str = "tile",
    n_shards: int | None = None,
    max_tiles: int = 12,
    chunk: int = 128,
    tile: int = 32,
):
    """Tile-sharded version of rasterize_projected, for use INSIDE
    shard_map (axis ``axis_name`` must exist in the enclosing mesh).

    All inputs are replicated; the returned image/depth/alpha are the
    full (gathered) arrays, replicated. Gradients flow exactly as in the
    single-device path (each device contributes its tiles' gradients,
    psum'd).
    """
    assert width % tile == 0 and height % tile == 0
    n = mean2d.shape[0]
    grid_x = width // tile
    grid_y = height // tile
    num_tiles = grid_x * grid_y
    if n_shards is None:
        n_shards = jax.lax.axis_size(axis_name)
    assert grid_y % n_shards == 0, (
        f"tile rows {grid_y} must divide over {n_shards} shards"
    )
    rows_per = grid_y // n_shards
    tiles_per = rows_per * grid_x

    bins = bin_gaussians(
        mean2d, depth, radius, width, height,
        max_tiles=max_tiles, chunk=chunk, tile=tile,
        conic=jax.lax.stop_gradient(conic),
        log_opacity=jnp.log(jnp.maximum(
            jax.lax.stop_gradient(opacity).astype(jnp.float32), 1e-30
        )),
    )

    feat_cols = build_feature_cols(mean2d, depth, conic, color, opacity)

    # This device's slab of tiles.
    shard = jax.lax.axis_index(axis_name)
    t0 = shard * tiles_per
    local_starts = jax.lax.dynamic_slice(bins.chunk_starts, (t0,), (tiles_per,))
    local_nchunks = jax.lax.dynamic_slice(bins.n_chunks, (t0,), (tiles_per,))

    local_out = _composite_cols(
        feat_cols, bins.dup_map, bins.gather_map, bins.big_src,
        bins.big_gather, local_starts, local_nchunks,
        jnp.asarray([t0], jnp.int32), grid_x, tiles_per, chunk, tile,
    )  # [tiles_per, OUT_CH, pix] channel-planar

    # Gather slabs -> full tile array. all_gather is differentiable (its
    # transpose slices the cotangent back to this shard); the per-gaussian
    # gradient psum happens via the dup_feat gather-VJP + shard_map's
    # replicated-input rule.
    out = jax.lax.all_gather(local_out, axis_name)  # [S, tiles_per, C, pix]
    out = out.reshape(num_tiles, OUT_CH, tile * tile)
    hw = out.reshape(grid_y, grid_x, OUT_CH, tile, tile)
    hw = hw.transpose(0, 3, 1, 4, 2).reshape(height, width, OUT_CH)
    rgb = hw[..., 0:3]
    dep = hw[..., 3]
    t_final = hw[..., 4]
    image = rgb + t_final[..., None] * bg[None, None, :]
    alpha = 1.0 - t_final
    # Binning is replicated, so overflow is the same global value on
    # every shard — no collective needed.
    return image, dep, alpha, bins.overflow


def render_gaussians_tile_sharded(
    xyz, scale, quat, opacity, shs, view, full_proj, campos, tanfov,
    width: int, height: int, bg,
    sh_degree: int = 0,
    alive=None,
    mean2d_tap=None,
    axis_name: str = "tile",
    max_tiles: int = 12,
    chunk: int = 128,
    tile: int = 32,
) -> GaussianRender:
    """Full render with tiles sharded over ``axis_name`` (inside shard_map)."""
    proj = project_gaussians(
        xyz, scale, quat, opacity, shs, view, full_proj, campos, tanfov,
        width, height, sh_degree=sh_degree, alive=alive,
    )
    mean2d = proj.mean2d if mean2d_tap is None else proj.mean2d + mean2d_tap
    image, dep, alpha, overflow = rasterize_projected_tile_sharded(
        mean2d, proj.depth, proj.conic, proj.color, proj.opacity, proj.radius,
        width, height, bg, axis_name=axis_name,
        max_tiles=max_tiles, chunk=chunk, tile=tile,
    )
    return GaussianRender(
        image=jnp.clip(image, 0.0, 1.0), depth=dep, alpha=alpha,
        radii=proj.radius, overflow=overflow,
    )


def make_tile_sharded_render(mesh: Mesh, width: int, height: int,
                             sh_degree: int = 0, tile: int = 32,
                             max_tiles: int = 12, chunk: int = 128):
    """Jitted standalone tile-sharded render over a mesh with a 'tile'
    axis (activated params in, replicated render out)."""

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(),) * 9,
        out_specs=P(),
        check_vma=False,
    )
    def fn(xyz, scale, quat, opacity, shs, view, full_proj, campos, tanfov):
        out = render_gaussians_tile_sharded(
            xyz, scale, quat, opacity, shs, view, full_proj, campos, tanfov,
            width, height, jnp.ones(3), sh_degree=sh_degree,
            tile=tile, max_tiles=max_tiles, chunk=chunk,
        )
        return out.image

    return jax.jit(fn)
