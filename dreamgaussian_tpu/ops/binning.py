"""Tile binning for the Gaussian rasterizer (pure jnp, shape-static).

Replaces the CUDA duplicate+radix-sort stage of
``diff-gaussian-rasterization``: each gaussian is duplicated into every
screen tile its radius rect touches, pairs are ordered by (tile, view
depth), and per-tile contiguous ranges are exposed to the Pallas
compositing kernel.

TPU-first design decisions:

- **Static shapes**: each gaussian owns ``max_tiles`` duplicate slots;
  unused slots get a sentinel tile id that sorts to the end. Gaussians
  touching more than ``max_tiles`` tiles are truncated (row-major rect
  order), and the dropped-duplicate total is reported as
  ``BinnedTiles.overflow`` so callers can detect truncation and escalate
  ``max_tiles`` (trainers do this automatically). The reference prunes
  gaussians with screen radius > 1px during densification
  (/root/reference/main.py:284), so oversized footprints are rare in
  practice — but never silent here.
- **Tile size is a parameter.** 16 matches the CUDA reference exactly
  (tile-rect culling is part of the compositing semantics); 32 is the TPU
  sweet spot — 4x fewer duplicates to sort, 4x fewer kernel grid steps,
  and the extra per-pair work is free on the VPU/MXU.
- **Depth pre-sort + single-key stable tile sort.** Sorting n gaussians
  by depth first (tiny sort) lets the big K-element sort use ONE int key
  (tile id) with ``is_stable=True`` — stability preserves the depth order
  within each tile. This is ~2x cheaper than the lexicographic
  (tile, depth) sort; TPU sorts are comparison-based and every extra key
  doubles the comparator cost.
- **Chunk-aligned layout**: every tile's duplicate list is padded to a
  multiple of ``chunk`` inside one flat array, so the kernel's per-chunk
  DMAs are lane-aligned and padding slots (which map to an all-zero
  feature column) are naturally inert in the compositing math.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 16  # default tile size (CUDA-parity); pass tile=32 for TPU speed


class BinnedTiles(NamedTuple):
    """Chunk-aligned per-tile gaussian lists.

    dup_map: [K_aligned] int32 gaussian index per slot (N = padding sentinel).
    chunk_starts: [T] int32 first chunk index of each tile.
    n_chunks: [T] int32 chunk count of each tile.
    num_dups: [] int32 total real (unpadded, unaligned) duplicates.
    gather_map: [N, max_tiles] int32 — the aligned-array slot of each
        element's m-th duplicate, in ORIGINAL element order; >= K_aligned
        for unused slots. This is the inverse of dup_map: it lets the
        backward pass reduce per-duplicate gradients to per-element
        gradients with pure GATHERS instead of XLA's sort-based
        scatter-add (which dominated the backward fusion time).
    overflow: [] int32 — total duplicates DROPPED by the per-element
        ``max_tiles`` slot cap (exact demand minus capacity, summed over
        elements). 0 means the binning was exact; >0 means some elements'
        tile lists were truncated row-major and the composite is
        approximate for those tiles. Trainers surface this and escalate
        ``max_tiles`` (the reference CUDA binning is unbounded, so its
        demand is always met).
    """

    dup_map: jnp.ndarray
    chunk_starts: jnp.ndarray
    n_chunks: jnp.ndarray
    num_dups: jnp.ndarray
    gather_map: jnp.ndarray
    overflow: jnp.ndarray


def tile_rect(mean2d: jnp.ndarray, radius: jnp.ndarray, width: int, height: int,
              tile: int = TILE):
    """Integer tile rect [min, max) per gaussian (matches CUDA getRect)."""
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile
    r = radius.astype(mean2d.dtype)
    xmin = jnp.clip(((mean2d[:, 0] - r) / tile).astype(jnp.int32), 0, grid_x)
    ymin = jnp.clip(((mean2d[:, 1] - r) / tile).astype(jnp.int32), 0, grid_y)
    xmax = jnp.clip(((mean2d[:, 0] + r + tile - 1) / tile).astype(jnp.int32), 0, grid_x)
    ymax = jnp.clip(((mean2d[:, 1] + r + tile - 1) / tile).astype(jnp.int32), 0, grid_y)
    return xmin, ymin, xmax, ymax


def aligned_capacity(n: int, max_tiles: int, num_tiles: int, chunk: int) -> int:
    """Static upper bound on the chunk-aligned duplicate array length."""
    return n * max_tiles + num_tiles * chunk


def bin_gaussians(
    mean2d: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    width: int,
    height: int,
    max_tiles: int = 64,
    chunk: int = 128,
    tile: int = TILE,
) -> BinnedTiles:
    """Bin projected gaussians into chunk-aligned per-tile depth-sorted lists."""
    n = mean2d.shape[0]
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile
    num_tiles = grid_x * grid_y
    max_tiles = min(max_tiles, num_tiles)
    k = n * max_tiles
    k_aligned = aligned_capacity(n, max_tiles, num_tiles, chunk)

    # --- Depth pre-sort (tiny: n elements). Invisible gaussians sort last
    # via +inf depth so truncated rects don't waste early slots.
    dkey = jnp.where(radius > 0, depth.astype(jnp.float32), jnp.inf)
    # Two keys: index tie-break makes equal-depth order deterministic and
    # identical to the CUDA stable radix sort's duplication order.
    _, order = jax.lax.sort(
        (dkey, jnp.arange(n, dtype=jnp.int32)), num_keys=2
    )
    mean2d_s = mean2d[order]
    radius_s = radius[order]

    xmin, ymin, xmax, ymax = tile_rect(mean2d_s, radius_s, width, height, tile)
    valid_g = radius_s > 0
    return bin_rects(
        xmin, ymin, xmax, ymax, order, valid_g, n,
        grid_x=grid_x, num_tiles=num_tiles, max_tiles=max_tiles, chunk=chunk,
    )


def bin_rects(
    xmin, ymin, xmax, ymax, order, valid_g, n: int,
    *, grid_x: int, num_tiles: int, max_tiles: int, chunk: int,
) -> BinnedTiles:
    """Shared rect->tile duplication + stable sort + aligned layout.

    Inputs are PRE-ORDERED (e.g. by depth): row i describes the element
    whose original index is ``order[i]``; stability of the tile sort
    preserves this order within each tile's list. Also used by the mesh
    rasterizer's triangle binning (order = face index).
    """
    k = n * max_tiles
    k_aligned = aligned_capacity(n, max_tiles, num_tiles, chunk)
    rect_w = xmax - xmin
    demand = jnp.where(valid_g, rect_w * (ymax - ymin), 0)
    count = jnp.minimum(demand, max_tiles)
    overflow = jnp.sum(demand - count).astype(jnp.int32)

    # Slot m of element i covers rect cell (m % w, m // w), row-major.
    m = jnp.arange(max_tiles, dtype=jnp.int32)[None, :]          # [1, M]
    safe_w = jnp.maximum(rect_w, 1)[:, None]
    dy = m // safe_w
    dx = m - dy * safe_w
    tile_id = (ymin[:, None] + dy) * grid_x + (xmin[:, None] + dx)  # [N, M]
    valid = m < count[:, None]
    tile_id = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)

    tile_flat = tile_id.reshape(k)
    idx_flat = jnp.broadcast_to(order[:, None], (n, max_tiles)).reshape(k)
    flat_ids = jnp.arange(k, dtype=jnp.int32)

    # Stable single-key sort: rows are already in the desired order,
    # stability preserves it within each tile bucket. flat_ids rides
    # along so the slot positions can be inverted for gather_map.
    sorted_tile, sorted_idx, sorted_fid = jax.lax.sort(
        (tile_flat, idx_flat, flat_ids), num_keys=1, is_stable=True
    )

    # Per-tile ranges in the sorted array.
    offsets = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)  # [T+1]
    counts = offsets[1:] - offsets[:-1]
    aligned_counts = ((counts + chunk - 1) // chunk) * chunk
    astart = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned_counts).astype(jnp.int32)]
    )  # [T+1]

    # Scatter sorted entries into the aligned layout (padding slots keep N).
    astart_lut = jnp.concatenate([astart[:-1], jnp.full((1,), k_aligned, jnp.int32)])
    offs_lut = jnp.concatenate([offsets[:-1], jnp.zeros((1,), jnp.int32)])
    pos = astart_lut[sorted_tile] + (
        jnp.arange(k, dtype=jnp.int32) - offs_lut[sorted_tile]
    )
    dup_map = jnp.full((k_aligned,), n, dtype=jnp.int32)
    dup_map = dup_map.at[pos].set(sorted_idx, mode="drop", unique_indices=True)

    # Inverse map: slot position of each pre-sort flat duplicate, then
    # un-permute rows from sorted-element order back to original order.
    gmap_flat = jnp.zeros((k,), jnp.int32).at[sorted_fid].set(
        jnp.minimum(pos, k_aligned), unique_indices=True
    )
    gather_sorted = gmap_flat.reshape(n, max_tiles)
    gather_map = jnp.zeros_like(gather_sorted).at[order].set(
        gather_sorted, unique_indices=True
    )

    return BinnedTiles(
        dup_map=dup_map,
        chunk_starts=astart[:-1] // chunk,
        n_chunks=aligned_counts // chunk,
        num_dups=offsets[-1],
        gather_map=gather_map,
        overflow=overflow,
    )
