"""Tile binning for the Gaussian rasterizer (pure jnp, shape-static).

Replaces the CUDA duplicate+radix-sort stage of
``diff-gaussian-rasterization``: each gaussian is duplicated into every
16x16 screen tile its radius rect touches, pairs are sorted by
(tile, view depth), and per-tile contiguous ranges are exposed to the
Pallas compositing kernel.

TPU-first design decisions:

- **Static shapes**: each gaussian owns ``max_tiles`` duplicate slots;
  unused slots get a sentinel tile id that sorts to the end. Gaussians
  touching more than ``max_tiles`` tiles are truncated (row-major rect
  order). The reference prunes gaussians with screen radius > 1px during
  densification (/root/reference/main.py:284), so oversized footprints are
  rare in practice.
- **One `lax.sort`** over (tile, depth, index) — the TPU idiom for the
  CUDA radix sort over packed 64-bit keys.
- **Chunk-aligned layout**: every tile's duplicate list is padded to a
  multiple of ``chunk`` inside one flat array, so the kernel's per-chunk
  DMAs are lane-aligned and padding slots (which map to an all-zero
  feature column) are naturally inert in the compositing math.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 16


class BinnedTiles(NamedTuple):
    """Chunk-aligned per-tile gaussian lists.

    dup_map: [K_aligned] int32 gaussian index per slot (N = padding sentinel).
    chunk_starts: [T] int32 first chunk index of each tile.
    n_chunks: [T] int32 chunk count of each tile.
    num_dups: [] int32 total real (unpadded, unaligned) duplicates.
    """

    dup_map: jnp.ndarray
    chunk_starts: jnp.ndarray
    n_chunks: jnp.ndarray
    num_dups: jnp.ndarray


def tile_rect(mean2d: jnp.ndarray, radius: jnp.ndarray, width: int, height: int):
    """Integer tile rect [min, max) per gaussian (matches CUDA getRect)."""
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    r = radius.astype(mean2d.dtype)
    xmin = jnp.clip(((mean2d[:, 0] - r) / TILE).astype(jnp.int32), 0, grid_x)
    ymin = jnp.clip(((mean2d[:, 1] - r) / TILE).astype(jnp.int32), 0, grid_y)
    xmax = jnp.clip(((mean2d[:, 0] + r + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x)
    ymax = jnp.clip(((mean2d[:, 1] + r + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y)
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
) -> BinnedTiles:
    """Bin projected gaussians into chunk-aligned per-tile depth-sorted lists."""
    n = mean2d.shape[0]
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    num_tiles = grid_x * grid_y
    max_tiles = min(max_tiles, num_tiles)
    k = n * max_tiles
    k_aligned = aligned_capacity(n, max_tiles, num_tiles, chunk)

    xmin, ymin, xmax, ymax = tile_rect(mean2d, radius, width, height)
    rect_w = xmax - xmin
    count = jnp.where(radius > 0, rect_w * (ymax - ymin), 0)
    count = jnp.minimum(count, max_tiles)

    # Slot m of gaussian i covers rect cell (m % w, m // w), row-major.
    m = jnp.arange(max_tiles, dtype=jnp.int32)[None, :]          # [1, M]
    safe_w = jnp.maximum(rect_w, 1)[:, None]
    dy = m // safe_w
    dx = m - dy * safe_w
    tile = (ymin[:, None] + dy) * grid_x + (xmin[:, None] + dx)  # [N, M]
    valid = m < count[:, None]
    tile = jnp.where(valid, tile, num_tiles).astype(jnp.int32)

    tile_flat = tile.reshape(k)
    depth_flat = jnp.broadcast_to(depth[:, None], (n, max_tiles)).reshape(k)
    depth_flat = depth_flat.astype(jnp.float32)
    idx_flat = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, max_tiles)
    ).reshape(k)

    sorted_tile, _, sorted_idx = jax.lax.sort(
        (tile_flat, depth_flat, idx_flat), num_keys=2
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
    dup_map = dup_map.at[pos].set(sorted_idx, mode="drop")

    return BinnedTiles(
        dup_map=dup_map,
        chunk_starts=astart[:-1] // chunk,
        n_chunks=aligned_counts // chunk,
        num_dups=offsets[-1],
    )
