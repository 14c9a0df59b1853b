"""Differentiable Gaussian-splat rendering: projection + binning + Pallas core.

The public entry point is :func:`render_gaussians`, the TPU-native
equivalent of the reference's ``Renderer.render``
(/root/reference/gs_renderer.py:717-822). Differences by design:

- the 2D-mean gradient tap for densification is an explicit ``mean2d_tap``
  input (grad via ``jax.grad``) instead of the reference's
  ``retain_grad()`` trickery on a dummy tensor;
- all shapes are static: dead gaussians are masked via ``alive`` and the
  duplicate lists are fixed-capacity (see binning.py).

The compositing core is wrapped in a ``custom_vjp`` whose backward runs
the hand-derived Pallas kernel; gradients flow from per-duplicate features
back to per-gaussian features through XLA's gather VJP (a segment-sum),
then through the jnp projection math by ordinary autodiff.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .binning import TILE, bin_gaussians
from .project import project_gaussians
from .rasterize_pallas import (
    FEAT_ROWS,
    OUT_CH,
    REAL_FEAT_ROWS,
    composite_backward,
    composite_forward,
)


class GaussianRender(NamedTuple):
    image: jnp.ndarray   # [H, W, 3] (bg-blended, clamped to [0,1])
    depth: jnp.ndarray   # [H, W]
    alpha: jnp.ndarray   # [H, W]
    radii: jnp.ndarray   # [N] int32 (0 => culled/invisible)
    overflow: jnp.ndarray  # [] int32 dropped binning duplicates (0 = exact)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _composite_cols(feat_cols, dup_map, gather_map, big_src, big_gather,
                    chunk_starts, n_chunks, tile_offset, grid_x,
                    num_tiles, chunk, tile):
    """Duplicate-gather + tile compositing with a hand-paired backward.

    The forward gathers per-gaussian feature COLUMNS into the aligned
    duplicate layout and runs the Pallas forward kernel. The backward
    runs the Pallas backward kernel — which emits per-duplicate
    gradients as gaussian-major ROWS [K, FEAT_ROWS] — and reduces them
    to per-gaussian gradients with a fast row-gather over the inverse
    maps from binning. Fusing the two stages into ONE custom_vjp lets
    the per-duplicate cotangent live in the row layout end-to-end: with
    separate vjps the [FEAT_ROWS, K] cotangent handoff invited XLA to
    insert a lane-padded transpose copy + 3x-slower column gather
    (measured +3 ms at 512^2/32k) depending on layout-assignment whims.
    XLA's native gather VJP (a sort-based scatter-add) is worse still.
    """
    dup_feat = jnp.take(feat_cols, dup_map, axis=1)
    return composite_forward(
        dup_feat, chunk_starts, n_chunks, tile_offset,
        grid_x=grid_x, num_tiles=num_tiles, chunk=chunk, tile=tile,
    )


def _composite_cols_fwd(feat_cols, dup_map, gather_map, big_src, big_gather,
                        chunk_starts, n_chunks, tile_offset, grid_x,
                        num_tiles, chunk, tile):
    dup_feat = jnp.take(feat_cols, dup_map, axis=1)
    out = composite_forward(
        dup_feat, chunk_starts, n_chunks, tile_offset,
        grid_x=grid_x, num_tiles=num_tiles, chunk=chunk, tile=tile,
    )
    return out, (feat_cols.shape, dup_feat, gather_map, big_src, big_gather,
                 chunk_starts, n_chunks, tile_offset, out)


def _composite_cols_bwd(grid_x, num_tiles, chunk, tile, residuals, g_out):
    (cols_shape, dup_feat, gather_map, big_src, big_gather,
     chunk_starts, n_chunks, tile_offset, out) = residuals
    d_feat = composite_backward(
        dup_feat, chunk_starts, n_chunks, out, g_out, tile_offset,
        grid_x=grid_x, num_tiles=num_tiles, chunk=chunk, tile=tile,
    )  # [FEAT_ROWS, K_aligned]
    # The kernel only writes slots belonging to the tiles it processed;
    # zero the rest (the aligned tail, and — under tile sharding — other
    # shards' tile ranges, whose slots map to REAL gaussians).
    k_aligned = d_feat.shape[1]
    n_ch = (k_aligned + chunk - 1) // chunk
    ch = jnp.arange(n_ch, dtype=jnp.int32)
    covered = jnp.any(
        (ch[:, None] >= chunk_starts[None, :])
        & (ch[:, None] < chunk_starts[None, :] + n_chunks[None, :]),
        axis=1,
    )
    # where(), not multiply: uninitialized slots can hold inf/nan and
    # 0 * inf = nan would leak through a multiplicative mask.
    d_feat = jnp.where(
        jnp.repeat(covered, chunk)[None, :k_aligned], d_feat, 0.0
    )

    rows, cols = cols_shape
    n, mt = gather_map.shape
    # Rows >= REAL_FEAT_ROWS are sublane padding (build_feature_cols):
    # their gradients are identically zero, so gather only the real rows
    # and pad back — a 37% cut of the hottest gather. One FLAT take of
    # all n*mt indices (a per-column formulation was measured strictly
    # worse: each take fusion costs ~0.2 ms nearly independent of index
    # count); a gaussian-major [K, FEAT_ROWS] row-gather variant was
    # worse still (16-wide rows lane-pad to 128 => 8x traffic).
    real = min(rows, REAL_FEAT_ROWS)
    g_r = d_feat[:real]
    per_dup = jnp.take(
        g_r, gather_map.reshape(-1), axis=1, mode="fill", fill_value=0.0
    ).reshape(real, n, mt)
    g_cols = jnp.sum(per_dup, axis=-1)            # [real, n]
    nb, bb = big_gather.shape
    per_big = jnp.take(
        g_r, big_gather.reshape(-1), axis=1, mode="fill", fill_value=0.0
    ).reshape(real, nb, bb)
    g_cols = g_cols.at[:, big_src].add(
        jnp.sum(per_big, axis=-1), unique_indices=True
    )
    g_cols = jnp.pad(g_cols, ((0, rows - real), (0, cols - n)))
    zero = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)  # noqa: E731
    zero_dup = np.zeros((k_aligned,), dtype=jax.dtypes.float0)
    zero_i = np.zeros(chunk_starts.shape, dtype=jax.dtypes.float0)
    zero_o = np.zeros((1,), dtype=jax.dtypes.float0)
    return (g_cols, zero_dup, zero(gather_map), zero(big_src),
            zero(big_gather), zero_i, zero_i, zero_o)


_composite_cols.defvjp(_composite_cols_fwd, _composite_cols_bwd)


def build_feature_cols(mean2d, depth, conic, color, opacity):
    """Raw per-gaussian feature rows [FEAT_ROWS, N+1] for the kernels.

    Layout (rasterize_pallas.py): mean2d, conic, LOG-opacity (the kernel
    evaluates power + log(op) as one MXU quadratic form and exponentiates
    once), colors, depth. Gradients chain back through this jnp math by
    autodiff. Column N is the inert sentinel targeted by unused duplicate
    slots (log_opacity = -1e10 => alpha exactly 0, no NaNs).
    """
    from .rasterize_pallas import Q_SENTINEL

    n = mean2d.shape[0]
    log_op = jnp.log(
        jnp.maximum(opacity.astype(jnp.float32), 1e-30)
    ).reshape(1, n)
    rows = jnp.concatenate(
        [
            mean2d.T.astype(jnp.float32),            # 0:2
            conic.T.astype(jnp.float32),             # 2:5
            log_op,                                  # 5
            color.T.astype(jnp.float32),             # 6:9
            depth.reshape(1, n).astype(jnp.float32),    # 9
        ],
        axis=0,
    )
    feat_cols = jnp.pad(rows, ((0, FEAT_ROWS - rows.shape[0]), (0, 1)))
    return feat_cols.at[5, n].set(Q_SENTINEL)


def rasterize_projected(
    mean2d: jnp.ndarray,
    depth: jnp.ndarray,
    conic: jnp.ndarray,
    color: jnp.ndarray,
    opacity: jnp.ndarray,
    radius: jnp.ndarray,
    width: int,
    height: int,
    bg: jnp.ndarray,
    max_tiles: int = 64,
    chunk: int = 128,
    tile: int = TILE,
):
    """Composite already-projected gaussians into an image.

    ``tile``: screen-tile edge in pixels. 16 reproduces the CUDA
    reference's tile-rect culling exactly; 32 is the TPU fast path
    (4x fewer duplicates and grid steps; the only semantic difference is
    the rect-cull granularity, bounded by the alpha<1/255 skip).

    Returns (image[H,W,3] without clamp, depth[H,W], alpha[H,W],
    overflow[] int32 — dropped binning duplicates; 0 means exact).
    """
    assert width % tile == 0 and height % tile == 0, (
        f"image size must be {tile}-aligned"
    )
    n = mean2d.shape[0]
    grid_x = width // tile
    grid_y = height // tile
    num_tiles = grid_x * grid_y

    bins = bin_gaussians(
        mean2d, depth, radius, width, height, max_tiles=max_tiles,
        chunk=chunk, tile=tile,
        conic=jax.lax.stop_gradient(conic),
        log_opacity=jnp.log(jnp.maximum(
            jax.lax.stop_gradient(opacity).astype(jnp.float32), 1e-30
        )),
    )

    feat_cols = build_feature_cols(mean2d, depth, conic, color, opacity)

    out = _composite_cols(
        feat_cols, bins.dup_map, bins.gather_map, bins.big_src,
        bins.big_gather, bins.chunk_starts, bins.n_chunks,
        jnp.zeros((1,), jnp.int32), grid_x, num_tiles, chunk, tile,
    )  # [T, OUT_CH, tile*tile] channel-planar (unpadded at the kernel
    #    boundary — an [.., 8]-minor layout would be lane-padded 16x)

    hw = out.reshape(grid_y, grid_x, OUT_CH, tile, tile)
    hw = hw.transpose(0, 3, 1, 4, 2).reshape(height, width, OUT_CH)
    rgb = hw[..., 0:3]
    dep = hw[..., 3]
    t_final = hw[..., 4]

    image = rgb + t_final[..., None] * bg[None, None, :]
    alpha = 1.0 - t_final
    return image, dep, alpha, bins.overflow


def render_gaussians(
    xyz: jnp.ndarray,
    scale: jnp.ndarray,
    quat: jnp.ndarray,
    opacity: jnp.ndarray,
    shs: jnp.ndarray,
    view: jnp.ndarray,
    full_proj: jnp.ndarray,
    campos: jnp.ndarray,
    tanfov: jnp.ndarray,
    width: int,
    height: int,
    bg: jnp.ndarray,
    sh_degree: int = 0,
    scale_modifier: float = 1.0,
    alive: jnp.ndarray | None = None,
    mean2d_tap: jnp.ndarray | None = None,
    max_tiles: int = 64,
    chunk: int = 128,
    tile: int = TILE,
) -> GaussianRender:
    """Render a gaussian cloud through one camera (activated parameters).

    ``mean2d_tap``: optional [N,2] zeros; its gradient is dL/d(pixel mean2d),
    used by the adaptive density controller. Scale by (W/2, H/2) to get the
    NDC-space magnitude the reference thresholds on
    (/root/reference/gs_renderer.py:625-627).
    """
    proj = project_gaussians(
        xyz, scale, quat, opacity, shs, view, full_proj, campos, tanfov,
        width, height, sh_degree=sh_degree, scale_modifier=scale_modifier,
        alive=alive,
    )
    mean2d = proj.mean2d if mean2d_tap is None else proj.mean2d + mean2d_tap
    image, dep, alpha, overflow = rasterize_projected(
        mean2d, proj.depth, proj.conic, proj.color, proj.opacity, proj.radius,
        width, height, bg, max_tiles=max_tiles, chunk=chunk, tile=tile,
    )
    return GaussianRender(
        image=jnp.clip(image, 0.0, 1.0),
        depth=dep,
        alpha=alpha,
        radii=proj.radius,
        overflow=overflow,
    )
