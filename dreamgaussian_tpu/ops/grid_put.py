"""Inverse grid-sample: scatter values into 2D grids (texture baking).

jnp port of the reference's ``grid_put.py`` scatter family
(/root/reference/grid_put.py): bilinear scatter-add with counts, and the
mipmap variant that fills texels unseen at full resolution from coarser
levels. Used by the stage-1 texture bake (/root/reference/main.py:494-506)
and completed by a host-side KNN inpaint for texels no view ever saw
(/root/reference/main.py:517-535).

All scatters are ``.at[].add`` — XLA lowers them to efficient sorted
segment-sums on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_scatter(h: int, w: int, coords, values):
    """Scatter values [N, C] at coords [N, 2] in [-1, 1] (xy order, align
    corners False-style mapping matching F.grid_sample semantics used by
    the reference) -> (accum [H, W, C], count [H, W])."""
    c = values.shape[-1]
    # The reference indexes grid[y, x] with coords given as (x, y) in
    # [-1, 1]: x -> W axis, y -> H axis.
    x = (coords[:, 0] * 0.5 + 0.5) * (w - 1)
    y = (coords[:, 1] * 0.5 + 0.5) * (h - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0

    accum = jnp.zeros((h, w, c), values.dtype)
    count = jnp.zeros((h, w), values.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
            xi = jnp.clip(x0 + dx, 0, w - 1)
            yi = jnp.clip(y0 + dy, 0, h - 1)
            accum = accum.at[yi, xi].add(values * wgt[:, None])
            count = count.at[yi, xi].add(wgt)
    return accum, count


@functools.partial(jax.jit, static_argnames=("h", "w", "return_count"))
def linear_grid_put_2d(h: int, w: int, coords, values, return_count=False):
    """Bilinear scatter. With return_count: RAW (sum [H,W,C], count [H,W])
    — the reference's accumulate-across-views contract
    (/root/reference/grid_put.py:83-128). Otherwise the normalized mean."""
    accum, count = _bilinear_scatter(h, w, coords, values)
    if return_count:
        return accum, count
    return accum / jnp.maximum(count[..., None], 1e-10)


def mipmap_linear_grid_put_2d(
    h: int,
    w: int,
    coords,
    values,
    min_resolution: int = 128,
    return_count: bool = False,
):
    """Bilinear scatter with coarse-to-fine hole filling
    (/root/reference/grid_put.py:129-159): texels unseen at full res
    accumulate the (upsampled) raw sums of the first coarser mip that saw
    them. With return_count: raw (sum, count); else the normalized mean."""
    result = jnp.zeros((h, w, values.shape[-1]), values.dtype)
    count = jnp.zeros((h, w), values.dtype)

    # All mip levels run unconditionally: the hole mask makes coarser
    # levels no-ops for texels already seen, so results match the
    # reference's early-exit loop WITHOUT a host sync per level (a device
    # round-trip per mip was measurable on tunneled TPUs). The level
    # count is static => the whole bake stays inside one jit.
    cur_h, cur_w = h, w
    while min(cur_h, cur_w) > min_resolution:
        grid, cnt = linear_grid_put_2d(
            cur_h, cur_w, coords, values, return_count=True
        )
        if (cur_h, cur_w) != (h, w):
            grid = jax.image.resize(grid, (h, w, grid.shape[-1]), "bilinear")
            cnt = jax.image.resize(cnt, (h, w), "bilinear")
        hole = count == 0
        result = jnp.where(hole[..., None], result + grid, result)
        count = jnp.where(hole, count + cnt, count)
        cur_h //= 2
        cur_w //= 2
    if return_count:
        return result, count
    return result / jnp.maximum(count[..., None], 1e-10)


def knn_inpaint(grid: np.ndarray, mask: np.ndarray, k: int = 1) -> np.ndarray:
    """Fill texels where ``mask`` is False from the nearest True texel
    (host-side; reference uses sklearn kd_tree,
    /root/reference/main.py:517-535)."""
    from scipy.spatial import cKDTree

    grid = np.asarray(grid)
    mask = np.asarray(mask).astype(bool)
    if mask.all() or not mask.any():
        return grid
    seen = np.argwhere(mask)
    unseen = np.argwhere(~mask)
    tree = cKDTree(seen)
    _, idx = tree.query(unseen, k=k)
    if k == 1:
        src = seen[idx]
        out = grid.copy()
        out[unseen[:, 0], unseen[:, 1]] = grid[src[:, 0], src[:, 1]]
    else:
        src = seen[idx]  # [U, k, 2]
        vals = grid[src[..., 0], src[..., 1]]  # [U, k, C]
        out = grid.copy()
        out[unseen[:, 0], unseen[:, 1]] = vals.mean(axis=1)
    return out
