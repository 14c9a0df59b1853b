"""Inverse grid-sample: scatter values into 2D/3D grids (texture baking).

jnp port of the reference's ``grid_put.py`` scatter family
(/root/reference/grid_put.py): nearest/bilinear/trilinear scatter-add
with counts, the mipmap variants that fill texels unseen at full
resolution from coarser levels, and the ``grid_put`` mode dispatcher.
The 2D bilinear path is used by the stage-1 texture bake
(/root/reference/main.py:494-506) and completed by a host-side KNN
inpaint for texels no view ever saw (/root/reference/main.py:517-535).

All scatters are ``.at[].add`` — XLA lowers them to efficient sorted
segment-sums on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_scatter(h: int, w: int, coords, values, weights=None):
    """Scatter values [N, C] at coords [N, 2] in [-1, 1] (xy order, align
    corners False-style mapping matching F.grid_sample semantics used by
    the reference) -> (accum [H, W, C], count [H, W]).

    ``weights`` [N] scales every tap of a point (0 = exact no-op): lets
    callers scatter a STATIC-shape point set with a mask instead of
    boolean-compressing to a dynamic shape (which would recompile per
    call — the texture bake hit one fresh compile per view this way).
    """
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
            if weights is not None:
                wgt = wgt * weights
            xi = jnp.clip(x0 + dx, 0, w - 1)
            yi = jnp.clip(y0 + dy, 0, h - 1)
            accum = accum.at[yi, xi].add(values * wgt[:, None])
            count = count.at[yi, xi].add(wgt)
    return accum, count


@functools.partial(jax.jit, static_argnames=("h", "w", "return_count"))
def linear_grid_put_2d(h: int, w: int, coords, values, return_count=False,
                       weights=None):
    """Bilinear scatter. With return_count: RAW (sum [H,W,C], count [H,W])
    — the reference's accumulate-across-views contract
    (/root/reference/grid_put.py:83-128). Otherwise the normalized mean."""
    accum, count = _bilinear_scatter(h, w, coords, values, weights)
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
    weights=None,
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
            cur_h, cur_w, coords, values, return_count=True, weights=weights
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


@functools.partial(jax.jit, static_argnames=("h", "w", "return_count"))
def nearest_grid_put_2d(h: int, w: int, coords, values, return_count=False):
    """Nearest-cell scatter (/root/reference/grid_put.py:57-81). Coord
    dim i -> grid dim i ((h, w) order), matching the reference; note our
    bilinear 2D functions take (x, y) order instead (their callers pass
    uv directly, where the reference's bake swaps to (v, u))."""
    yi = jnp.clip(
        jnp.round((coords[:, 0] * 0.5 + 0.5) * (h - 1)).astype(jnp.int32),
        0, h - 1,
    )
    xi = jnp.clip(
        jnp.round((coords[:, 1] * 0.5 + 0.5) * (w - 1)).astype(jnp.int32),
        0, w - 1,
    )
    accum = jnp.zeros((h, w, values.shape[-1]), values.dtype)
    count = jnp.zeros((h, w), values.dtype)
    accum = accum.at[yi, xi].add(values)
    count = count.at[yi, xi].add(1.0)
    if return_count:
        return accum, count
    return accum / jnp.maximum(count[..., None], 1e-10)


def _trilinear_scatter(h: int, w: int, d: int, coords, values):
    """Scatter values [N, C] at coords [N, 3] in [-1, 1] ((h, w, d) axis
    order, reference convention) -> (accum [H,W,D,C], count [H,W,D]).

    Corner handling matches /root/reference/grid_put.py:186-240: the base
    corner is clamped to dim-2 BEFORE the fractions are taken, so the +1
    corner never clamps and edge samples put full weight on the last cell.
    """
    c = values.shape[-1]
    fs = []
    base = []
    for axis, dim in enumerate((h, w, d)):
        pos = (coords[:, axis] * 0.5 + 0.5) * (dim - 1)
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, dim - 2)
        base.append(i0)
        fs.append(pos - i0.astype(values.dtype))
    accum = jnp.zeros((h, w, d, c), values.dtype)
    count = jnp.zeros((h, w, d), values.dtype)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                wgt = (
                    (fs[0] if dz else 1 - fs[0])
                    * (fs[1] if dy else 1 - fs[1])
                    * (fs[2] if dx else 1 - fs[2])
                )
                accum = accum.at[base[0] + dz, base[1] + dy, base[2] + dx].add(
                    values * wgt[:, None]
                )
                count = count.at[base[0] + dz, base[1] + dy, base[2] + dx].add(
                    wgt
                )
    return accum, count


@functools.partial(jax.jit, static_argnames=("h", "w", "d", "return_count"))
def linear_grid_put_3d(h: int, w: int, d: int, coords, values,
                       return_count=False):
    """Trilinear scatter (/root/reference/grid_put.py:186-240)."""
    accum, count = _trilinear_scatter(h, w, d, coords, values)
    if return_count:
        return accum, count
    return accum / jnp.maximum(count[..., None], 1e-10)


@functools.partial(jax.jit, static_argnames=("h", "w", "d", "return_count"))
def nearest_grid_put_3d(h: int, w: int, d: int, coords, values,
                        return_count=False):
    """Nearest-cell 3D scatter (/root/reference/grid_put.py:160-183)."""
    idx = []
    for axis, dim in enumerate((h, w, d)):
        idx.append(jnp.clip(
            jnp.round(
                (coords[:, axis] * 0.5 + 0.5) * (dim - 1)
            ).astype(jnp.int32),
            0, dim - 1,
        ))
    accum = jnp.zeros((h, w, d, values.shape[-1]), values.dtype)
    count = jnp.zeros((h, w, d), values.dtype)
    accum = accum.at[idx[0], idx[1], idx[2]].add(values)
    count = count.at[idx[0], idx[1], idx[2]].add(1.0)
    if return_count:
        return accum, count
    return accum / jnp.maximum(count[..., None], 1e-10)


def mipmap_linear_grid_put_3d(
    h: int,
    w: int,
    d: int,
    coords,
    values,
    min_resolution: int = 32,
    return_count: bool = False,
):
    """Trilinear scatter with coarse-to-fine hole filling
    (/root/reference/grid_put.py:242-273). Same no-host-sync design as the
    2D variant: every mip level runs; the hole mask keeps coarser levels
    out of texels already seen, so one jit covers the whole pyramid."""
    result = jnp.zeros((h, w, d, values.shape[-1]), values.dtype)
    count = jnp.zeros((h, w, d), values.dtype)
    cur = [h, w, d]
    while min(cur) > min_resolution:
        grid, cnt = linear_grid_put_3d(*cur, coords, values,
                                       return_count=True)
        if tuple(cur) != (h, w, d):
            grid = jax.image.resize(
                grid, (h, w, d, grid.shape[-1]), "trilinear"
            )
            cnt = jax.image.resize(cnt, (h, w, d), "trilinear")
        hole = count == 0
        result = jnp.where(hole[..., None], result + grid, result)
        count = jnp.where(hole, count + cnt, count)
        cur = [m // 2 for m in cur]
    if return_count:
        return result, count
    return result / jnp.maximum(count[..., None], 1e-10)


def grid_put(shape, coords, values, mode: str = "linear-mipmap",
             min_resolution: int = 32, return_raw: bool = False):
    """Mode dispatcher matching /root/reference/grid_put.py:276-299.

    shape: (H, W) or (H, W, D); coords [N, len(shape)] in [-1, 1] with
    coord dim i -> grid dim i (the reference's convention for ALL its
    grid functions; its bake call site swaps uv->(v,u) accordingly,
    /root/reference/main.py:496); values [N, C]. mode in
    {nearest, linear, linear-mipmap}. Our internal bilinear-2D functions
    take (x, y) order, so the 2D linear paths swap here.
    """
    dim = len(shape)
    if dim not in (2, 3):
        raise ValueError(f"only 2D/3D grids supported, got {dim}D")
    if mode == "nearest":
        fn = nearest_grid_put_2d if dim == 2 else nearest_grid_put_3d
        return fn(*shape, coords, values, return_count=return_raw)
    if mode == "linear":
        if dim == 2:
            return linear_grid_put_2d(*shape, coords[:, ::-1], values,
                                      return_count=return_raw)
        return linear_grid_put_3d(*shape, coords, values,
                                  return_count=return_raw)
    if mode == "linear-mipmap":
        if dim == 2:
            return mipmap_linear_grid_put_2d(
                *shape, coords[:, ::-1], values,
                min_resolution=min_resolution, return_count=return_raw,
            )
        return mipmap_linear_grid_put_3d(
            *shape, coords, values, min_resolution=min_resolution,
            return_count=return_raw,
        )
    raise ValueError(f"unknown grid_put mode {mode!r}")


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
