"""grid_put scatter family vs independent numpy oracles.

Covers the full reference API surface (/root/reference/grid_put.py):
nearest/linear 2D+3D, the mipmap hole-filling variants, and the
``grid_put`` mode dispatcher with its (h, w[, d]) coordinate contract.
"""

import numpy as np
import jax.numpy as jnp

from dreamgaussian_tpu.ops.grid_put import (
    grid_put,
    linear_grid_put_2d,
    linear_grid_put_3d,
    mipmap_linear_grid_put_2d,
    mipmap_linear_grid_put_3d,
    nearest_grid_put_2d,
    nearest_grid_put_3d,
)


def _np_nearest(shape, coords, values):
    """Oracle: round to nearest cell per axis, mean of values per cell."""
    dims = len(shape)
    idx = [
        np.clip(
            np.round((coords[:, a] * 0.5 + 0.5) * (shape[a] - 1)), 0,
            shape[a] - 1,
        ).astype(int)
        for a in range(dims)
    ]
    accum = np.zeros(tuple(shape) + (values.shape[-1],), np.float64)
    count = np.zeros(tuple(shape), np.float64)
    for n in range(coords.shape[0]):
        cell = tuple(i[n] for i in idx)
        accum[cell] += values[n]
        count[cell] += 1.0
    return accum, count


def _np_multilinear(shape, coords, values):
    """Oracle: multilinear scatter with base corner clamped to dim-2."""
    dims = len(shape)
    pos = [(coords[:, a] * 0.5 + 0.5) * (shape[a] - 1) for a in range(dims)]
    base = [np.clip(np.floor(p).astype(int), 0, s - 2)
            for p, s in zip(pos, shape)]
    frac = [p - b for p, b in zip(pos, base)]
    accum = np.zeros(tuple(shape) + (values.shape[-1],), np.float64)
    count = np.zeros(tuple(shape), np.float64)
    for corner in range(2 ** dims):
        offs = [(corner >> a) & 1 for a in range(dims)]
        w = np.ones(coords.shape[0])
        for a in range(dims):
            w = w * (frac[a] if offs[a] else 1 - frac[a])
        for n in range(coords.shape[0]):
            cell = tuple(base[a][n] + offs[a] for a in range(dims))
            accum[cell] += values[n] * w[n]
            count[cell] += w[n]
    return accum, count


def _rand(n, dims, c, seed):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(-1, 1, size=(n, dims)).astype(np.float32)
    values = rng.normal(size=(n, c)).astype(np.float32)
    return coords, values


class TestNearest:
    def test_2d_matches_oracle(self):
        coords, values = _rand(200, 2, 3, 0)
        acc, cnt = nearest_grid_put_2d(16, 12, coords, values,
                                       return_count=True)
        oa, oc = _np_nearest((16, 12), coords, values)
        np.testing.assert_allclose(np.asarray(acc), oa, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cnt), oc, atol=1e-5)

    def test_3d_matches_oracle(self):
        coords, values = _rand(150, 3, 2, 1)
        acc, cnt = nearest_grid_put_3d(8, 10, 6, coords, values,
                                       return_count=True)
        oa, oc = _np_nearest((8, 10, 6), coords, values)
        np.testing.assert_allclose(np.asarray(acc), oa, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cnt), oc, atol=1e-5)

    def test_normalized_mean(self):
        coords = np.zeros((4, 2), np.float32)  # all at the center cell
        values = np.asarray([[1.0], [2.0], [3.0], [6.0]], np.float32)
        out = nearest_grid_put_2d(5, 5, coords, values)
        assert abs(float(out[2, 2, 0]) - 3.0) < 1e-5
        assert float(jnp.abs(out).sum()) == float(jnp.abs(out[2, 2]).sum())


class TestLinear3D:
    def test_matches_oracle(self):
        coords, values = _rand(120, 3, 3, 2)
        acc, cnt = linear_grid_put_3d(7, 9, 8, coords, values,
                                      return_count=True)
        oa, oc = _np_multilinear((7, 9, 8), coords, values)
        np.testing.assert_allclose(np.asarray(acc), oa, atol=1e-4)
        np.testing.assert_allclose(np.asarray(cnt), oc, atol=1e-4)

    def test_weights_sum_to_one(self):
        coords, values = _rand(60, 3, 1, 3)
        _, cnt = linear_grid_put_3d(6, 6, 6, coords, np.ones_like(values),
                                    return_count=True)
        assert abs(float(jnp.sum(cnt)) - 60.0) < 1e-3

    def test_edge_sample_full_weight_on_last_cell(self):
        coords = np.asarray([[1.0, 1.0, 1.0]], np.float32)
        acc, cnt = linear_grid_put_3d(4, 4, 4, coords,
                                      np.ones((1, 1), np.float32),
                                      return_count=True)
        assert abs(float(cnt[3, 3, 3]) - 1.0) < 1e-6


class TestMipmap3D:
    def test_holes_filled_from_coarser(self):
        # One sample: most of the 32^3 grid is a hole at full res but the
        # coarser mips (trilinear-upsampled) spread coverage.
        coords = np.asarray([[0.1, -0.2, 0.05]], np.float32)
        values = np.asarray([[2.0]], np.float32)
        dense = mipmap_linear_grid_put_3d(32, 32, 32, coords, values,
                                          min_resolution=2)
        sparse = linear_grid_put_3d(32, 32, 32, coords, values)
        n_dense = int(jnp.sum(jnp.abs(dense[..., 0]) > 1e-8))
        n_sparse = int(jnp.sum(jnp.abs(sparse[..., 0]) > 1e-8))
        assert n_dense > n_sparse

    def test_full_res_values_preserved(self):
        coords, values = _rand(400, 3, 1, 4)
        mip = mipmap_linear_grid_put_3d(8, 8, 8, coords, values,
                                        min_resolution=2)
        lin = linear_grid_put_3d(8, 8, 8, coords, values,
                                 return_count=True)
        acc, cnt = lin
        seen = np.asarray(cnt) > 0
        np.testing.assert_allclose(
            np.asarray(mip)[seen],
            (np.asarray(acc) / np.maximum(np.asarray(cnt)[..., None],
                                          1e-10))[seen],
            atol=1e-5,
        )


class TestDispatcher:
    def test_2d_linear_swaps_to_reference_axis_order(self):
        # grid_put takes (h, w)-ordered coords (the reference contract);
        # our bilinear primitive takes (x, y).
        coords, values = _rand(100, 2, 2, 5)
        via_dispatch = grid_put((10, 14), coords, values, mode="linear")
        direct = linear_grid_put_2d(10, 14, coords[:, ::-1], values)
        np.testing.assert_allclose(np.asarray(via_dispatch),
                                   np.asarray(direct), atol=1e-6)

    def test_modes_and_dims(self):
        c2, v2 = _rand(50, 2, 3, 6)
        c3, v3 = _rand(50, 3, 3, 7)
        assert grid_put((8, 8), c2, v2, mode="nearest").shape == (8, 8, 3)
        assert grid_put((8, 8), c2, v2, mode="linear").shape == (8, 8, 3)
        assert grid_put((8, 8, 8), c3, v3, mode="nearest").shape == (8, 8, 8, 3)
        assert grid_put((8, 8, 8), c3, v3, mode="linear").shape == (8, 8, 8, 3)
        out = grid_put((16, 16, 16), c3, v3, mode="linear-mipmap",
                       min_resolution=4)
        assert out.shape == (16, 16, 16, 3)

    def test_return_raw(self):
        c2, v2 = _rand(30, 2, 1, 8)
        acc, cnt = grid_put((8, 8), c2, v2, mode="linear", return_raw=True)
        assert acc.shape == (8, 8, 1) and cnt.shape == (8, 8)

    def test_rejects_bad_args(self):
        import pytest
        c2, v2 = _rand(10, 2, 1, 9)
        with pytest.raises(ValueError):
            grid_put((8,), c2[:, :1], v2)
        with pytest.raises(ValueError):
            grid_put((8, 8), c2, v2, mode="cubic")
