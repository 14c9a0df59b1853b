"""EXPERIMENT: sweep chunk size / bt for the composite kernels at 512^2/8k."""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



# --- r5 compat: the package merged _dup_gather + _composite into one
# custom_vjp (_composite_cols). These standalone stage harnesses keep the
# old split via forward-only equivalents (gradients through this shim use
# XLA's default gather VJP, fine for stage timing).
import jax.numpy as _jnp
from dreamgaussian_tpu.ops.rasterize_pallas import composite_forward as _cf


def _dup_gather(feat_cols, dup_map, gather_map, big_src, big_gather):
    return _jnp.take(feat_cols, dup_map, axis=1)


def _composite(dup_feat, cs, nc, off, grid_x, num_tiles, chunk, tile):
    return _cf(dup_feat, cs, nc, off, grid_x=grid_x, num_tiles=num_tiles,
               chunk=chunk, tile=tile)


def main():
    import jax
    import jax.numpy as jnp

    from dreamgaussian_tpu.ops import binning as B
    from dreamgaussian_tpu.ops.project import project_gaussians
    from dreamgaussian_tpu.ops.rasterize import (
        build_feature_cols,
    )
    from dreamgaussian_tpu.utils.camera import Camera, orbit_camera

    n = 8192
    size = 512
    tile = 32
    max_tiles = 12
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(n, 3)) * 0.35, jnp.float32)
    scale = jnp.asarray(np.exp(rng.uniform(-4.5, -3.0, size=(n, 3))), jnp.float32)
    quat = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opacity = jnp.asarray(1 / (1 + np.exp(-rng.normal(size=(n,)))), jnp.float32)
    shs = jnp.asarray(rng.normal(size=(n, 1, 3)) * 0.3, jnp.float32)
    fov = math.radians(49.1)
    cam = Camera.from_pose(orbit_camera(15.0, 30.0, 2.0), size, size, fov, fov)
    a = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    grid_x = size // tile
    num_tiles = grid_x * grid_x

    proj = jax.jit(lambda: project_gaussians(
        xyz, scale, quat, opacity, shs, a["view"], a["full_proj"],
        a["campos"], a["tanfov"], size, size, sh_degree=0))()
    feat = jax.jit(lambda: build_feature_cols(
        proj.mean2d, proj.depth, proj.conic, proj.color, proj.opacity))()
    jax.block_until_ready(feat)
    zo = jnp.zeros((1,), jnp.int32)

    def timeit(name, fn, *args, iters=50):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:40s} {dt * 1e3:8.3f} ms")
        return out

    for chunk in (128, 256):
        bins = jax.jit(lambda: B.bin_gaussians(
            proj.mean2d, proj.depth, proj.radius, size, size,
            max_tiles=max_tiles, chunk=chunk, tile=tile))()
        dup_feat = jax.jit(lambda: _dup_gather(
            feat, bins.dup_map, bins.gather_map, bins.big_src,
            bins.big_gather))()
        jax.block_until_ready(dup_feat)
        nch = int(np.sum(np.asarray(bins.n_chunks)))
        for bt in (8, 16):
            from dreamgaussian_tpu.ops.rasterize_pallas import (
                composite_forward,
            )
            comp_fwd = jax.jit(lambda df: composite_forward(
                df, bins.chunk_starts, bins.n_chunks, zo, grid_x=grid_x,
                num_tiles=num_tiles, chunk=chunk, tile=tile, bt=bt))
            timeit(f"fwd chunk={chunk} bt={bt} (chunks={nch})",
                   comp_fwd, dup_feat)

            def comp_loss(df, _c=chunk, _bt=bt, _bins=bins):
                from dreamgaussian_tpu.ops.rasterize_pallas import (
                    composite_backward, composite_forward,
                )
                o = composite_forward(
                    df, _bins.chunk_starts, _bins.n_chunks, zo,
                    grid_x=grid_x, num_tiles=num_tiles, chunk=_c, tile=tile,
                    bt=_bt)
                g = jnp.ones_like(o)
                return composite_backward(
                    df, _bins.chunk_starts, _bins.n_chunks, o, g, zo,
                    grid_x=grid_x, num_tiles=num_tiles, chunk=_c, tile=tile,
                    bt=_bt)

            timeit(f"fwd+bwd chunk={chunk} bt={bt}",
                   jax.jit(comp_loss), dup_feat)


if __name__ == "__main__":
    main()
