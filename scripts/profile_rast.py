"""Component-level timing of the 512^2/8k rasterizer fwd+bwd (bench row).

DEPRECATED for attribution: per-call timing through the axon tunnel
carries ~0.5-0.8 ms per dispatch, which dwarfs sub-ms ops (a [8192]
top_k "measures" 1.1 ms). Use a jax.profiler trace and read
device_duration_ps per op instead (see PROGRESS.md round-4 notes and
scripts/profile_rast2.py's caveats); keep this only for quick A/B
deltas of the large pieces.

Times, each as its own jitted steady-state loop on the real device:
  - project only
  - binning only
  - dup gather fwd only (gather from prebuilt bins)
  - composite forward kernel only (fixed binned inputs)
  - composite fwd+bwd kernel only (fixed binned inputs)
  - dup gather fwd+bwd (autodiff through the gather)
  - full forward render
  - full fwd+bwd (the bench row)

This decomposes the 8 ms/iter BENCH_r02 number so the speed-of-light
push (VERDICT r2 next#3) attacks the real hot spot.
"""

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
        build_feature_cols, render_gaussians,
    )
    from dreamgaussian_tpu.utils.camera import Camera, orbit_camera

    n = 8192
    size = 512
    tile = 32
    max_tiles = 12
    chunk = 128
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

    def timeit(name, fn, *args, iters=30):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:28s} {dt * 1e3:8.3f} ms")
        return out, dt

    proj_fn = jax.jit(lambda: project_gaussians(
        xyz, scale, quat, opacity, shs, a["view"], a["full_proj"],
        a["campos"], a["tanfov"], size, size, sh_degree=0))
    proj, _ = timeit("project", proj_fn)

    bin_fn = jax.jit(lambda: B.bin_gaussians(
        proj.mean2d, proj.depth, proj.radius, size, size,
        max_tiles=max_tiles, chunk=chunk, tile=tile))
    bins, _ = timeit("binning", bin_fn)
    print(f"  num_dups={int(bins.num_dups)} overflow={int(bins.overflow)} "
          f"k_aligned={bins.dup_map.shape[0]} "
          f"chunks={int(np.sum(np.asarray(bins.n_chunks)))}")

    feat = jax.jit(lambda: build_feature_cols(
        proj.mean2d, proj.depth, proj.conic, proj.color, proj.opacity))()
    jax.block_until_ready(feat)

    gather_fn = jax.jit(lambda: _dup_gather(
        feat, bins.dup_map, bins.gather_map, bins.big_src, bins.big_gather))
    dup_feat, _ = timeit("dup_gather fwd", gather_fn)

    zo = jnp.zeros((1,), jnp.int32)
    comp_fwd = jax.jit(lambda df: _composite(
        df, bins.chunk_starts, bins.n_chunks, zo, grid_x, num_tiles,
        chunk, tile))
    timeit("composite fwd kernel", comp_fwd, dup_feat)

    def comp_loss(df):
        out = _composite(df, bins.chunk_starts, bins.n_chunks, zo,
                         grid_x, num_tiles, chunk, tile)
        return jnp.sum(out[..., :5] ** 2)

    comp_grad = jax.jit(jax.grad(comp_loss))
    timeit("composite fwd+bwd kernels", comp_grad, dup_feat)

    def gather_loss(f):
        df = _dup_gather(f, bins.dup_map, bins.gather_map, bins.big_src,
                         bins.big_gather)
        return jnp.sum(df[:10] ** 2)

    timeit("dup_gather fwd+bwd", jax.jit(jax.grad(gather_loss)), feat)

    fwd_full = jax.jit(lambda: render_gaussians(
        xyz, scale, quat, opacity, shs, a["view"], a["full_proj"],
        a["campos"], a["tanfov"], size, size, jnp.ones(3), sh_degree=0,
        tile=tile, max_tiles=max_tiles).image)
    timeit("full forward", fwd_full)

    def loss(xyz_, scale_, quat_, opacity_, shs_):
        out = render_gaussians(
            xyz_, scale_, quat_, opacity_, shs_, a["view"], a["full_proj"],
            a["campos"], a["tanfov"], size, size, jnp.ones(3),
            sh_degree=0, tile=tile, max_tiles=max_tiles)
        return jnp.sum(out.image ** 2) + jnp.sum(out.alpha)

    full_grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    _, dt = timeit("full fwd+bwd (bench row)", full_grad,
                   xyz, scale, quat, opacity, shs)
    print(f"mpix/s: {size * size / dt / 1e6:.1f}")


if __name__ == "__main__":
    main()
