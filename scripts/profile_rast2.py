"""Rasterizer stage timing via in-graph lax.fori_loop chains at
512^2/8k/tile 32.

CAVEAT (measured later in round 4): on the axon platform a fori_loop
chain iteration itself costs ~0.5 ms, so the ABSOLUTE numbers here are
inflated per stage; DIFFERENCES between variants remain valid. For
per-op truth capture a jax.profiler trace and read device_duration_ps
(PROGRESS.md round-4 notes).

profile_binning.py showed a ~0.8 ms per-call dispatch floor through the
axon tunnel, which contaminated profile_rast.py's piecewise rows (a
[8192] top_k "cost" 1.1 ms). Here each stage runs ITERS times inside a
single jitted program with a data dependency between iterations, so the
reported number is pure device time.
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 50



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

    def chain(name, step, x0):
        """Time ITERS sequential applications of step inside one jit.

        step: x -> x-like (must consume its input so XLA can't hoist)."""
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, ITERS, lambda i, x: step(x), x)

        out = run(x0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = run(x0)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name:34s} {dt * 1e3:8.3f} ms", flush=True)
        return dt

    # dispatch floor reference
    @jax.jit
    def triv(x):
        return x + 1.0
    x = jnp.zeros(())
    triv(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(50):
        x = triv(x)
    x.block_until_ready()
    print(f"{'per-call dispatch floor':34s} {(time.perf_counter()-t0)/50*1e3:8.3f} ms")

    # --- project
    def project_step(x):
        p = project_gaussians(
            xyz + x * 1e-30, scale, quat, opacity, shs, a["view"],
            a["full_proj"], a["campos"], a["tanfov"], size, size, sh_degree=0)
        return x + p.mean2d[0, 0] * 1e-30
    chain("project fwd", project_step, jnp.zeros(()))

    proj = jax.jit(lambda: project_gaussians(
        xyz, scale, quat, opacity, shs, a["view"], a["full_proj"],
        a["campos"], a["tanfov"], size, size, sh_degree=0))()
    jax.block_until_ready(proj)
    log_op = jnp.log(jnp.maximum(proj.opacity, 1e-30))

    # --- binning (rect and cull)
    def bin_step_rect(x):
        b = B.bin_gaussians(proj.mean2d + x * 1e-30, proj.depth, proj.radius,
                            size, size, max_tiles=max_tiles, chunk=chunk,
                            tile=tile)
        return x + b.num_dups.astype(jnp.float32) * 1e-30
    chain("binning rect", bin_step_rect, jnp.zeros(()))

    def bin_step_cull(x):
        b = B.bin_gaussians(proj.mean2d + x * 1e-30, proj.depth, proj.radius,
                            size, size, max_tiles=max_tiles, chunk=chunk,
                            tile=tile, conic=proj.conic, log_opacity=log_op)
        return x + b.num_dups.astype(jnp.float32) * 1e-30
    chain("binning cull", bin_step_cull, jnp.zeros(()))

    bins = jax.jit(lambda: B.bin_gaussians(
        proj.mean2d, proj.depth, proj.radius, size, size,
        max_tiles=max_tiles, chunk=chunk, tile=tile,
        conic=proj.conic, log_opacity=log_op))()
    jax.block_until_ready(bins)
    print(f"  culled num_dups={int(bins.num_dups)} overflow={int(bins.overflow)}"
          f" chunks={int(np.sum(np.asarray(bins.n_chunks)))}")

    feat = jax.jit(lambda: build_feature_cols(
        proj.mean2d, proj.depth, proj.conic, proj.color, proj.opacity))()
    jax.block_until_ready(feat)

    # --- dup gather fwd
    def gather_step(x):
        df = _dup_gather(feat + x * 1e-30, bins.dup_map, bins.gather_map,
                         bins.big_src, bins.big_gather)
        return x + df[0, 0] * 1e-30
    chain("dup_gather fwd", gather_step, jnp.zeros(()))

    # --- dup gather fwd+bwd
    def gather_loss(f):
        df = _dup_gather(f, bins.dup_map, bins.gather_map, bins.big_src,
                         bins.big_gather)
        return jnp.sum(df[:10] ** 2)

    def gather_fb_step(x):
        g = jax.grad(gather_loss)(feat + x * 1e-30)
        return x + g[0, 0] * 1e-30
    chain("dup_gather fwd+bwd", gather_fb_step, jnp.zeros(()))

    dup_feat = jax.jit(lambda: _dup_gather(
        feat, bins.dup_map, bins.gather_map, bins.big_src, bins.big_gather))()
    jax.block_until_ready(dup_feat)
    zo = jnp.zeros((1,), jnp.int32)

    # --- composite fwd
    def comp_step(x):
        out = _composite(dup_feat + x * 1e-30, bins.chunk_starts,
                         bins.n_chunks, zo, grid_x, num_tiles, chunk, tile)
        return x + out[0, 0, 0] * 1e-30
    chain("composite fwd kernel", comp_step, jnp.zeros(()))

    # --- composite fwd+bwd
    def comp_loss(df):
        out = _composite(df, bins.chunk_starts, bins.n_chunks, zo,
                         grid_x, num_tiles, chunk, tile)
        return jnp.sum(out[..., :5] ** 2)

    def comp_fb_step(x):
        g = jax.grad(comp_loss)(dup_feat + x * 1e-30)
        return x + g[0, 0] * 1e-30
    chain("composite fwd+bwd kernels", comp_fb_step, jnp.zeros(()))

    # --- full forward
    def fwd_step(x):
        out = render_gaussians(
            xyz + x * 1e-30, scale, quat, opacity, shs, a["view"],
            a["full_proj"], a["campos"], a["tanfov"], size, size,
            jnp.ones(3), sh_degree=0, tile=tile, max_tiles=max_tiles)
        return x + out.image[0, 0, 0] * 1e-30
    chain("full forward", fwd_step, jnp.zeros(()))

    # --- full fwd+bwd (bench row)
    def loss(xyz_):
        out = render_gaussians(
            xyz_, scale, quat, opacity, shs, a["view"], a["full_proj"],
            a["campos"], a["tanfov"], size, size, jnp.ones(3),
            sh_degree=0, tile=tile, max_tiles=max_tiles)
        return jnp.sum(out.image ** 2) + jnp.sum(out.alpha)

    def full_step(x):
        g = jax.grad(loss)(xyz + x * 1e-30)
        return x + g[0, 0] * 1e-30
    dt = chain("full fwd+bwd (xyz grad)", full_step, jnp.zeros(()))

    def loss5(xyz_, scale_, quat_, opacity_, shs_):
        out = render_gaussians(
            xyz_, scale_, quat_, opacity_, shs_, a["view"], a["full_proj"],
            a["campos"], a["tanfov"], size, size, jnp.ones(3),
            sh_degree=0, tile=tile, max_tiles=max_tiles)
        return jnp.sum(out.image ** 2) + jnp.sum(out.alpha)

    def full5_step(x):
        g = jax.grad(loss5, argnums=(0, 1, 2, 3, 4))(
            xyz + x * 1e-30, scale, quat, opacity, shs)
        return x + g[0][0, 0] * 1e-30
    dt = chain("full fwd+bwd 5-param (bench)", full5_step, jnp.zeros(()))
    print(f"mpix/s: {size * size / dt / 1e6:.1f}")


if __name__ == "__main__":
    main()
