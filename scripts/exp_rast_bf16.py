"""EXPERIMENT: does casting the kernels' matmul inputs to bf16 help?

Times composite fwd and fwd+bwd with f32 vs bf16 matmul inputs and
reports the max abs error of the bf16 forward vs the f32 forward.
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
    from dreamgaussian_tpu.ops import rasterize_pallas as RP
    from dreamgaussian_tpu.ops.project import project_gaussians
    from dreamgaussian_tpu.ops.rasterize import (
        build_feature_cols,
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

    proj = jax.jit(lambda: project_gaussians(
        xyz, scale, quat, opacity, shs, a["view"], a["full_proj"],
        a["campos"], a["tanfov"], size, size, sh_degree=0))()
    bins = jax.jit(lambda: B.bin_gaussians(
        proj.mean2d, proj.depth, proj.radius, size, size,
        max_tiles=max_tiles, chunk=chunk, tile=tile))()
    feat = jax.jit(lambda: build_feature_cols(
        proj.mean2d, proj.depth, proj.conic, proj.color, proj.opacity))()
    dup_feat = jax.jit(lambda: _dup_gather(
        feat, bins.dup_map, bins.gather_map, bins.big_src, bins.big_gather))()
    jax.block_until_ready(dup_feat)
    zo = jnp.zeros((1,), jnp.int32)

    def timeit(name, fn, *args, iters=50):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:34s} {dt * 1e3:8.3f} ms")
        return out

    def run_variant(tag):
        comp_fwd = jax.jit(lambda df: _composite(
            df, bins.chunk_starts, bins.n_chunks, zo, grid_x, num_tiles,
            chunk, tile))
        out = timeit(f"composite fwd [{tag}]", comp_fwd, dup_feat)

        def comp_loss(df):
            o = _composite(df, bins.chunk_starts, bins.n_chunks, zo,
                           grid_x, num_tiles, chunk, tile)
            return jnp.sum(o[..., :5] ** 2)

        timeit(f"composite fwd+bwd [{tag}]", jax.jit(jax.grad(comp_loss)),
               dup_feat)
        return np.asarray(out)

    orig_dot = RP._dot
    orig_dot_t = RP._dot_t
    orig_dot_p = RP._dot_p

    out_f32 = run_variant("f32")

    import functools as ft

    def cast16(f):
        @ft.wraps(f)
        def g(x, y):
            return f(x.astype(jnp.bfloat16), y.astype(jnp.bfloat16))
        return g

    RP._dot = cast16(orig_dot)
    RP._dot_t = cast16(orig_dot_t)
    RP._dot_p = cast16(orig_dot_p)
    jax.clear_caches()
    out_bf16 = run_variant("bf16")
    print("max abs err bf16 vs f32:", float(np.max(np.abs(out_bf16 - out_f32))))

    RP._dot, RP._dot_t, RP._dot_p = orig_dot, orig_dot_t, orig_dot_p


if __name__ == "__main__":
    main()
