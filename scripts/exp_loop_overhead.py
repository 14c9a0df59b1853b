"""What costs 1.9us/iteration in an (almost) empty Pallas fori_loop?

Variants of a do-nothing kernel with the real kernel's loop skeleton,
each stripping one suspect:
  empty      : fori_loop over [cs0, cs1), body returns carry
  smem       : + the 4 meta SMEM loads per iteration
  where      : + the 4 carry where(first, ...) vector selects
  when       : + the @pl.when(is_last) out write
  dynbound   : empty loop but with STATIC trip count (pl.when-guarded)
"""

import functools
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dreamgaussian_tpu.ops import binning as B
from dreamgaussian_tpu.ops.project import project_gaussians
from dreamgaussian_tpu.ops.rasterize_pallas import (
    FEAT_ROWS, OUT_CH, _blocks, _extend_starts, _chunk_tiles,
    _COMPILER_PARAMS,
)
from dreamgaussian_tpu.utils.camera import Camera, orbit_camera

_f32 = jnp.float32


def _kernel(cs_ref, ct_ref, off_ref, feat_hbm, out_ref, buf, sems, *,
            grid_x, chunk, tile, bt, mode):
    pix = tile * tile
    b = pl.program_id(0)
    tb0 = b * bt
    cs0 = cs_ref[tb0]
    cs1 = cs_ref[tb0 + bt]

    if mode == "noinit":
        out_ref[0, 0:1, 0:1] = jnp.zeros((1, 1), _f32)
    else:
        out_ref[...] = jnp.zeros((bt, pix, OUT_CH), _f32)

    if mode == "noloop":
        return

    def body(k, carry):
        t_naive, t_true, rgb_d, ncontrib = carry
        if mode in ("empty", "noinit"):
            return t_naive, t_true + 1e-30, rgb_d, ncontrib
        cur_t = ct_ref[k]
        first = k == cs_ref[cur_t]
        is_last = k == cs_ref[cur_t + 1] - 1
        if mode == "smem":
            return (t_naive,
                    t_true + (cur_t + first.astype(jnp.int32)
                              + is_last.astype(jnp.int32)).astype(_f32)
                    * 1e-30,
                    rgb_d, ncontrib)
        t_naive = jnp.where(first, 1.0, t_naive)
        t_true = jnp.where(first, 1.0, t_true)
        rgb_d = jnp.where(first, 0.0, rgb_d)
        ncontrib = jnp.where(first, 0.0, ncontrib)
        if mode == "where":
            return t_naive, t_true + 1e-30, rgb_d, ncontrib

        @pl.when(is_last)
        def _():
            out_ref[cur_t - tb0] = jnp.concatenate(
                [rgb_d, t_true, ncontrib,
                 jnp.zeros((pix, OUT_CH - 6), _f32)], axis=1)

        return t_naive, t_true + 1e-30, rgb_d, ncontrib

    init = (jnp.ones((pix, 1), _f32), jnp.ones((pix, 1), _f32),
            jnp.zeros((pix, 4), _f32), jnp.zeros((pix, 1), _f32))
    if mode == "dynbound":
        def body2(k, carry):
            a, b_, c, d = carry
            return a, b_ + 1e-30, c, d
        jax.lax.fori_loop(0, 20, body2, init)
    else:
        jax.lax.fori_loop(cs0, cs1, body, init)


@functools.partial(jax.jit, static_argnames=("grid_x", "num_tiles", "chunk",
                                             "tile", "bt", "mode"))
def run_kernel(dup_feat, chunk_starts, n_chunks, *, grid_x, num_tiles,
               chunk, tile, bt, mode):
    pix = tile * tile
    n_blocks, bt = _blocks(num_tiles, bt)
    cs_ext = _extend_starts(chunk_starts, n_chunks, num_tiles, n_blocks, bt)
    ct = _chunk_tiles(chunk_starts, n_chunks, dup_feat.shape[1], chunk)
    kernel = functools.partial(_kernel, grid_x=grid_x, chunk=chunk,
                               tile=tile, bt=bt, mode=mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((bt, pix, OUT_CH), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, FEAT_ROWS, chunk), _f32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    off = jnp.zeros((1,), jnp.int32)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * bt, pix, OUT_CH), _f32),
        compiler_params=_COMPILER_PARAMS,
    )(cs_ext, ct, off, dup_feat)


def main():
    n, size, tile, max_tiles, chunk = 8192, 512, 32, 12, 128
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(n, 3)) * 0.35, jnp.float32)
    scale = jnp.asarray(np.exp(rng.uniform(-4.5, -3.0, (n, 3))), jnp.float32)
    quat = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opacity = jnp.asarray(1 / (1 + np.exp(-rng.normal(size=n))), jnp.float32)
    shs = jnp.asarray(rng.normal(size=(n, 1, 3)) * 0.3, jnp.float32)
    fov = math.radians(49.1)
    cam = Camera.from_pose(orbit_camera(15.0, 30.0, 2.0), size, size, fov, fov)
    a = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    grid_x = size // tile
    num_tiles = grid_x * grid_x

    proj = jax.jit(lambda: project_gaussians(
        xyz, scale, quat, opacity, shs, a["view"], a["full_proj"],
        a["campos"], a["tanfov"], size, size, sh_degree=0))()
    log_op = jnp.log(jnp.maximum(proj.opacity, 1e-30))
    bins = jax.jit(lambda: B.bin_gaussians(
        proj.mean2d, proj.depth, proj.radius, size, size,
        max_tiles=max_tiles, chunk=chunk, tile=tile,
        conic=proj.conic, log_opacity=log_op))()
    dup_feat = jnp.zeros((FEAT_ROWS, bins.dup_map.shape[0]), _f32)
    jax.block_until_ready(bins)
    nch = int(np.sum(np.asarray(bins.n_chunks)))
    print(f"chunks={nch}", flush=True)

    ITERS = 50
    for mode, bt in (("noloop", 8), ("noinit", 8), ("empty", 4),
                     ("empty", 8), ("empty", 32), ("empty", 64)):
        def step(x, mode=mode, bt=bt):
            o = run_kernel(dup_feat + x * 1e-30, bins.chunk_starts,
                           bins.n_chunks, grid_x=grid_x, num_tiles=num_tiles,
                           chunk=chunk, tile=tile, bt=bt, mode=mode)
            return x + o[0, 0, 0] * 1e-30

        @jax.jit
        def run(x, step=step):
            return jax.lax.fori_loop(0, ITERS, lambda i, x: step(x), x)

        jax.block_until_ready(run(jnp.zeros(())))
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.zeros(())))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{mode:10s} bt={bt:2d}  {dt*1e3:7.3f} ms  "
              f"{dt/nch*1e6:6.2f} us/chunk", flush=True)


if __name__ == "__main__":
    main()
