"""Ablation timing of the composite forward kernel's stages (real TPU).

Variants (same grid/DMA structure, stages progressively removed) timed
as in-graph fori_loop chains; differences attribute the ~3.3us/chunk:
  dma      : DMA + trivial consume (sum of feat)
  alpha    : + _chunk_alpha (fmas + exp + skip rules)
  prefix   : + log1p + strict-upper matmul + exp (transmittance)
  full     : the real kernel math (color/depth matmul, ncontrib, carries)
Throwaway experiment; results recorded in PROGRESS notes / commit msg.
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
from dreamgaussian_tpu.ops.rasterize import build_feature_cols
from dreamgaussian_tpu.ops.rasterize_pallas import (
    FEAT_ROWS, OUT_CH, _chunk_alpha, _monomial_cols, _tile_center,
    _tri_masks, _dot, _dot_t, _blocks, _extend_starts, _chunk_tiles,
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
    strict_upper, _, _ = _tri_masks(chunk)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    ones_c = jnp.ones((chunk, 1), _f32)
    mono = _monomial_cols(tile)

    out_ref[...] = jnp.zeros((bt, pix, OUT_CH), _f32)

    def get_dma(slot, k):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(k * chunk, chunk)], buf.at[slot],
            sems.at[slot])

    if mode != "loop":
        @pl.when(cs1 > cs0)
        def _():
            get_dma(0, cs0).start()

    def body(k, carry):
        t_naive, t_true, rgb_d, ncontrib = carry
        slot = jax.lax.rem(k - cs0, 2)

        if mode != "loop":
            @pl.when(k + 1 < cs1)
            def _():
                get_dma(1 - slot, k + 1).start()

        cur_t = ct_ref[k]
        first = k == cs_ref[cur_t]
        is_last = k == cs_ref[cur_t + 1] - 1
        t_naive = jnp.where(first, 1.0, t_naive)
        t_true = jnp.where(first, 1.0, t_true)
        rgb_d = jnp.where(first, 0.0, rgb_d)
        ncontrib = jnp.where(first, 0.0, ncontrib)
        cx, cy = _tile_center(cur_t + off_ref[0], grid_x, tile)

        if mode == "loop":
            # no DMA at all: loop + scalar work only
            feat = buf[0]
            rgb_d = rgb_d + (
                jnp.full((1, 1), cur_t.astype(_f32)) * 1e-30)
            @pl.when(is_last)
            def _():
                out_ref[cur_t - tb0, 0:1, 0:1] = rgb_d[0:1, 0:1]
            return t_naive, t_true, rgb_d, ncontrib

        get_dma(slot, k).wait()
        feat = buf[slot]

        if mode == "dma":
            rgb_d = rgb_d + jnp.sum(feat[0:1, :], axis=1)[None, :] * 1e-30
        else:
            alpha, _, _ = _chunk_alpha(feat, mono, cx, cy)
            if mode == "alpha":
                rgb_d = rgb_d + jnp.sum(alpha, axis=1, keepdims=True) * 1e-30
            else:
                lg = jnp.log1p(-alpha)
                t_g = t_naive * jnp.exp(_dot(lg, strict_upper))
                if mode == "prefix":
                    rgb_d = rgb_d + jnp.sum(t_g, axis=1, keepdims=True) * 1e-30
                    t_naive = t_g[:, chunk - 1:chunk] * (
                        1.0 - alpha[:, chunk - 1:chunk])
                else:  # full
                    m = ((t_g * (1.0 - alpha) >= 1e-4)
                         & (alpha > 0.0)).astype(_f32)
                    w = alpha * t_g * m
                    cd = feat[6:10, :]
                    rgb_d = rgb_d + _dot_t(w, cd)
                    gpos = ((k - cs_ref[cur_t]) * chunk + lane + 1
                            ).astype(_f32)
                    ncontrib = jnp.maximum(
                        ncontrib,
                        jnp.max(jnp.where(w > 0.0, gpos, 0.0), axis=1,
                                keepdims=True))
                    t_naive = t_g[:, chunk - 1:chunk] * (
                        1.0 - alpha[:, chunk - 1:chunk])
                    t_true = t_true * jnp.exp(_dot(lg * m, ones_c))

        @pl.when(is_last)
        def _():
            out_ref[cur_t - tb0] = jnp.concatenate(
                [jnp.broadcast_to(rgb_d[:, 0:1] if rgb_d.ndim == 2 and
                                  rgb_d.shape[1] >= 1 else rgb_d, (pix, 4)),
                 t_true if t_true.shape == (pix, 1) else jnp.ones((pix, 1)),
                 ncontrib,
                 jnp.zeros((pix, OUT_CH - 6), _f32)], axis=1)

        return t_naive, t_true, rgb_d, ncontrib

    init = (jnp.ones((pix, 1), _f32), jnp.ones((pix, 1), _f32),
            jnp.zeros((pix, 4), _f32) if mode == "full"
            else jnp.zeros((pix, 1), _f32),
            jnp.zeros((pix, 1), _f32))
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
    feat = build_feature_cols(proj.mean2d, proj.depth, proj.conic,
                              proj.color, proj.opacity)
    dup_feat = _dup_gather(feat, bins.dup_map, bins.gather_map,
                           bins.big_src, bins.big_gather)
    jax.block_until_ready((dup_feat, bins))
    nch = int(np.sum(np.asarray(bins.n_chunks)))
    print(f"chunks={nch}")

    ITERS = 50
    for mode in ("loop", "dma", "alpha", "prefix", "full"):
        for bt in (8, 16):
            def step(x, mode=mode, bt=bt):
                out = run_kernel(dup_feat + x * 1e-30, bins.chunk_starts,
                                 bins.n_chunks, grid_x=grid_x,
                                 num_tiles=num_tiles, chunk=chunk, tile=tile,
                                 bt=bt, mode=mode)
                return x + out[0, 0, 0] * 1e-30

            @jax.jit
            def run(x, step=step):
                return jax.lax.fori_loop(0, ITERS, lambda i, x: step(x), x)

            out = run(jnp.zeros(())); jax.block_until_ready(out)
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.zeros(())))
            dt = (time.perf_counter() - t0) / ITERS
            print(f"{mode:8s} bt={bt:2d}  {dt*1e3:7.3f} ms   "
                  f"{dt/nch*1e6:6.2f} us/chunk", flush=True)


if __name__ == "__main__":
    main()
