"""Superchunked forward-kernel prototype: 1 fori_loop iteration = SUP
chunks (one DMA, inner loop unrolled, per-chunk scalars precomputed).

exp_kernel_ablate.py showed the per-iteration loop overhead alone is
~1.9 us/chunk (more than the actual math). This measures how much of it
superchunking recovers, and checks bit-parity vs composite_forward.
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
    FEAT_ROWS, OUT_CH, TERM_EPS, _chunk_alpha, _monomial_cols, _tile_center,
    _tri_masks, _dot, _dot_t, _blocks, _extend_starts, _chunk_tiles,
    _COMPILER_PARAMS, composite_forward,
)
from dreamgaussian_tpu.utils.camera import Camera, orbit_camera

_f32 = jnp.float32


def _sup_fwd_kernel(cs_ref, meta_ref, off_ref, feat_hbm, out_ref, buf, sems,
                    *, grid_x, chunk, tile, bt, sup):
    """meta_ref: [cap_chunks, 4] i32 (tile_id, first, last, gpos_base)."""
    pix = tile * tile
    b = pl.program_id(0)
    tb0 = b * bt
    cs0 = cs_ref[tb0]
    cs1 = cs_ref[tb0 + bt]
    nsup = (cs1 - cs0 + sup - 1) // sup
    strict_upper, _, _ = _tri_masks(chunk)
    ones_c = jnp.ones((chunk, 1), _f32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    mono = _monomial_cols(tile)

    out_ref[...] = jnp.concatenate(
        [jnp.zeros((bt, pix, 4), _f32), jnp.ones((bt, pix, 1), _f32),
         jnp.zeros((bt, pix, OUT_CH - 5), _f32)], axis=2)

    def get_dma(slot, j):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds((cs0 + j * sup) * chunk, sup * chunk)],
            buf.at[slot], sems.at[slot])

    @pl.when(nsup > 0)
    def _():
        get_dma(0, 0).start()

    def body(j, carry):
        t_naive, t_true, rgb_d, ncontrib = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nsup)
        def _():
            get_dma(1 - slot, j + 1).start()

        get_dma(slot, j).wait()

        for s in range(sup):
            k = cs0 + j * sup + s
            valid = k < cs1
            cur_t = meta_ref[k, 0]
            first = (meta_ref[k, 1] == 1) & valid
            is_last = (meta_ref[k, 2] == 1) & valid
            gbase = meta_ref[k, 3]

            t_naive = jnp.where(first, 1.0, t_naive)
            t_true = jnp.where(first, 1.0, t_true)
            rgb_d = jnp.where(first, 0.0, rgb_d)
            ncontrib = jnp.where(first, 0.0, ncontrib)

            cx, cy = _tile_center(cur_t + off_ref[0], grid_x, tile)
            feat = buf[slot, :, s * chunk:(s + 1) * chunk]

            alpha, _, _ = _chunk_alpha(feat, mono, cx, cy)
            lg = jnp.log1p(-alpha)
            t_g = t_naive * jnp.exp(_dot(lg, strict_upper))
            m = ((t_g * (1.0 - alpha) >= TERM_EPS)
                 & (alpha > 0.0)).astype(_f32)
            w = alpha * t_g * m
            cd = feat[6:10, :]
            new_rgb = rgb_d + _dot_t(w, cd)
            gpos = (gbase * chunk + lane + 1).astype(_f32)
            new_nc = jnp.maximum(
                ncontrib,
                jnp.max(jnp.where(w > 0.0, gpos, 0.0), axis=1,
                        keepdims=True))
            new_tn = t_g[:, chunk - 1:chunk] * (1.0 - alpha[:, chunk - 1:chunk])
            new_tt = t_true * jnp.exp(_dot(lg * m, ones_c))

            vf = jnp.where(valid, 1.0, 0.0)
            rgb_d = jnp.where(valid, new_rgb, rgb_d)
            ncontrib = jnp.where(valid, new_nc, ncontrib)
            t_naive = jnp.where(valid, new_tn, t_naive)
            t_true = jnp.where(valid, new_tt, t_true)
            del vf

            @pl.when(is_last)
            def _(rgb_d=rgb_d, t_true=t_true, ncontrib=ncontrib,
                  cur_t=cur_t):
                out_ref[cur_t - tb0] = jnp.concatenate(
                    [rgb_d, t_true, ncontrib,
                     jnp.zeros((pix, OUT_CH - 6), _f32)], axis=1)

        return t_naive, t_true, rgb_d, ncontrib

    init = (jnp.ones((pix, 1), _f32), jnp.ones((pix, 1), _f32),
            jnp.zeros((pix, 4), _f32), jnp.zeros((pix, 1), _f32))
    jax.lax.fori_loop(0, nsup, body, init)


def _chunk_meta(chunk_starts, n_chunks, k_aligned, chunk):
    cap = k_aligned // chunk
    ends = chunk_starts + n_chunks
    c = jnp.arange(cap, dtype=jnp.int32)
    ct = jnp.searchsorted(ends, c, side="right").astype(jnp.int32)
    ct_c = jnp.minimum(ct, chunk_starts.shape[0] - 1)
    st = chunk_starts[ct_c]
    en = ends[ct_c]
    first = (c == st).astype(jnp.int32)
    last = (c == en - 1).astype(jnp.int32)
    gbase = c - st
    return jnp.stack([ct, first, last, gbase], axis=1)


@functools.partial(jax.jit, static_argnames=("grid_x", "num_tiles", "chunk",
                                             "tile", "bt", "sup"))
def sup_forward(dup_feat, chunk_starts, n_chunks, *, grid_x, num_tiles,
                chunk, tile, bt, sup):
    pix = tile * tile
    n_blocks, bt = _blocks(num_tiles, bt)
    cs_ext = _extend_starts(chunk_starts, n_chunks, num_tiles, n_blocks, bt)
    # slack so the last superchunk's DMA stays in bounds
    dup_feat = jnp.pad(dup_feat, ((0, 0), (0, (sup - 1) * chunk)))
    meta = _chunk_meta(chunk_starts, n_chunks, dup_feat.shape[1], chunk)
    kernel = functools.partial(_sup_fwd_kernel, grid_x=grid_x, chunk=chunk,
                               tile=tile, bt=bt, sup=sup)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((bt, pix, OUT_CH), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, FEAT_ROWS, sup * chunk), _f32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    off = jnp.zeros((1,), jnp.int32)
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * bt, pix, OUT_CH), _f32),
        compiler_params=_COMPILER_PARAMS,
    )(cs_ext, meta, off, dup_feat)
    return out[:num_tiles]



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
    print(f"chunks={nch}", flush=True)

    ref = composite_forward(dup_feat, bins.chunk_starts, bins.n_chunks,
                            grid_x=grid_x, num_tiles=num_tiles, chunk=chunk,
                            tile=tile)
    jax.block_until_ready(ref)

    ITERS = 50
    for sup in (2, 4, 8):
        for bt in (8, 16):
            out = sup_forward(dup_feat, bins.chunk_starts, bins.n_chunks,
                              grid_x=grid_x, num_tiles=num_tiles, chunk=chunk,
                              tile=tile, bt=bt, sup=sup)
            err = float(jnp.max(jnp.abs(out - ref)))

            def step(x, sup=sup, bt=bt):
                o = sup_forward(dup_feat + x * 1e-30, bins.chunk_starts,
                                bins.n_chunks, grid_x=grid_x,
                                num_tiles=num_tiles, chunk=chunk, tile=tile,
                                bt=bt, sup=sup)
                return x + o[0, 0, 0] * 1e-30

            @jax.jit
            def run(x, step=step):
                return jax.lax.fori_loop(0, ITERS, lambda i, x: step(x), x)

            jax.block_until_ready(run(jnp.zeros(())))
            t0 = time.perf_counter()
            jax.block_until_ready(run(jnp.zeros(())))
            dt = (time.perf_counter() - t0) / ITERS
            print(f"sup={sup} bt={bt:2d}  {dt*1e3:7.3f} ms  "
                  f"{dt/nch*1e6:6.2f} us/chunk  maxerr={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
