#!/usr/bin/env python
"""Phase-level timing of the gaussian render path on the current backend.

Times, in steady state (median of ``--iters`` calls after warmup):
  project      EWA projection + SH only
  bin          tile binning only (counting sort)
  fwd          full render forward
  fwd_bwd      full render forward + backward (grad of scalar loss)
and derives the per-phase split. Use to find the next kernel lever;
Mpix/s = H*W / t.

Run: python scripts/profile_render.py [--size 512] [--n 8192] [--tile 32]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--max-tiles", type=int, default=12)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--trace", type=str, default=None,
                    help="directory for a jax.profiler trace of one fwd_bwd")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dreamgaussian_tpu.ops.binning import bin_gaussians
    from dreamgaussian_tpu.ops.project import project_gaussians
    from dreamgaussian_tpu.ops.rasterize import render_gaussians
    from dreamgaussian_tpu.utils.camera import Camera, orbit_camera

    n, size, tile = args.n, args.size, args.tile
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(n, 3)) * 0.35, jnp.float32)
    scale = jnp.asarray(np.exp(rng.uniform(-4.5, -3.0, size=(n, 3))), jnp.float32)
    quat = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opacity = jnp.asarray(1 / (1 + np.exp(-rng.normal(size=(n,)))), jnp.float32)
    shs = jnp.asarray(rng.normal(size=(n, 1, 3)) * 0.3, jnp.float32)
    fov = math.radians(49.1)
    cam = Camera.from_pose(orbit_camera(15.0, 30.0, 2.0), size, size, fov, fov)
    a = {k: jnp.asarray(v) for k, v in cam.arrays().items()}

    def project_only(xyz, scale, quat, opacity, shs):
        p = project_gaussians(
            xyz, scale, quat, opacity, shs, a["view"], a["full_proj"],
            a["campos"], a["tanfov"], size, size, sh_degree=0,
        )
        return p.mean2d, p.depth, p.conic, p.color, p.opacity, p.radius

    proj_out = jax.jit(project_only)(xyz, scale, quat, opacity, shs)

    # Phase timing must amortize dispatch: a synchronous per-call measure
    # through the axon tunnel is ~40 ms of round-trip latency regardless
    # of the device work. Each phase runs K times inside ONE lax.scan
    # dispatch with a data dependence (xyz nudged by a tiny multiple of
    # the phase output) so XLA cannot CSE the iterations away.
    K = args.iters

    def scan_phase(phase):
        def step(x, _):
            out = phase(x)
            dep = jnp.asarray(out, jnp.float32) * 1e-30
            return x + dep, None

        def run(x0):
            xf, _ = jax.lax.scan(step, x0, None, length=K)
            return xf

        return jax.jit(run)

    def timeit_scan(f, x0):
        r = f(x0)
        jax.block_until_ready(r)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / K

    def phase_proj(x):
        p = project_gaussians(
            x, scale, quat, opacity, shs, a["view"], a["full_proj"],
            a["campos"], a["tanfov"], size, size, sh_degree=0,
        )
        return jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(p.color)

    m2d0, dep0, rad0 = proj_out[0], proj_out[1], proj_out[5]

    def phase_bin(m2d):
        b = bin_gaussians(m2d, dep0, rad0, size, size,
                          max_tiles=args.max_tiles, chunk=args.chunk,
                          tile=tile)
        return jnp.sum(b.n_chunks).astype(jnp.float32)

    def fwd(x, scale, quat, opacity, shs):
        out = render_gaussians(
            x, scale, quat, opacity, shs, a["view"], a["full_proj"],
            a["campos"], a["tanfov"], size, size, jnp.ones(3), sh_degree=0,
            tile=tile, max_tiles=args.max_tiles, chunk=args.chunk,
        )
        return jnp.sum(out.image ** 2) + jnp.sum(out.alpha)

    def phase_fwd(x):
        return fwd(x, scale, quat, opacity, shs)

    def phase_fwd_bwd(x):
        l, g = jax.value_and_grad(fwd, argnums=0)(x, scale, quat, opacity, shs)
        return l + jnp.sum(g)

    def phase_fwd_bwd_all(x):
        g = jax.grad(fwd, argnums=(0, 1, 2, 3, 4))(x, scale, quat, opacity, shs)
        return sum(jnp.sum(t) for t in g)

    # Finer probes: isolate the dup-feature gather, the Pallas composite
    # fwd/bwd, and the backward gather-reduction.
    from dreamgaussian_tpu.ops import rasterize as R
    from dreamgaussian_tpu.ops.rasterize_pallas import (
        FEAT_ROWS, OUT_CH, composite_backward, composite_forward)

    bins0 = jax.jit(lambda m2d: bin_gaussians(
        m2d, dep0, rad0, size, size, max_tiles=args.max_tiles,
        chunk=args.chunk, tile=tile))(m2d0)
    n_ = m2d0.shape[0]
    rows0 = jnp.concatenate([
        m2d0.T, proj_out[2].T, proj_out[3].T,
        proj_out[4].reshape(1, n_), dep0.reshape(1, n_)], axis=0)
    feat0 = jnp.pad(rows0, ((0, FEAT_ROWS - rows0.shape[0]), (0, 1)))
    grid_x = size // tile
    num_tiles = grid_x * grid_x
    dup0 = jnp.take(feat0, bins0.dup_map, axis=1)
    toff = jnp.zeros((1,), jnp.int32)
    fwd0 = composite_forward(dup0, bins0.chunk_starts, bins0.n_chunks, toff,
                             grid_x=grid_x, num_tiles=num_tiles,
                             chunk=args.chunk, tile=tile)

    def phase_gather(x):
        # x enters through feat0 to keep the data dependence.
        f = feat0 + x[0, 0] * 1e-30
        return jnp.sum(jnp.take(f, bins0.dup_map, axis=1))

    def phase_cfwd(x):
        d = dup0 + x[0, 0] * 1e-30
        out = composite_forward(d, bins0.chunk_starts, bins0.n_chunks, toff,
                                grid_x=grid_x, num_tiles=num_tiles,
                                chunk=args.chunk, tile=tile)
        return jnp.sum(out[..., :5])

    def phase_cbwd(x):
        d = dup0 + x[0, 0] * 1e-30
        g = composite_backward(d, bins0.chunk_starts, bins0.n_chunks, fwd0,
                               jnp.ones_like(fwd0), toff, grid_x=grid_x,
                               num_tiles=num_tiles, chunk=args.chunk,
                               tile=tile)
        return jnp.sum(g)

    def phase_greduce(x):
        g = dup0 + x[0, 0] * 1e-30
        per_dup = jnp.take(
            g, bins0.gather_map.reshape(-1), axis=1, mode="fill",
            fill_value=0.0,
        ).reshape(FEAT_ROWS, n_, -1)
        return jnp.sum(jnp.sum(per_dup, axis=-1))

    t_proj = timeit_scan(scan_phase(phase_proj), xyz)
    t_bin = timeit_scan(scan_phase(phase_bin), m2d0)
    t_gather = timeit_scan(scan_phase(phase_gather), xyz)
    t_cfwd = timeit_scan(scan_phase(phase_cfwd), xyz)
    t_cbwd = timeit_scan(scan_phase(phase_cbwd), xyz)
    t_gred = timeit_scan(scan_phase(phase_greduce), xyz)
    t_fwd = timeit_scan(scan_phase(phase_fwd), xyz)
    t_fb = timeit_scan(scan_phase(phase_fwd_bwd), xyz)
    t_fba = timeit_scan(scan_phase(phase_fwd_bwd_all), xyz)
    g_j = jax.jit(jax.grad(fwd, argnums=(0, 1, 2, 3, 4)))
    jax.block_until_ready(g_j(xyz, scale, quat, opacity, shs))

    mp = size * size / 1e6
    print(f"backend={jax.default_backend()} size={size} n={n} tile={tile} "
          f"max_tiles={args.max_tiles} chunk={args.chunk} (device time, "
          f"scan-amortized over K={K})")
    print(f"project     : {t_proj*1e3:8.3f} ms")
    print(f"bin         : {t_bin*1e3:8.3f} ms")
    print(f"dup_gather  : {t_gather*1e3:8.3f} ms")
    print(f"comp fwd    : {t_cfwd*1e3:8.3f} ms")
    print(f"comp bwd    : {t_cbwd*1e3:8.3f} ms")
    print(f"grad reduce : {t_gred*1e3:8.3f} ms")
    print(f"fwd         : {t_fwd*1e3:8.3f} ms   ({mp/t_fwd:7.1f} Mpix/s)")
    print(f"fwd+bwd xyz : {t_fb*1e3:8.3f} ms   ({mp/t_fb:7.1f} Mpix/s)")
    print(f"fwd+bwd all : {t_fba*1e3:8.3f} ms   ({mp/t_fba:7.1f} Mpix/s)")
    print(f"bwd est     : {(t_fba-t_fwd)*1e3:8.3f} ms")

    if args.trace:
        import jax.profiler
        jax.profiler.start_trace(args.trace)
        for _ in range(3):
            jax.block_until_ready(g_j(xyz, scale, quat, opacity, shs))
        jax.profiler.stop_trace()
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
