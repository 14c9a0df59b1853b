#!/usr/bin/env python
"""Sweep (tile, chunk, max_tiles) configs of the gaussian render fwd+bwd.

Scan-amortized device timing (see profile_render.py) of the full render
forward and forward+backward at each config, one process so compiles
share the persistent cache. Prints one line per config.
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--configs", type=str,
                    default="32,128,12;32,64,12;16,128,30;16,64,30")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dreamgaussian_tpu.ops.rasterize import render_gaussians
    from dreamgaussian_tpu.utils.camera import Camera, orbit_camera

    n, size = args.n, args.size
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(n, 3)) * 0.35, jnp.float32)
    scale = jnp.asarray(np.exp(rng.uniform(-4.5, -3.0, size=(n, 3))), jnp.float32)
    quat = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opacity = jnp.asarray(1 / (1 + np.exp(-rng.normal(size=(n,)))), jnp.float32)
    shs = jnp.asarray(rng.normal(size=(n, 1, 3)) * 0.3, jnp.float32)
    fov = math.radians(49.1)
    cam = Camera.from_pose(orbit_camera(15.0, 30.0, 2.0), size, size, fov, fov)
    a = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    K = args.iters

    def timeit_scan(phase, x0):
        def step(x, _):
            out = phase(x)
            return x + jnp.asarray(out, jnp.float32) * 1e-30, None

        f = jax.jit(lambda x0: jax.lax.scan(step, x0, None, length=K)[0])
        jax.block_until_ready(f(x0))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(x0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / K

    mp = size * size / 1e6
    print(f"backend={jax.default_backend()} size={size} n={n} K={K}")
    for spec in args.configs.split(";"):
        tile, chunk, mt = (int(v) for v in spec.split(","))

        def fwd(x, scale, quat, opacity, shs):
            out = render_gaussians(
                x, scale, quat, opacity, shs, a["view"], a["full_proj"],
                a["campos"], a["tanfov"], size, size, jnp.ones(3),
                sh_degree=0, tile=tile, max_tiles=mt, chunk=chunk,
            )
            return jnp.sum(out.image ** 2) + jnp.sum(out.alpha)

        def phase_fwd(x):
            return fwd(x, scale, quat, opacity, shs)

        def phase_fb(x):
            l, g = jax.value_and_grad(fwd)(x, scale, quat, opacity, shs)
            return l + jnp.sum(g)

        t_f = timeit_scan(phase_fwd, xyz)
        t_fb = timeit_scan(phase_fb, xyz)
        print(f"tile={tile:3d} chunk={chunk:3d} mt={mt:3d}  "
              f"fwd {t_f*1e3:7.3f} ms ({mp/t_f:6.1f} Mpix/s)   "
              f"fwd+bwd {t_fb*1e3:7.3f} ms ({mp/t_fb:6.1f} Mpix/s)",
              flush=True)


if __name__ == "__main__":
    main()
