"""Benchmark: differentiable Gaussian rasterizer fwd+bwd throughput.

Uses the TPU fast path (32px tiles); enable the persistent compile cache
so warm runs measure steady-state throughput, not compilation.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json config[0]): fwd+bwd render of a trained-scale
Gaussian cloud through one 512x512 camera — the hot kernel of the
stage-1 loop. The reference repo publishes no kernel throughput
(BASELINE.json published={}); ``vs_baseline`` is measured against
REF_MPIX_S = 1000 Mpix/s, the effective fwd+bwd throughput class of the
CUDA ``diff-gaussian-rasterization`` kernels on the reference's tested
RTX 3070 at this scene scale.
"""

import json
import math
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dreamgaussian_tpu.ops.rasterize import render_gaussians
    from dreamgaussian_tpu.utils.camera import Camera, orbit_camera

    n = 8192  # post-densification scale for the image task
    size = 512
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(n, 3)) * 0.35, jnp.float32)
    scale = jnp.asarray(np.exp(rng.uniform(-4.8, -3.2, size=(n, 3))), jnp.float32)
    quat = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    opacity = jnp.asarray(1 / (1 + np.exp(-rng.normal(size=(n,)))), jnp.float32)
    shs = jnp.asarray(rng.normal(size=(n, 1, 3)) * 0.3, jnp.float32)

    fov = math.radians(49.1)
    cam = Camera.from_pose(orbit_camera(15.0, 30.0, 2.0), size, size, fov, fov)
    a = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
    bg = jnp.ones(3)

    def loss_fn(xyz, scale, quat, opacity, shs):
        out = render_gaussians(
            xyz, scale, quat, opacity, shs, a["view"], a["full_proj"],
            a["campos"], a["tanfov"], size, size, bg, sh_degree=0,
            tile=32, max_tiles=12,
        )
        return jnp.sum(out.image) + jnp.sum(out.depth) + jnp.sum(out.alpha)

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))

    # Warmup/compile.
    g = step(xyz, scale, quat, opacity, shs)
    jax.block_until_ready(g)

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(xyz, scale, quat, opacity, shs)
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0

    mpix_s = iters * size * size / dt / 1e6
    ref_mpix_s = 1000.0
    print(json.dumps({
        "metric": "rasterize_fwd_bwd_512px_8k_gaussians",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / ref_mpix_s, 3),
    }))


if __name__ == "__main__":
    main()
