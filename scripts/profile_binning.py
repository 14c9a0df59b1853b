"""Sub-op timing of bin_gaussians at the bench shape (512^2 / 8k / tile 32).

Decomposes the ~2.8 ms binning row of profile_rast.py into its jnp
pieces so the optimization lands on the real cost (suspects: the
N*max_tiles flat gather and the dup_map scatter — TPU gathers/scatters
run ~100M elem/s).
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from dreamgaussian_tpu.ops import binning as B
    from dreamgaussian_tpu.ops.project import project_gaussians
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
    jax.block_until_ready(proj)
    mean2d, depth, radius = proj.mean2d, proj.depth, proj.radius
    log_op = jnp.log(jnp.maximum(proj.opacity, 1e-30))

    def timeit(name, fn, *args, iters=50):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:34s} {dt * 1e3:8.3f} ms", flush=True)
        return out, dt

    # 1. depth sort
    def depth_sort():
        dkey = jnp.where(radius > 0, depth, jnp.inf)
        _, order = jax.lax.sort((dkey, jnp.arange(n, dtype=jnp.int32)),
                                num_keys=2)
        return order
    order, _ = timeit("depth sort", jax.jit(depth_sort))

    mean2d_s = mean2d[order]
    radius_s = radius[order]
    conic_s = proj.conic[order]
    logop_s = log_op[order]
    xmin, ymin, xmax, ymax = B.tile_rect(mean2d_s, radius_s, size, size, tile)
    valid_g = radius_s > 0
    jax.block_until_ready((xmin, ymin, xmax, ymax, conic_s))
    rect_w = xmax - xmin
    demand = jnp.where(valid_g, rect_w * (ymax - ymin), 0)
    num_big, big_budget = B.default_big(n, max_tiles, num_tiles)
    k_aligned = B.aligned_capacity(n, max_tiles, num_tiles, chunk,
                                   extra=num_big * big_budget)

    # 2. top_k
    timeit("top_k (big class)", jax.jit(lambda: jax.lax.top_k(demand, num_big)))

    # 3. dense coverage + rank cumsum [N, T]
    t_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tx = (t_ids % grid_x)[None, :]
    ty = (t_ids // grid_x)[None, :]

    def dense_cov():
        in_rect = ((tx >= xmin[:, None]) & (tx < xmax[:, None])
                   & (ty >= ymin[:, None]) & (ty < ymax[:, None])
                   & valid_g[:, None])
        lin = (ty - ymin[:, None]) * rect_w[:, None] + (tx - xmin[:, None])
        cov = (in_rect & (lin < jnp.minimum(demand, max_tiles)[:, None])
               ).astype(jnp.int32)
        rank = jnp.cumsum(cov, axis=0) - cov
        return cov.sum(axis=0), rank.sum()
    timeit("dense cov + rank cumsum", jax.jit(dense_cov))

    # 4. ellipse keep (dense)
    def keep_dense():
        lx = tx.astype(jnp.float32) * tile - mean2d_s[:, 0:1]
        ly = ty.astype(jnp.float32) * tile - mean2d_s[:, 1:2]
        qb = 2.0 * (logop_s - math.log(1 / 255.0)) + 1e-3
        return B.ellipse_tile_keep(
            lx, lx + (tile - 1), ly, ly + (tile - 1),
            conic_s[:, 0:1], conic_s[:, 1:2], conic_s[:, 2:3], qb[:, None],
        ).sum()
    timeit("ellipse keep dense [N,T]", jax.jit(keep_dense))

    # 5. the flat pos take ([N*max_tiles] gather from [N*(T+1)])
    pos_dense = jnp.arange(n * (num_tiles + 1), dtype=jnp.int32).reshape(
        n, num_tiles + 1)
    m = jnp.arange(max_tiles, dtype=jnp.int32)[None, :]
    safe_w = jnp.maximum(rect_w, 1)[:, None]
    dy = m // safe_w
    dx = m - dy * safe_w
    tile_id = ((ymin[:, None] + dy) * grid_x + (xmin[:, None] + dx))
    tile_id = jnp.where(m < jnp.minimum(demand, max_tiles)[:, None],
                        tile_id, num_tiles).astype(jnp.int32)
    flat_idx = (jnp.arange(n, dtype=jnp.int32)[:, None] * (num_tiles + 1)
                + tile_id)

    def pos_take():
        return jnp.take(pos_dense.reshape(-1), flat_idx.reshape(-1))
    pos, _ = timeit("pos flat take [N*M]", jax.jit(pos_take))

    # 5b. same as select-sum over tiles (VPU instead of gather)
    def pos_select():
        acc = jnp.zeros((n, max_tiles), jnp.int32)
        for mm in range(max_tiles):
            tid = tile_id[:, mm:mm + 1]                      # [N,1]
            hit = (tid == t_ids[None, :])                    # [N,T]
            acc = acc.at[:, mm].set(
                jnp.sum(jnp.where(hit, pos_dense[:, :num_tiles], 0), axis=1)
            )
        return acc
    timeit("pos select-sum [N,M,T]", jax.jit(pos_select))

    pos = pos.reshape(n, max_tiles)
    all_pos = pos.reshape(-1)
    all_idx = jnp.broadcast_to(order[:, None], (n, max_tiles)).reshape(-1)

    # 6. dup_map scatter
    def dup_scatter():
        dup = jnp.full((k_aligned,), n, dtype=jnp.int32)
        return dup.at[all_pos % k_aligned].set(
            all_idx, mode="drop", unique_indices=True)
    timeit("dup_map scatter [N*M]", jax.jit(dup_scatter))

    # 7. gather_map scatter (row scatter [N, M] by order)
    def gm_scatter():
        return jnp.zeros((n, max_tiles), jnp.int32).at[order].set(
            pos, unique_indices=True)
    timeit("gather_map row scatter", jax.jit(gm_scatter))

    # 8. full bin_gaussians, rect-only and culled
    timeit("bin_gaussians (rect)", jax.jit(lambda: B.bin_gaussians(
        mean2d, depth, radius, size, size, max_tiles=max_tiles,
        chunk=chunk, tile=tile)))
    out, _ = timeit("bin_gaussians (cull)", jax.jit(lambda: B.bin_gaussians(
        mean2d, depth, radius, size, size, max_tiles=max_tiles,
        chunk=chunk, tile=tile, conic=proj.conic, log_opacity=log_op)))
    print(f"  rect dups vs culled dups: "
          f"{int(jax.jit(lambda: B.bin_gaussians(mean2d, depth, radius, size, size, max_tiles=max_tiles, chunk=chunk, tile=tile).num_dups)())} "
          f"-> {int(out.num_dups)}  overflow={int(out.overflow)}")


if __name__ == "__main__":
    main()
