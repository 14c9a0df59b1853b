"""Trace-timed candidates for the three hot binning fusions (real TPU).

The fwd+bwd trace showed (per render): rank cumsum-as-conv 0.71 ms, pos
flat take 0.70 ms, dup_map scatter 0.57 ms. Candidates:
  rank_cumsum   : current jnp.cumsum [8192, 257]
  rank_mxu      : blocked strict-lower matmul (256-blocks, bf16-exact)
  pos_take      : current flat take [98304]
  pos_select    : select-sum over tiles (VPU)
  scat_s32      : current dup_map s32 scatter [98304]
  scat_rows     : row scatter [98304, 16] f32 (dup_feat direct)
Each runs 30x under jax.profiler; device op totals are printed.
"""

import math
import os
import sys
import glob
import gzip
import json
import collections

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dreamgaussian_tpu.ops import binning as B
from dreamgaussian_tpu.ops.project import project_gaussians
from dreamgaussian_tpu.utils.camera import Camera, orbit_camera


def device_totals(trace_dir):
    f = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(f) as fh:
        d = json.load(fh)
    dur = collections.Counter()
    for e in d.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("pid") == 3:
            dur[e.get("name", "")] += e.get("dur", 0)
    return dur


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
    jax.block_until_ready(bins)
    k_aligned = bins.dup_map.shape[0]

    # build a plausible cov / tile_id / pos_dense fixture from the real bins
    dkey = jnp.where(proj.radius > 0, proj.depth, jnp.inf)
    _, order = jax.lax.sort((dkey, jnp.arange(n, dtype=jnp.int32)), num_keys=2)
    mean2d_s = proj.mean2d[order]
    radius_s = proj.radius[order]
    xmin, ymin, xmax, ymax = B.tile_rect(mean2d_s, radius_s, size, size, tile)
    valid_g = radius_s > 0
    rect_w = xmax - xmin
    demand = jnp.where(valid_g, rect_w * (ymax - ymin), 0)
    t_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tx = (t_ids % grid_x)[None, :]
    ty = (t_ids // grid_x)[None, :]
    in_rect = ((tx >= xmin[:, None]) & (tx < xmax[:, None])
               & (ty >= ymin[:, None]) & (ty < ymax[:, None])
               & valid_g[:, None])
    lin = (ty - ymin[:, None]) * rect_w[:, None] + (tx - xmin[:, None])
    cov = (in_rect & (lin < jnp.minimum(demand, max_tiles)[:, None])
           ).astype(jnp.int32)
    m = jnp.arange(max_tiles, dtype=jnp.int32)[None, :]
    safe_w = jnp.maximum(rect_w, 1)[:, None]
    dy = m // safe_w
    dx = m - dy * safe_w
    tile_id = ((ymin[:, None] + dy) * grid_x + (xmin[:, None] + dx))
    tile_id = jnp.where(m < jnp.minimum(demand, max_tiles)[:, None],
                        tile_id, num_tiles).astype(jnp.int32)
    pos_dense = jnp.arange(n * (num_tiles + 1), dtype=jnp.int32).reshape(
        n, num_tiles + 1)
    jax.block_until_ready((cov, tile_id, pos_dense))

    TRI = jnp.tril(jnp.ones((256, 256), jnp.float32), -1)

    @jax.jit
    def rank_cumsum(cov):
        return jnp.cumsum(cov, axis=0) - cov

    @jax.jit
    def rank_mxu(cov):
        c3 = cov.astype(jnp.float32).reshape(32, 256, num_tiles)
        local = jnp.einsum("ij,bjt->bit", TRI, c3,
                           preferred_element_type=jnp.float32)  # [32,256,T]
        blk = jnp.sum(c3, axis=1)                          # [32, T]
        off = jnp.cumsum(blk, axis=0) - blk                # exclusive
        return (local + off[:, None, :]).reshape(n, num_tiles).astype(
            jnp.int32)

    @jax.jit
    def pos_take(tile_id):
        flat_idx = (jnp.arange(n, dtype=jnp.int32)[:, None]
                    * (num_tiles + 1) + tile_id)
        return jnp.take(pos_dense.reshape(-1), flat_idx.reshape(-1)).reshape(
            n, max_tiles)

    @jax.jit
    def pos_select(tile_id):
        cols = []
        tid1 = jnp.arange(num_tiles + 1, dtype=jnp.int32)[None, :]
        for mm in range(max_tiles):
            hit = tile_id[:, mm:mm + 1] == tid1
            cols.append(jnp.sum(jnp.where(hit, pos_dense, 0), axis=1))
        return jnp.stack(cols, axis=1)

    all_pos = pos_take(tile_id).reshape(-1)
    all_idx = jnp.broadcast_to(order[:, None], (n, max_tiles)).reshape(-1)
    feat_rows = jnp.asarray(rng.normal(size=(n + 1, 16)), jnp.float32)
    updates = feat_rows[all_idx]
    jax.block_until_ready((all_pos, all_idx, updates))

    @jax.jit
    def scat_s32(all_pos):
        dup = jnp.full((k_aligned,), n, dtype=jnp.int32)
        return dup.at[all_pos].set(all_idx, mode="drop", unique_indices=True)

    @jax.jit
    def scat_rows(all_pos):
        base = jnp.zeros((k_aligned, 16), jnp.float32)
        return base.at[all_pos].set(updates, mode="drop",
                                    unique_indices=True)

    @jax.jit
    def transpose_rows(x):
        return x.T.copy() if hasattr(x.T, "copy") else jnp.transpose(x)

    cands = [
        ("rank_cumsum", rank_cumsum, cov),
        ("rank_mxu", rank_mxu, cov),
        ("pos_take", pos_take, tile_id),
        ("pos_select", pos_select, tile_id),
        ("scat_s32", scat_s32, all_pos),
        ("scat_rows", scat_rows, all_pos),
    ]

    # correctness
    np.testing.assert_array_equal(np.asarray(rank_cumsum(cov)),
                                  np.asarray(rank_mxu(cov)))
    np.testing.assert_array_equal(np.asarray(pos_take(tile_id)),
                                  np.asarray(pos_select(tile_id)))
    print("parity ok", flush=True)

    for name, fn, arg in cands:
        out = fn(arg)
        jax.block_until_ready(out)
        tdir = f"/tmp/binopt_{name}"
        jax.profiler.start_trace(tdir)
        for _ in range(30):
            out = fn(arg)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        dur = device_totals(tdir)
        tot = sum(v for k, v in dur.items()
                  if not k.startswith("$") and "block_until" not in k
                  and not k.startswith("Pjit")) / 30
        top = [f"{k[:34]}={v/30:.0f}us" for k, v in dur.most_common(4)
               if not k.startswith("$") and "block" not in k]
        print(f"{name:12s} device {tot:8.1f} us/call   {'  '.join(top)}",
              flush=True)


if __name__ == "__main__":
    main()
