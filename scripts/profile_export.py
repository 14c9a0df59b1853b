"""Phase-timed stage-1 geo+tex export (the bench_export workload).

Times each phase of export_textured_mesh warm (2nd run) on a
really-trained cloud, to locate the cost in BENCH's export_s.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from dreamgaussian_tpu.meshing import export as E
    from dreamgaussian_tpu.meshing.mesh import Mesh

    # Small real training run to get a realistic cloud (fake guidance is
    # fine: geometry occupancy is what matters for export cost).
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_comp_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from PIL import Image

    from dreamgaussian_tpu.guidance.fake import fake_zero123_guidance
    from dreamgaussian_tpu.train import Stage1Trainer
    from dreamgaussian_tpu.utils.config import Config

    img = np.asarray(
        Image.open("/root/reference/data/anya_rgba.png").resize((256, 256))
    ).astype(np.float32) / 255.0
    mask = img[..., 3:4]
    rgb = img[..., :3] * mask + (1 - mask)
    g = fake_zero123_guidance()
    opt = Config(dict(
        iters=500, ref_size=256, num_pts=5000, sh_degree=0, batch_size=1,
        warmup_rgb_loss=True, density_start_iter=100, density_end_iter=3000,
        densification_interval=100, opacity_reset_interval=700, elevation=0,
        radius=2.0, fovy=49.1, min_ver=-30, max_ver=30, invert_bg_prob=0.5,
    ))
    tr = Stage1Trainer(
        opt, ref_rgb=rgb, ref_mask=mask[..., 0], capacity=8192, seed=0,
        guidance_fns=((1.0,) + g.guidance_args(),),
    )
    while tr.step < 150:
        tr.train_segment(min(50, 150 - tr.step), 500)
        jax.block_until_ready(tr.params["xyz"])
        tr._check_overflow()
    print("alive:", int(np.asarray(tr.aux.alive).sum()), flush=True)

    def render_fn(cam):
        out = tr.render_view(cam)
        return np.asarray(out.image)

    def run(tag):
        t = {}
        t0 = time.perf_counter()
        mesh = E.extract_mesh(tr.params, tr.aux.alive)
        t["extract_mesh"] = time.perf_counter() - t0
        print(f"  [{tag}] faces after extract: {len(mesh.f)}", flush=True)
        t0 = time.perf_counter()
        mesh.auto_uv()
        t["auto_uv"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        mesh.auto_normal()
        t["auto_normal"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        mesh.albedo = E.bake_texture(
            mesh, render_fn, fovy=tr.fovy, radius=tr.radius,
            texture_size=1024, render_resolution=512, min_resolution=256,
        )
        t["bake_texture"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        import tempfile
        with tempfile.TemporaryDirectory() as d:
            mesh.write(os.path.join(d, "m.obj"))
        t["write"] = time.perf_counter() - t0
        tot = sum(t.values())
        print(f"  [{tag}] " + "  ".join(
            f"{k}={v:.2f}s" for k, v in t.items()
        ) + f"  TOTAL={tot:.2f}s", flush=True)
        return t

    run("cold")
    run("warm")

    # Decompose extract_mesh warm.
    from dreamgaussian_tpu.meshing.marching_cubes import marching_cubes
    from dreamgaussian_tpu.meshing.occupancy import extract_occupancy_field
    from dreamgaussian_tpu import native

    t0 = time.perf_counter()
    occ, tf = extract_occupancy_field(tr.params, tr.aux.alive, resolution=128)
    occ_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    verts, faces = marching_cubes(occ, 1.0)
    mc_s = time.perf_counter() - t0
    world = tf.grid_to_world(verts, 128)
    t0 = time.perf_counter()
    v, f = native.clean_mesh(world, faces, weld_eps=1e-6, min_comp_frac=0.1)
    clean_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    v = native.laplacian_smooth(v, f, 2, 0.5)
    smooth_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    v2, f2 = native.isotropic_remesh(v, f, 0.015, n_iter=5)
    remesh_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    if len(f2) > 100_000:
        v3, f3 = native.decimate_mesh(v2, f2, 100_000)
    else:
        v3, f3 = v2, f2
    dec_s = time.perf_counter() - t0
    print(f"  extract: occ={occ_s:.2f} mc={mc_s:.2f} clean={clean_s:.2f} "
          f"smooth={smooth_s:.2f} remesh={remesh_s:.2f} (faces {len(f)}->"
          f"{len(f2)}) decimate={dec_s:.2f} (->{len(f3)})", flush=True)

    # Decompose one bake view warm.
    mesh = E.extract_mesh(tr.params, tr.aux.alive)
    mesh.auto_uv()
    mesh.auto_normal()
    from dreamgaussian_tpu.ops.grid_put import mipmap_linear_grid_put_2d
    from dreamgaussian_tpu.ops.mesh_raster import interpolate, rasterize
    from dreamgaussian_tpu.meshing.mesh import _safe_normalize
    from dreamgaussian_tpu.utils.camera import Camera, orbit_camera

    v = jnp.asarray(mesh.v)
    f = jnp.asarray(mesh.f)
    vt = jnp.asarray(mesh.vt)
    ft = jnp.asarray(mesh.ft)
    vn = jnp.asarray(mesh.vn)
    v_h = jnp.concatenate([v, jnp.ones((v.shape[0], 1))], axis=1)

    for it in range(2):
        tr_render = tr_rast = tr_interp = tr_put = tr_host = 0.0
        for ver, hor in zip(E.BAKE_VERS, E.BAKE_HORS):
            pose = orbit_camera(ver, hor, tr.radius)
            cam = Camera.from_pose(pose, 512, 512, tr.fovy, tr.fovy)
            t0 = time.perf_counter()
            rgb = render_fn(cam)
            tr_render += time.perf_counter() - t0
            arr = cam.arrays()
            t0 = time.perf_counter()
            v_clip = v_h @ jnp.asarray(arr["full_proj"]).T
            rast = rasterize(v_clip, f, 512, 512, tile=32, max_tiles=16)
            jax.block_until_ready(rast.mask)
            tr_rast += time.perf_counter() - t0
            t0 = time.perf_counter()
            uvs = interpolate(vt, ft, rast)
            normal = _safe_normalize(np.asarray(interpolate(vn, f, rast)))
            tr_interp += time.perf_counter() - t0
            t0 = time.perf_counter()
            rot_normal = normal @ np.asarray(pose[:3, :3])
            viewcos = rot_normal[..., 2]
            mask = np.asarray(rast.mask) & (viewcos > 0.5)
            tr_host += time.perf_counter() - t0
            t0 = time.perf_counter()
            a, c = mipmap_linear_grid_put_2d(
                1024, 1024, jnp.asarray(uvs).reshape(-1, 2) * 2.0 - 1.0,
                jnp.asarray(rgb).reshape(-1, 3), min_resolution=256,
                return_count=True,
                weights=jnp.asarray(mask.reshape(-1), jnp.float32),
            )
            jax.block_until_ready(a)
            tr_put += time.perf_counter() - t0
        print(f"  bake[{'cold' if it == 0 else 'warm'}]: render={tr_render:.2f} "
              f"rast={tr_rast:.2f} interp={tr_interp:.2f} host={tr_host:.2f} "
              f"grid_put={tr_put:.2f}", flush=True)


if __name__ == "__main__":
    main()
