"""Orbit rendering / turntable export (kiui.render equivalent).

The reference's final step renders a 360-degree video of the result with
``python -m kiui.render mesh.obj --save_video out.mp4``
(/root/reference/scripts/runall.py:45, convert_obj_to_video.py:14-19).
This CLI renders gaussian PLYs (through the Pallas splat renderer) or
meshes (through the mesh rasterizer) into a frame grid, GIF, or MP4 (if
an ffmpeg backend is installed; falls back to GIF otherwise).

Usage:
  python -m dreamgaussian_tpu.cli.render logs/name_model.ply --out o.gif
  python -m dreamgaussian_tpu.cli.render logs/name.obj --num_frames 8 \\
      --out grid.png
"""

from __future__ import annotations

import argparse
import math
import os

import numpy as np


def render_gaussian_frames(ply_path, frames, size, elevation, radius, fovy):
    import jax.numpy as jnp

    from ..scene import load_ply
    from ..train.stage1 import get_cached_render
    from ..utils.camera import Camera, orbit_camera

    params, aux, sh_degree = load_ply(ply_path)
    fn = get_cached_render(size, size, sh_degree, params["xyz"].shape[0])
    out = []
    for hor in np.linspace(-180, 180, frames, endpoint=False):
        cam = Camera.from_pose(
            orbit_camera(elevation, hor, radius), size, size, fovy, fovy
        )
        arr = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
        res = fn(params, arr, jnp.ones(3), aux.alive)
        out.append(np.asarray(res.image))
    return out


def render_mesh_frames(mesh_path, frames, size, elevation, radius, fovy):
    import jax.numpy as jnp

    from ..meshing.mesh import Mesh
    from ..render.mesh_renderer import MeshRendererState, render_mesh
    from ..utils.camera import Camera, orbit_camera

    mesh = Mesh.load(mesh_path, resize=False)
    if mesh.vt is None:
        mesh.auto_uv()
        mesh.auto_normal()
    if mesh.albedo is None:
        mesh.albedo = np.full((512, 512, 3), 0.7, np.float32)
    st = MeshRendererState.from_mesh(mesh)
    out = []
    for hor in np.linspace(-180, 180, frames, endpoint=False):
        cam = Camera.from_pose(
            orbit_camera(elevation, hor, radius), size, size, fovy, fovy
        )
        arr = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
        w2c = np.asarray(cam.view[:3, :3]).copy()
        w2c[1:3] *= -1
        res = render_mesh(st, arr, jnp.asarray(w2c.T), size, size)
        out.append(np.asarray(res["image"]))
    return out


def save_frames(frames: list, out_path: str, fps: int = 15) -> None:
    import imageio

    imgs = [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f in frames]
    ext = os.path.splitext(out_path)[1].lower()
    if ext == ".png":
        cols = int(math.ceil(math.sqrt(len(imgs))))
        rows = int(math.ceil(len(imgs) / cols))
        h, w = imgs[0].shape[:2]
        grid = np.full((rows * h, cols * w, 3), 255, np.uint8)
        for i, im in enumerate(imgs):
            r, c = divmod(i, cols)
            grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = im
        imageio.imwrite(out_path, grid)
    elif ext == ".gif":
        imageio.mimwrite(out_path, imgs, duration=1000.0 / fps, loop=0)
    elif ext == ".mp4":
        try:
            imageio.mimwrite(out_path, imgs, fps=fps)
        except Exception:
            alt = os.path.splitext(out_path)[0] + ".gif"
            print(f"[WARN] no mp4 backend; writing {alt}")
            imageio.mimwrite(alt, imgs, duration=1000.0 / fps, loop=0)
    else:
        raise ValueError(f"unsupported output format: {ext}")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path", help=".ply (gaussians) or .obj/.glb (mesh)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--num_frames", type=int, default=36)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--elevation", type=float, default=0.0)
    ap.add_argument("--radius", type=float, default=2.0)
    ap.add_argument("--fovy", type=float, default=49.1)
    ap.add_argument("--fps", type=int, default=15)
    args = ap.parse_args(argv)

    if not os.path.exists(args.path):
        raise SystemExit(f"error: no such file: {args.path}")
    fovy = math.radians(args.fovy)
    ext = os.path.splitext(args.path)[1].lower()
    fn = render_gaussian_frames if ext == ".ply" else render_mesh_frames
    frames = fn(
        args.path, args.num_frames, args.size, args.elevation, args.radius,
        fovy,
    )
    out = args.out or os.path.splitext(args.path)[0] + "_orbit.gif"
    save_frames(frames, out, fps=args.fps)
    print(f"[INFO] wrote {out}")


if __name__ == "__main__":
    main()
