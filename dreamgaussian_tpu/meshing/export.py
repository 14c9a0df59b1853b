"""Stage-1 export: gaussians -> cleaned mesh -> baked UV texture.

Equivalent of the reference ``save_model('geo'/'geo+tex')``
(/root/reference/main.py:404-544) and ``GaussianModel.extract_mesh``
(/root/reference/gs_renderer.py:296-322):

- occupancy field + marching cubes + native clean/smooth/decimate;
- UV unwrap + 26 fixed orbit views; each view renders the gaussians and
  rasterizes the mesh with the SAME camera matrices (pixel-aligned by
  construction, unlike the reference's two camera stacks), masks texels
  by coverage and viewing angle (viewcos > 0.5), scatters colors into the
  texture with the mipmap grid_put, first-view-wins accumulation
  (/root/reference/main.py:500-506);
- unseen texels are filled by dilate + nearest-neighbor inpaint
  (/root/reference/main.py:517-535).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.grid_put import mipmap_linear_grid_put_2d
from ..ops.mesh_raster import interpolate, rasterize
from ..utils.camera import Camera, orbit_camera
from .marching_cubes import marching_cubes
from .mesh import Mesh, _safe_normalize
from .occupancy import extract_occupancy_field

# 26 fixed bake views (/root/reference/main.py:428-429).
BAKE_VERS = [0] * 8 + [-45] * 8 + [45] * 8 + [-89.9, 89.9]
BAKE_HORS = [0, 45, -45, 90, -90, 135, -135, 180] * 3 + [0, 0]


def extract_mesh(
    params: dict,
    alive,
    density_thresh: float = 1.0,
    resolution: int = 128,
    decimate_target: int = 100_000,
    smooth_iters: int = 2,
    remesh_size: float = 0.015,
) -> Mesh:
    """Gaussians -> world-space cleaned/remeshed/decimated triangle mesh.

    ``remesh_size`` > 0 runs the isotropic remesh toward that target
    edge length between cleanup and decimation, matching the reference's
    clean_mesh(remesh=True, remesh_size=0.015) at
    /root/reference/gs_renderer.py:309; 0 falls back to Laplacian
    smoothing only."""
    from .. import native

    occ, tf = extract_occupancy_field(params, alive, resolution=resolution)
    verts, faces = marching_cubes(occ, density_thresh)
    if len(faces) == 0:
        raise ValueError(
            f"empty isosurface at density_thresh={density_thresh} "
            f"(occ max {occ.max():.4f})"
        )
    world = tf.grid_to_world(verts, resolution)
    v, f = native.clean_mesh(world, faces, weld_eps=1e-6, min_comp_frac=0.1)
    if smooth_iters:
        v = native.laplacian_smooth(v, f, smooth_iters, 0.5)
    if remesh_size:
        v, f = native.isotropic_remesh(v, f, remesh_size, n_iter=5)
    if decimate_target and len(f) > decimate_target:
        v, f = native.decimate_mesh(v, f, decimate_target)
    mesh = Mesh(v=v.astype(np.float32), f=f.astype(np.int32))
    mesh.auto_normal()
    return mesh


def bake_texture(
    mesh: Mesh,
    render_view_fn,
    fovy: float,
    radius: float = 2.0,
    texture_size: int = 1024,
    render_resolution: int = 512,
    viewcos_thresh: float = 0.5,
    min_resolution: int = 256,
    inpaint: bool = True,
) -> np.ndarray:
    """Bake a UV albedo from multi-view gaussian renders.

    render_view_fn(cam: Camera) -> np.ndarray [H, W, 3] in [0, 1] — the
    gaussian render for one camera. Mesh must already have vt/ft (auto_uv)
    and vn.
    """
    h = w = texture_size
    albedo = np.zeros((h, w, 3), np.float32)
    cnt = np.zeros((h, w), np.float32)

    v = jnp.asarray(mesh.v)
    f = jnp.asarray(mesh.f)
    vt = jnp.asarray(mesh.vt)
    ft = jnp.asarray(mesh.ft)
    vn = jnp.asarray(mesh.vn)
    v_h = jnp.concatenate([v, jnp.ones((v.shape[0], 1))], axis=1)

    for ver, hor in zip(BAKE_VERS, BAKE_HORS):
        pose = orbit_camera(ver, hor, radius)
        cam = Camera.from_pose(
            pose, render_resolution, render_resolution, fovy, fovy
        )
        rgb = np.asarray(render_view_fn(cam))  # [R, R, 3]

        arr = cam.arrays()
        v_clip = v_h @ jnp.asarray(arr["full_proj"]).T
        rast = rasterize(
            v_clip, f, render_resolution, render_resolution,
            tile=32, max_tiles=16,
        )
        uvs = interpolate(vt, ft, rast)                     # [R, R, 2]
        normal = _safe_normalize(np.asarray(interpolate(vn, f, rast)))
        # viewcos: cosine between surface normal and view direction
        # (camera-facing z after rotating into the camera frame,
        # /root/reference/main.py:484-487).
        rot_normal = normal @ np.asarray(pose[:3, :3])
        viewcos = rot_normal[..., 2]

        mask = np.asarray(rast.mask) & (viewcos > viewcos_thresh)
        # STATIC-shape scatter: all R^2 pixels go in with weight 0/1.
        # Boolean-compressing to the M masked pixels gave every view a
        # different [M] shape => a fresh jit compile of the whole mipmap
        # scatter pipeline PER VIEW (26 remote compiles dominated the
        # measured 55 s export on the tunneled TPU). The few-x extra
        # scatter work is milliseconds.
        cur_albedo, cur_cnt = mipmap_linear_grid_put_2d(
            h, w,
            jnp.asarray(uvs).reshape(-1, 2) * 2.0 - 1.0,
            jnp.asarray(rgb).reshape(-1, 3),
            min_resolution=min_resolution,
            return_count=True,
            weights=jnp.asarray(mask.reshape(-1), jnp.float32),
        )
        cur_albedo = np.asarray(cur_albedo)
        cur_cnt = np.asarray(cur_cnt)

        # First-view-wins: only texels not yet covered take new data
        # (raw sums + counts, normalized once at the end).
        fresh = cnt < 0.1
        albedo[fresh] += cur_albedo[fresh]
        cnt[fresh] += cur_cnt[fresh]

    seen = cnt > 0
    albedo[seen] /= cnt[seen, None]

    if inpaint and seen.any() and not seen.all():
        from scipy.ndimage import binary_dilation, binary_erosion
        from scipy.spatial import cKDTree

        inpaint_region = binary_dilation(seen, iterations=32)
        inpaint_region[seen] = 0
        search_region = seen.copy()
        interior = binary_erosion(search_region, iterations=3)
        search_region[interior] = 0
        search_coords = np.argwhere(search_region)
        inpaint_coords = np.argwhere(inpaint_region)
        if len(search_coords) and len(inpaint_coords):
            tree = cKDTree(search_coords)
            _, idx = tree.query(inpaint_coords, k=1)
            albedo[tuple(inpaint_coords.T)] = albedo[
                tuple(search_coords[idx].T)
            ]
    return albedo


def export_textured_mesh(
    params: dict,
    alive,
    render_view_fn,
    path: str,
    fovy: float,
    radius: float = 2.0,
    density_thresh: float = 1.0,
    texture_size: int = 1024,
    bake_resolution: int = 512,
    mc_resolution: int = 128,
    decimate_target: int = 100_000,
    remesh_size: float = 0.015,
    uv_cache_path: str | None = None,
) -> Mesh:
    """Full geo+tex export: mesh extraction + UV + bake + write."""
    mesh = extract_mesh(
        params, alive, density_thresh=density_thresh,
        resolution=mc_resolution, decimate_target=decimate_target,
        remesh_size=remesh_size,
    )
    mesh.auto_uv(cache_path=uv_cache_path)
    mesh.auto_normal()
    mesh.albedo = bake_texture(
        mesh, render_view_fn, fovy=fovy, radius=radius,
        texture_size=texture_size, render_resolution=bake_resolution,
        min_resolution=min(256, texture_size // 4),
    )
    mesh.write(path)
    return mesh
