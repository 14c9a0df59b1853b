"""Gaussian projection: EWA splatting of 3D Gaussians to screen space.

Pure-jnp and fully differentiable; this stage is shared by the jnp
reference rasterizer and the Pallas tile rasterizer (which consumes its
outputs through a custom_vjp compositing core).

Numerical parity target is the CUDA preprocess of
``diff-gaussian-rasterization`` as invoked by the reference
(/root/reference/gs_renderer.py:717-822): view-space z cull at 0.2,
1.3*tanfov frustum clamp for the EWA Jacobian, +0.3 pixel covariance
dilation, conic from the dilated covariance, radius = ceil(3*sqrt(max
eigenvalue)), pixel coords ((ndc+1)*size-1)/2, SH colors clamped at 0
after +0.5, opacity via sigmoid upstream of this function.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import sh as sh_ops
from .quat import build_covariance6


class ProjectedGaussians(NamedTuple):
    """Per-gaussian screen-space quantities for one camera."""

    mean2d: jnp.ndarray   # [N, 2] pixel coords
    depth: jnp.ndarray    # [N] view-space z
    conic: jnp.ndarray    # [N, 3] inverse 2D covariance (a, b, c)
    color: jnp.ndarray    # [N, 3] RGB from SH (clamped >= 0)
    opacity: jnp.ndarray  # [N] in (0, 1)
    radius: jnp.ndarray   # [N] int32 pixel radius (0 => culled)


def project_gaussians(
    xyz: jnp.ndarray,
    scale: jnp.ndarray,
    quat: jnp.ndarray,
    opacity: jnp.ndarray,
    shs: jnp.ndarray,
    view: jnp.ndarray,
    full_proj: jnp.ndarray,
    campos: jnp.ndarray,
    tanfov: jnp.ndarray,
    width: int,
    height: int,
    sh_degree: int = 0,
    scale_modifier: float = 1.0,
    alive: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Project gaussians into one camera.

    Args:
        xyz: [N,3] positions (world).
        scale: [N,3] activated (positive) scales.
        quat: [N,4] unnormalized w-first quaternions.
        opacity: [N] activated opacity in (0,1).
        shs: [N,K,3] SH coefficients.
        view: [4,4] rectified world-to-camera.
        full_proj: [4,4] projection @ view.
        campos: [3] camera center used for SH view dirs.
        tanfov: [2] (tanfovx, tanfovy).
        width, height: static image size.
        sh_degree: active SH degree (static).
        scale_modifier: global scale multiplier.
        alive: optional [N] bool mask; dead gaussians get radius 0.
    """
    tanfovx, tanfovy = tanfov[0], tanfov[1]
    focal_x = width / (2.0 * tanfovx)
    focal_y = height / (2.0 * tanfovy)

    # Camera transforms, scalarized: a [N,3]x[3,3] matmul pads to a
    # [N,128]x[128,128] MXU op (42x lane waste; needs 6 passes at f32
    # precision) — 3 row fmas on the VPU are exact f32 and ~free. This
    # cut the projection stage ~4x at N=8k (profile_rast2.py).
    gx, gy, gz = xyz[:, 0], xyz[:, 1], xyz[:, 2]

    def row(mat3, r):
        return gx * mat3[r, 0] + gy * mat3[r, 1] + gz * mat3[r, 2] + mat3[r, 3]

    pv_x = row(view, 0)
    pv_y = row(view, 1)
    depth = row(view, 2)
    in_front = depth > 0.2

    # Full projection to pixel coords.
    p_w = 1.0 / (row(full_proj, 3) + 1e-7)
    ndc_xy = jnp.stack([row(full_proj, 0), row(full_proj, 1)], axis=-1) \
        * p_w[:, None]
    sizes = jnp.array([width, height], dtype=xyz.dtype)
    mean2d = ((ndc_xy + 1.0) * sizes - 1.0) * 0.5

    # EWA: 2D covariance = J W Sigma W^T J^T with frustum-clamped Jacobian.
    # Fully scalarized: batched [N,2,3]x[N,3,3] matmuls lower poorly on TPU
    # (padded MXU / VPU loops, ~1.3 ms at N=8k); the expanded per-component
    # form is ~50 elementwise [N] ops and effectively free.
    c00, c01, c02, c11, c12, c22 = build_covariance6(
        scale * scale_modifier, quat
    )
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    tz = depth
    txtz = jnp.clip(pv_x / tz, -limx, limx)
    tytz = jnp.clip(pv_y / tz, -limy, limy)
    tx = txtz * tz
    ty = tytz * tz

    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    # J rows: j0 = (fx/tz, 0, -fx*tx/tz^2), j1 = (0, fy/tz, -fy*ty/tz^2).
    j00 = focal_x * inv_tz
    j02 = -focal_x * tx * inv_tz2
    j11 = focal_y * inv_tz
    j12 = -focal_y * ty * inv_tz2
    W = view[:3, :3]  # world->view rotation (constant across gaussians)
    # T = J W, two rows of three [N]-vectors each.
    t00 = j00 * W[0, 0] + j02 * W[2, 0]
    t01 = j00 * W[0, 1] + j02 * W[2, 1]
    t02 = j00 * W[0, 2] + j02 * W[2, 2]
    t10 = j11 * W[1, 0] + j12 * W[2, 0]
    t11 = j11 * W[1, 1] + j12 * W[2, 1]
    t12 = j11 * W[1, 2] + j12 * W[2, 2]
    # U = T C (rows of T times symmetric C), then cov2d = U T^T.
    u00 = t00 * c00 + t01 * c01 + t02 * c02
    u01 = t00 * c01 + t01 * c11 + t02 * c12
    u02 = t00 * c02 + t01 * c12 + t02 * c22
    u10 = t10 * c00 + t11 * c01 + t12 * c02
    u11 = t10 * c01 + t11 * c11 + t12 * c12
    u12 = t10 * c02 + t11 * c12 + t12 * c22
    cxx = u00 * t00 + u01 * t01 + u02 * t02 + 0.3
    cxy = u00 * t10 + u01 * t11 + u02 * t12
    cyy = u10 * t10 + u11 * t11 + u12 * t12 + 0.3

    det = cxx * cyy - cxy * cxy
    det_valid = det != 0.0
    inv_det = 1.0 / jnp.where(det_valid, det, 1.0)
    conic = jnp.stack([cyy * inv_det, -cxy * inv_det, cxx * inv_det], axis=-1)

    mid = 0.5 * (cxx + cyy)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))

    # SH -> RGB with the rasterizer's clamp-at-zero.
    dirs = xyz - campos[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    color = jnp.maximum(sh_ops.eval_sh(sh_degree, shs, dirs) + 0.5, 0.0)

    valid = in_front & det_valid
    if alive is not None:
        valid = valid & alive
    radius = jnp.where(valid, radius_f, 0.0)
    radius = jax.lax.stop_gradient(radius).astype(jnp.int32)

    return ProjectedGaussians(
        mean2d=mean2d,
        depth=depth,
        conic=conic,
        color=color,
        opacity=opacity,
        radius=radius,
    )
