"""Differentiable mesh renderer for stage-2 texture refinement.

Functional equivalent of the reference's nvdiffrast-based ``Renderer``
(/root/reference/mesh_renderer.py:42-153): renders a fixed-topology mesh
with a trainable UV albedo (stored as logits, sigmoid after texture
filtering — matching the reference's ``texture then sigmoid`` order) and
optional trainable vertex offsets (normals recomputed on the fly when
geometry trains).

TPU-first differences:
- camera matrices come from the same ``Camera`` as the gaussian renderer
  (one convention stack instead of the reference's two);
- texture sampling defaults to linear-mipmap-linear like the reference's
  nvdiffrast call (filter_mode, /root/reference/mesh_renderer.py:110),
  with the LOD from analytic per-triangle UV screen derivatives;
- analytic silhouette-edge antialiasing (ops.mesh_raster.antialias, the
  dr.antialias analogue at /root/reference/mesh_renderer.py:137) runs on
  the albedo before background blending, exactly like the reference, and
  composes with the SSAA jitter the training loop applies
  (/root/reference/main2.py:182,213);
- SSAA factors are quantized (stage 2 samples train/stage2.py
  SSAA_CHOICES = 0.25 / 0.75 / 1.25 / 1.75, matching the reference's
  uniform[0.125, 2] draw's pixel-count distribution) so renders stay
  within a few compiled shapes instead of recompiling per step.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mesh_raster import interpolate, rasterize, sample_texture, scale_img


def trunc_rev_sigmoid(x, eps: float = 1e-6):
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x / (1.0 - x))


def _safe_normalize(x, eps=1e-20):
    return x * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), eps)
    )


def make_divisible(x: float, m: int = 32) -> int:
    return int(math.ceil(x / m) * m)


class MeshRendererState(NamedTuple):
    """Static mesh topology + trainable params (a pytree)."""

    v: jnp.ndarray           # [V, 3] base vertices
    f: jnp.ndarray           # [F, 3] int32
    vn: jnp.ndarray          # [V, 3] baseline normals (train_geo recomputes)
    vt: jnp.ndarray          # [Vt, 2] (== V after align_v_to_vt)
    ft: jnp.ndarray          # [F, 3]
    raw_albedo: jnp.ndarray  # [TH, TW, 3] logits (trainable)
    v_offsets: jnp.ndarray   # [V, 3] (trainable when train_geo)

    @classmethod
    def from_mesh(cls, mesh) -> "MeshRendererState":
        return cls(
            v=jnp.asarray(mesh.v, jnp.float32),
            f=jnp.asarray(mesh.f, jnp.int32),
            vn=jnp.asarray(mesh.vn, jnp.float32),
            vt=jnp.asarray(mesh.vt, jnp.float32),
            ft=jnp.asarray(mesh.ft, jnp.int32),
            raw_albedo=trunc_rev_sigmoid(jnp.asarray(mesh.albedo, jnp.float32)),
            v_offsets=jnp.zeros_like(jnp.asarray(mesh.v, jnp.float32)),
        )

    def trainable(self, train_geo: bool) -> dict:
        p = {"raw_albedo": self.raw_albedo}
        if train_geo:
            p["v_offsets"] = self.v_offsets
        return p

    def with_params(self, params: dict) -> "MeshRendererState":
        return self._replace(
            raw_albedo=params.get("raw_albedo", self.raw_albedo),
            v_offsets=params.get("v_offsets", self.v_offsets),
        )


def _recompute_normals(v, f):
    i0, i1, i2 = f[:, 0], f[:, 1], f[:, 2]
    fn = jnp.cross(v[i1] - v[i0], v[i2] - v[i0])
    fn = _safe_normalize(fn)
    vn = jnp.zeros_like(v)
    vn = vn.at[i0].add(fn).at[i1].add(fn).at[i2].add(fn)
    vn = jnp.where(
        jnp.sum(vn * vn, -1, keepdims=True) > 1e-20,
        vn,
        jnp.array([0.0, 0.0, 1.0]),
    )
    return vn


def render_mesh(
    state: MeshRendererState,
    cam_arrays: dict,
    pose_rot: jnp.ndarray,
    h0: int,
    w0: int,
    ssaa: float = 1.0,
    bg_color=1.0,
    train_geo: bool = False,
    tile: int = 32,
    max_tiles: int = 16,
    texture_filter: str = "linear-mipmap-linear",
    edge_aa: bool = True,
):
    """Render the mesh through one camera.

    cam_arrays: Camera.arrays() dict (view / full_proj). pose_rot: [3,3]
    c2w rotation (for viewcos). Returns dict(image, alpha, depth, normal,
    viewcos) at (h0, w0); differentiable w.r.t. raw_albedo (and v_offsets
    when train_geo). ``texture_filter``: 'linear-mipmap-linear'
    (reference nvdiffrast mode, /root/reference/mesh_renderer.py:110 —
    LOD from analytic UV screen derivatives) or 'bilinear'.
    """
    if ssaa != 1:
        h = make_divisible(h0 * ssaa, tile)
        w = make_divisible(w0 * ssaa, tile)
    else:
        h, w = h0, w0
    mip = texture_filter == "linear-mipmap-linear"

    v = state.v + state.v_offsets if train_geo else state.v
    v_h = jnp.concatenate([v, jnp.ones((v.shape[0], 1))], axis=1)
    v_clip = v_h @ cam_arrays["full_proj"].T
    v_cam_z = (v_h @ cam_arrays["view"].T)[:, 2:3]  # rectified +z forward

    rast = rasterize(v_clip, state.f, w, h, tile=tile, max_tiles=max_tiles,
                     derivs=mip)
    alpha = rast.mask.astype(jnp.float32)[..., None]
    # Depth and normals share the ``f`` index set: one interpolate (one
    # faces[fidx] + one attrs[tri] gather) covers both.
    vn = _recompute_normals(v, state.f) if train_geo else state.vn
    dn = interpolate(
        jnp.concatenate([v_cam_z, vn], axis=1), state.f, rast
    )
    depth = dn[..., 0:1]

    # texture-filter the LOGITS, sigmoid after (mesh_renderer.py:110-112).
    if mip:
        from ..ops.mesh_raster import (
            build_mip_chain,
            interpolate_with_derivs,
            sample_texture_mip,
        )

        texc, texc_dx, texc_dy = interpolate_with_derivs(
            state.vt, state.ft, rast
        )
        chain = build_mip_chain(state.raw_albedo)
        albedo = jax.nn.sigmoid(
            sample_texture_mip(chain, texc, texc_dx, texc_dy)
        )
    else:
        texc = interpolate(state.vt, state.ft, rast)
        albedo = jax.nn.sigmoid(sample_texture(state.raw_albedo, texc))

    normal = _safe_normalize(dn[..., 1:4])
    rot_normal = normal @ pose_rot
    viewcos = rot_normal[..., 2:3]

    if edge_aa:
        # Reference order: antialias the albedo, THEN background-blend
        # with the hard alpha (/root/reference/mesh_renderer.py:137-138).
        from ..ops.mesh_raster import antialias

        albedo = antialias(albedo, rast, v_clip, state.f, w, h)

    image = alpha * albedo + (1.0 - alpha) * bg_color

    if (h, w) != (h0, w0):
        image = scale_img(image, h0, w0)
        alpha = scale_img(alpha, h0, w0)
        depth = scale_img(depth, h0, w0)
        normal = scale_img(normal, h0, w0)
        viewcos = scale_img(viewcos, h0, w0)

    return {
        "image": jnp.clip(image, 0.0, 1.0),
        "alpha": alpha,
        "depth": depth,
        "normal": (normal + 1.0) / 2.0,
        "viewcos": viewcos,
    }
