"""Dense differentiable reference rasterizer (pure jnp, O(N*H*W)).

This is the numerical oracle for the Pallas tile rasterizer: it reproduces
the CUDA compositing semantics of ``diff-gaussian-rasterization`` exactly —
including the per-gaussian skip rules and early-termination rule — but as a
dense, autodiff-friendly computation. Use for tests and tiny scenes only.

Semantics replicated (per CUDA forward, call surface
/root/reference/gs_renderer.py:745-822):

- gaussians composite front-to-back in view-depth order;
- a gaussian touches a pixel only if the pixel's 16x16 tile lies in the
  gaussian's radius rect (tile culling is part of the math, not just an
  optimization — the CUDA kernel never evaluates outside the rect);
- power = -0.5 d^T conic d; skip if power > 0;
- alpha = min(0.99, opacity * exp(power)); skip if alpha < 1/255;
- termination: if T*(1-alpha) < 1e-4 the pixel is done and this gaussian
  does NOT contribute;
- the 0.99 clamp is straight-through in the backward pass (the CUDA
  backward ignores the clamp), reproduced here via a stop_gradient trick;
- outputs: rgb (+ T_final * bg), depth = sum w*z (unnormalized),
  alpha = 1 - T_final.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .project import ProjectedGaussians

TILE = 16
TERM_EPS = 1e-4
ALPHA_SKIP = 1.0 / 255.0


class RenderOutput(NamedTuple):
    image: jnp.ndarray    # [H, W, 3]
    depth: jnp.ndarray    # [H, W]
    alpha: jnp.ndarray    # [H, W]
    radii: jnp.ndarray    # [N] int32


def _tile_rect(mean2d: jnp.ndarray, radius: jnp.ndarray, width: int, height: int):
    """Integer tile rect [min, max) per gaussian, matching CUDA getRect."""
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    r = radius.astype(mean2d.dtype)
    xmin = jnp.clip(((mean2d[:, 0] - r) / TILE).astype(jnp.int32), 0, grid_x)
    ymin = jnp.clip(((mean2d[:, 1] - r) / TILE).astype(jnp.int32), 0, grid_y)
    xmax = jnp.clip(((mean2d[:, 0] + r + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x)
    ymax = jnp.clip(((mean2d[:, 1] + r + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y)
    return xmin, ymin, xmax, ymax


def composite_dense(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    bg: jnp.ndarray,
) -> RenderOutput:
    """Composite projected gaussians over every pixel (dense reference)."""
    mean2d, depth, conic, color, opacity, radius = proj
    n = mean2d.shape[0]

    # Depth-sort (culled gaussians to the back).
    sort_depth = jnp.where(radius > 0, depth, jnp.inf)
    order = jnp.argsort(sort_depth)
    mean2d = mean2d[order]
    depth = depth[order]
    conic = conic[order]
    color = color[order]
    opacity = opacity[order]
    radius_s = radius[order]

    # Pixel grid; CUDA uses pixf = (float)pix, i.e. centers at integer coords.
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=mean2d.dtype),
        jnp.arange(width, dtype=mean2d.dtype),
        indexing="ij",
    )
    px = xs.reshape(-1)  # [P]
    py = ys.reshape(-1)

    dx = mean2d[:, 0:1] - px[None, :]  # [N, P]
    dy = mean2d[:, 1:2] - py[None, :]
    a = conic[:, 0:1]
    b = conic[:, 1:2]
    c = conic[:, 2:3]
    power = -0.5 * (a * dx * dx + c * dy * dy) - b * dx * dy

    # Tile-rect coverage mask.
    xmin, ymin, xmax, ymax = _tile_rect(mean2d, radius_s, width, height)
    tx = (px[None, :] / TILE).astype(jnp.int32)
    ty = (py[None, :] / TILE).astype(jnp.int32)
    in_rect = (
        (tx >= xmin[:, None]) & (tx < xmax[:, None])
        & (ty >= ymin[:, None]) & (ty < ymax[:, None])
    )

    alpha_raw = opacity[:, None] * jnp.exp(power)
    # Straight-through 0.99 clamp: forward min(0.99, .), backward identity.
    alpha_clamped = alpha_raw + jax.lax.stop_gradient(
        jnp.minimum(0.99, alpha_raw) - alpha_raw
    )
    skip = (
        (power > 0.0)
        | jax.lax.stop_gradient(alpha_raw < ALPHA_SKIP)
        | ~in_rect
        | (radius_s[:, None] <= 0)
    )
    alpha = jnp.where(skip, 0.0, alpha_clamped)

    one_minus = 1.0 - alpha
    # Exclusive prefix product of transmittance.
    t_excl = jnp.concatenate(
        [jnp.ones((1, alpha.shape[1]), alpha.dtype),
         jnp.cumprod(one_minus, axis=0)[:-1]],
        axis=0,
    )
    # Termination: gaussian that would push T below eps does not contribute
    # (skipped gaussians cannot trigger: alpha=0 keeps T unchanged >= eps).
    test = jax.lax.stop_gradient((t_excl * one_minus < TERM_EPS) & (alpha > 0.0))
    contrib = jax.lax.stop_gradient(jnp.cumsum(test, axis=0) == 0)

    weight = alpha * t_excl * contrib  # [N, P]
    rgb = weight.T @ color  # [P, 3]
    dep = weight.T @ depth[:, None]  # [P, 1]
    t_final = jnp.prod(jnp.where(contrib, one_minus, 1.0), axis=0)  # [P]

    image = rgb + t_final[:, None] * bg[None, :]
    return RenderOutput(
        image=image.reshape(height, width, 3),
        depth=dep.reshape(height, width),
        alpha=(1.0 - t_final).reshape(height, width),
        radii=radius,
    )
