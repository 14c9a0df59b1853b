"""Mean squared distance to the 3 nearest neighbors (simple-knn equivalent).

Replaces the vendored CUDA ``simple_knn._C.distCUDA2``
(/root/reference/simple-knn/spatial.cu:14-23): for every point, the mean of
squared distances to its 3 nearest neighbors, used once at init to set the
log-scale of each gaussian (/root/reference/gs_renderer.py:341-342).

TPU-first design: instead of the CUDA Morton-sort + box-pruning scan, we use
a blocked exact distance computation. Pairwise squared distances are
expressed through a matmul (``|a-b|^2 = |a|^2 + |b|^2 - 2 a.b``) so the
dominant cost lands on the MXU; rows are processed in blocks to bound
memory at O(block * N). Exact (not approximate) for all N; at the scales
this pipeline uses (5k-50k points) this is faster than tree methods.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "block_size"))
def mean_knn_sq_dist(points: jnp.ndarray, k: int = 3, block_size: int = 1024) -> jnp.ndarray:
    """Mean of squared distances from each point to its k nearest neighbors.

    Args:
        points: [N, 3] float array.
        k: neighbor count (excluding self).
        block_size: rows per block (static).

    Returns:
        [N] mean squared distance to the k nearest neighbors.
    """
    points = points.astype(jnp.float32)
    n = points.shape[0]
    pad = (-n) % block_size
    pts_pad = jnp.pad(points, ((0, pad), (0, 0)))
    n_pad = pts_pad.shape[0]
    sq_norms = jnp.sum(points * points, axis=-1)  # [N]

    def block_fn(block_pts: jnp.ndarray, block_idx: jnp.ndarray) -> jnp.ndarray:
        # [B, N] squared distances via MXU matmul.
        block_sq = jnp.sum(block_pts * block_pts, axis=-1, keepdims=True)
        d2 = block_sq + sq_norms[None, :] - 2.0 * (
            block_pts @ points.T
        )
        d2 = jnp.maximum(d2, 0.0)
        # Exclude self-distance (and padded rows' bogus matches are dropped
        # by the caller's slice).
        cols = jnp.arange(n)[None, :]
        d2 = jnp.where(cols == block_idx[:, None], jnp.inf, d2)
        # k smallest via negated top_k.
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.mean(-neg_top, axis=-1)

    blocks = pts_pad.reshape(n_pad // block_size, block_size, 3)
    idx = jnp.arange(n_pad).reshape(n_pad // block_size, block_size)
    out = jax.lax.map(lambda args: block_fn(*args), (blocks, idx))
    return out.reshape(n_pad)[:n]
