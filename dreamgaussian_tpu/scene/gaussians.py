"""Gaussian scene state with shape-static adaptive density control.

TPU-native redesign of the reference ``GaussianModel``
(/root/reference/gs_renderer.py:125-627). The reference grows/shrinks its
parameter tensors and performs in-place optimizer surgery on every
densify/prune (/root/reference/gs_renderer.py:464-533) — dynamic shapes
that would force an XLA recompile each time. Here:

- Parameters live in **fixed-capacity padded arrays** with an ``alive``
  mask. Densify/prune are pure functions ``(params, adam, aux) -> (params,
  adam, aux)`` at constant shape: survivors stay in their slots (so Adam
  moments remain aligned for free), and new gaussians are scattered into
  freed slots via a sort-based slot allocator.
- Activations match the reference exactly: scale = exp(log-scale),
  opacity = sigmoid(logit), rotation normalized at use, SH color offset
  handled by the projector.

Replicated behavioral quirks (load-bearing for parity):

- densification stats (max radii / positional-gradient norm accumulators)
  are zeroed for ALL gaussians after each densify pass, so the
  screen-radius prune condition inside ``densify_and_prune`` never fires
  (the reference resets ``max_radii2D`` in ``densification_postfix``
  before checking it, /root/reference/gs_renderer.py:552-554,617-620);
  the standalone ``prune_only`` uses live stats.
- clones appended by ``densify_and_clone`` cannot be selected by the
  subsequent split (their padded gradient is zero,
  /root/reference/gs_renderer.py:560-562).
- split originals are pruned; split children get scale/(0.8*N) with N=2
  and xyz jittered by a rotated Normal(0, scale) sample
  (/root/reference/gs_renderer.py:564-579).
- ``reset_opacity`` clamps activated opacity to <= 0.01 and zeroes the
  opacity Adam moments (/root/reference/gs_renderer.py:417-420,464-480).

PLY serialization is byte-compatible with the GS-standard layout
(/root/reference/gs_renderer.py:384-415) so checkpoints cross-load with
the reference and third-party viewers.
"""

from __future__ import annotations

from typing import Mapping, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.knn import mean_knn_sq_dist
from ..ops.quat import normalize_quat, quat_to_rotmat
from ..ops.sh import rgb_to_sh
from ..utils import ply as plyio
from .optim import AdamState

# Param groups (dict keys) and their shapes at capacity C with R rest coeffs:
#   xyz [C,3], f_dc [C,1,3], f_rest [C,R,3], opacity [C,1] (logit),
#   scaling [C,3] (log), rotation [C,4] (unnormalized, w-first).
PARAM_KEYS = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")


class GaussianAux(NamedTuple):
    """Non-trainable per-slot state."""

    alive: jnp.ndarray         # [C] bool
    max_radii2d: jnp.ndarray   # [C] f32, max screen radius seen since reset
    grad_accum: jnp.ndarray    # [C] f32, sum ||dL/d mean2d_ndc||
    denom: jnp.ndarray         # [C] f32, visibility count


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def num_alive(aux: GaussianAux) -> jnp.ndarray:
    return jnp.sum(aux.alive.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_random(
    key: jax.Array,
    num_pts: int = 5000,
    capacity: int = 65536,
    radius: float = 0.5,
    sh_degree: int = 0,
) -> tuple[dict, GaussianAux]:
    """Random-ball initialization (reference Renderer.initialize,
    /root/reference/gs_renderer.py:689-715 + create_from_pcd :331-354).

    Uniform sample inside a ``radius`` ball; colors ~ U[0, 1/255) treated
    as SH then converted to RGB (i.e. near-gray); opacity 0.1; isotropic
    log-scale from mean 3-NN squared distance; identity rotation.
    """
    assert capacity >= num_pts
    k_phi, k_cos, k_mu, k_col = jax.random.split(key, 4)
    phi = jax.random.uniform(k_phi, (num_pts,)) * 2.0 * jnp.pi
    costheta = jax.random.uniform(k_cos, (num_pts,)) * 2.0 - 1.0
    sintheta = jnp.sqrt(jnp.maximum(1.0 - costheta**2, 0.0))
    r = radius * jnp.cbrt(jax.random.uniform(k_mu, (num_pts,)))
    xyz = jnp.stack(
        [r * sintheta * jnp.cos(phi), r * sintheta * jnp.sin(phi), r * costheta],
        axis=1,
    )
    # Reference: shs = U[0,1)/255 interpreted as SH, converted to RGB for the
    # point cloud, then back to SH by create_from_pcd.
    shs = jax.random.uniform(k_col, (num_pts, 3)) / 255.0

    dist2 = jnp.maximum(mean_knn_sq_dist(xyz, k=3), 1e-7)
    scaling = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    n_rest = (sh_degree + 1) ** 2 - 1

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((capacity - num_pts,) + x.shape[1:], fill, x.dtype)]
        )

    params = {
        "xyz": pad(xyz),
        "f_dc": pad(shs[:, None, :]),  # rgb_to_sh(sh_to_rgb(x)) == x
        "f_rest": jnp.zeros((capacity, n_rest, 3), jnp.float32),
        "opacity": pad(inverse_sigmoid(0.1 * jnp.ones((num_pts, 1)))),
        "scaling": pad(scaling, fill=-10.0),
        "rotation": pad(
            jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (num_pts, 1))
        ),
    }
    params = {k: v.astype(jnp.float32) for k, v in params.items()}
    alive = jnp.arange(capacity) < num_pts
    aux = GaussianAux(
        alive=alive,
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
    )
    return params, aux


def from_arrays(
    xyz: np.ndarray,
    rgb: np.ndarray,
    capacity: int,
    sh_degree: int = 0,
    opacity: float = 0.1,
) -> tuple[dict, GaussianAux]:
    """Init from an explicit point cloud (create_from_pcd analogue)."""
    num_pts = xyz.shape[0]
    xyz = jnp.asarray(xyz, jnp.float32)
    dist2 = jnp.maximum(mean_knn_sq_dist(xyz, k=3), 1e-7)
    scaling = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    n_rest = (sh_degree + 1) ** 2 - 1

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((capacity - num_pts,) + x.shape[1:], fill, x.dtype)]
        )

    params = {
        "xyz": pad(xyz),
        "f_dc": pad(rgb_to_sh(jnp.asarray(rgb, jnp.float32))[:, None, :]),
        "f_rest": jnp.zeros((capacity, n_rest, 3), jnp.float32),
        "opacity": pad(
            inverse_sigmoid(opacity * jnp.ones((num_pts, 1)))
        ),
        "scaling": pad(scaling, fill=-10.0),
        "rotation": pad(jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (num_pts, 1))),
    }
    params = {k: v.astype(jnp.float32) for k, v in params.items()}
    alive = jnp.arange(capacity) < num_pts
    aux = GaussianAux(
        alive=alive,
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
    )
    return params, aux


# ---------------------------------------------------------------------------
# Densification statistics
# ---------------------------------------------------------------------------


def accumulate_stats(
    aux: GaussianAux, mean2d_grad: jnp.ndarray, radii: jnp.ndarray
) -> GaussianAux:
    """Fold one render's densification signals into the running stats.

    mean2d_grad: [C,2] dL/d(pixel mean2d) * (W/2, H/2) — i.e. NDC-halved
    magnitude, matching what the CUDA rasterizer reports and the reference
    thresholds on (/root/reference/gs_renderer.py:625-627).
    radii: [C] int32 screen radii from the same render (0 = invisible).
    """
    vis = (radii > 0) & aux.alive
    gnorm = jnp.linalg.norm(mean2d_grad[:, :2], axis=-1)
    return aux._replace(
        max_radii2d=jnp.where(
            vis, jnp.maximum(aux.max_radii2d, radii.astype(jnp.float32)),
            aux.max_radii2d,
        ),
        grad_accum=aux.grad_accum + jnp.where(vis, gnorm, 0.0),
        denom=aux.denom + vis.astype(jnp.float32),
    )


# ---------------------------------------------------------------------------
# Density control (shape-static)
# ---------------------------------------------------------------------------


def _alloc_slots(free: jnp.ndarray, want: jnp.ndarray):
    """Map the j-th wanted item to the j-th free slot.

    free: [C] bool (slot is available), want: [M] bool (item needs a slot).
    Returns (dest [M] int32 clipped to valid range, ok [M] bool — False if
    the item overflowed capacity and must be dropped).
    """
    c = free.shape[0]
    # Stable-sort slots so free ones come first, preserving index order.
    order = jnp.argsort(jnp.where(free, 0, 1), stable=True).astype(jnp.int32)
    n_free = jnp.sum(free.astype(jnp.int32))
    rank = jnp.cumsum(want.astype(jnp.int32)) - 1          # [M]
    ok = want & (rank < n_free)
    # Rejected items point at index C, dropped by mode="drop" scatters —
    # they must NOT alias a real slot (duplicate .at[].set is unordered).
    dest = jnp.where(ok, order[jnp.clip(rank, 0, c - 1)], c)
    return dest, ok


def _scatter_rows(params: dict, new_vals: dict, dest: jnp.ndarray, ok: jnp.ndarray):
    del ok  # encoded in dest (== C for dropped items)
    return {
        k: v.at[dest].set(new_vals[k].astype(v.dtype), mode="drop")
        for k, v in params.items()
    }


def _zero_rows(tree: dict, mask: jnp.ndarray):
    return {
        k: jnp.where(mask.reshape((-1,) + (1,) * (v.ndim - 1)), 0.0, v)
        for k, v in tree.items()
    }


def densify_and_prune(
    params: dict,
    adam: AdamState,
    aux: GaussianAux,
    key: jax.Array,
    grad_threshold: float = 0.01,
    min_opacity: float = 0.01,
    extent: float = 4.0,
    percent_dense: float = 0.01,
):
    """Clone + split + prune at fixed capacity.

    Pure function of (params, adam, aux); all shapes static. Equivalent to
    the reference ``densify_and_prune(max_grad, 0.01, 4, 1)`` call
    (/root/reference/main.py:283, gs_renderer.py:597-611) including the
    reset-before-check quirk that disables the screen-radius prune there.

    Returns ``(params, adam, aux, dropped)``: ``dropped`` is the number of
    clone/split candidates that could not be granted a free slot (the
    reference grows unboundedly, gs_renderer.py:581-595, so its demand is
    always met). Callers must surface nonzero values and escalate capacity
    (Stage1Trainer grows + retraces, like the binning max_tiles path) —
    a capacity-bound run must never silently stop densifying.
    """
    alive = aux.alive
    grads = aux.grad_accum / jnp.maximum(aux.denom, 1.0)
    grads = jnp.where((aux.denom > 0) & alive, grads, 0.0)

    act_scale = jnp.exp(params["scaling"])            # [C,3]
    max_scale = jnp.max(act_scale, axis=-1)
    act_op = jax.nn.sigmoid(params["opacity"][:, 0])

    hot = alive & (grads >= grad_threshold)
    small = max_scale <= percent_dense * extent
    clone_sel = hot & small
    split_sel = hot & ~small

    # Prune condition on ORIGINAL params (ws uses current scale; the vs
    # screen-radius term is dead inside densify — see module docstring).
    ws_big = max_scale > 0.1 * extent
    prune_orig = (act_op < min_opacity) | ws_big

    keep = alive & ~split_sel & ~prune_orig
    free = ~keep

    # --- Candidate new gaussians: [clone | split0 | split1], each length C.
    n2 = jax.random.normal(key, (2,) + params["scaling"].shape)  # [2,C,3]
    rot = quat_to_rotmat(normalize_quat(params["rotation"]))      # [C,3,3]

    def split_child(sample):
        offset = jnp.einsum("cij,cj->ci", rot, sample * act_scale)
        child = dict(params)
        child["xyz"] = params["xyz"] + offset
        child["scaling"] = jnp.log(act_scale / 1.6)  # /(0.8*N), N=2
        return child

    cand = jax.tree.map(
        lambda a, b, c: jnp.concatenate([a, b, c]),
        dict(params), split_child(n2[0]), split_child(n2[1]),
    )
    # Children keep original opacity/etc; prune check for candidates:
    cand_op = jax.nn.sigmoid(cand["opacity"][:, 0])
    cand_ws = jnp.max(jnp.exp(cand["scaling"]), axis=-1) > 0.1 * extent
    cand_valid = jnp.concatenate([clone_sel, split_sel, split_sel])
    cand_valid &= ~((cand_op < min_opacity) | cand_ws)

    dest, ok = _alloc_slots(free, cand_valid)
    dropped = jnp.sum(cand_valid.astype(jnp.int32)) - jnp.sum(
        ok.astype(jnp.int32)
    )
    new_params = _scatter_rows(params, cand, dest, ok)

    # Freed slots (dead or newly pruned/split originals) lose their moments;
    # new slots get zero moments (reference appends zeros / prunes state,
    # /root/reference/gs_renderer.py:482-533).
    mu = _zero_rows(adam.mu, free)
    nu = _zero_rows(adam.nu, free)

    new_alive = keep.at[dest].set(True, mode="drop")
    zeros = jnp.zeros_like(aux.max_radii2d)
    new_aux = GaussianAux(
        alive=new_alive, max_radii2d=zeros, grad_accum=zeros, denom=zeros
    )
    return new_params, AdamState(mu=mu, nu=nu, count=adam.count), new_aux, dropped


def prune_only(
    params: dict,
    adam: AdamState,
    aux: GaussianAux,
    min_opacity: float = 0.01,
    extent: float = 1.0,
    max_screen_size: float = 1.0,
):
    """Standalone prune with LIVE stats (reference ``prune``,
    /root/reference/gs_renderer.py:613-622; called after training at
    /root/reference/main.py:894-897)."""
    act_op = jax.nn.sigmoid(params["opacity"][:, 0])
    max_scale = jnp.max(jnp.exp(params["scaling"]), axis=-1)
    prune = act_op < min_opacity
    if max_screen_size:
        prune |= aux.max_radii2d > max_screen_size
        prune |= max_scale > 0.1 * extent
    keep = aux.alive & ~prune
    freed = aux.alive & ~keep
    mu = _zero_rows(adam.mu, freed)
    nu = _zero_rows(adam.nu, freed)
    return (
        params,
        AdamState(mu=mu, nu=nu, count=adam.count),
        aux._replace(alive=keep),
    )


def reset_opacity(params: dict, adam: AdamState):
    """Clamp activated opacity to <= 0.01 and zero its Adam moments
    (/root/reference/gs_renderer.py:417-420,464-480)."""
    new_op = inverse_sigmoid(
        jnp.minimum(jax.nn.sigmoid(params["opacity"]), 0.01)
    )
    params = dict(params)
    params["opacity"] = new_op
    mu = dict(adam.mu)
    nu = dict(adam.nu)
    mu["opacity"] = jnp.zeros_like(mu["opacity"])
    nu["opacity"] = jnp.zeros_like(nu["opacity"])
    return params, AdamState(mu=mu, nu=nu, count=adam.count)


# ---------------------------------------------------------------------------
# PLY I/O (GS-standard layout, cross-loads with the reference)
# ---------------------------------------------------------------------------


def save_ply(path: str, params: Mapping[str, jnp.ndarray], aux: GaussianAux) -> int:
    """Write alive gaussians as a GS-standard PLY
    (/root/reference/gs_renderer.py:384-415). Returns the point count."""
    alive = np.asarray(aux.alive)
    p = {k: np.asarray(v)[alive] for k, v in params.items()}
    n = p["xyz"].shape[0]
    if n == 0:
        # Every gaussian was pruned (possible on very short runs: the
        # reference-faithful final prune uses live screen-radius stats
        # that a full-length run zeroes by scheduling accident).
        print(f"[WARN] saving EMPTY gaussian ply to {path} (0 alive)")
        plyio.write_ply(
            path,
            {"vertex": plyio.structured_from_columns(
                {name: np.zeros((0,), np.float32) for name in ("x", "y", "z")}
            )},
        )
        return 0
    cols: dict[str, np.ndarray] = {}
    for i, name in enumerate("xyz"):
        cols[name] = p["xyz"][:, i]
    for name in ("nx", "ny", "nz"):
        cols[name] = np.zeros((n,), np.float32)
    # f_dc: [N,1,3] -> channel-major flatten (transpose(1,2).flatten).
    f_dc = p["f_dc"].transpose(0, 2, 1).reshape(n, -1)
    for i in range(f_dc.shape[1]):
        cols[f"f_dc_{i}"] = f_dc[:, i]
    f_rest = p["f_rest"].transpose(0, 2, 1).reshape(n, -1)
    for i in range(f_rest.shape[1]):
        cols[f"f_rest_{i}"] = f_rest[:, i]
    cols["opacity"] = p["opacity"][:, 0]
    for i in range(3):
        cols[f"scale_{i}"] = p["scaling"][:, i]
    for i in range(4):
        cols[f"rot_{i}"] = p["rotation"][:, i]
    cols = {k: v.astype(np.float32) for k, v in cols.items()}
    plyio.write_ply(path, {"vertex": plyio.structured_from_columns(cols)})
    return n


def load_ply(
    path: str, capacity: int | None = None
) -> tuple[dict, GaussianAux, int]:
    """Load a GS-standard PLY into padded arrays.

    Returns (params, aux, sh_degree). Capacity defaults to the next power
    of two >= N (so densification has headroom).
    """
    cols = plyio.read_ply(path)["vertex"]
    names = cols.dtype.names
    n = cols.shape[0]
    if capacity is None:
        capacity = max(1024, 1 << int(np.ceil(np.log2(max(n, 1) * 2))))

    xyz = np.stack([cols["x"], cols["y"], cols["z"]], axis=1)
    f_dc = np.stack([cols[f"f_dc_{i}"] for i in range(3)], axis=1)[:, None, :]
    # stored channel-major: f_dc_{c} is channel c of coeff 0.
    f_dc = f_dc.reshape(n, 1, 3)
    rest_names = sorted(
        (nm for nm in names if nm.startswith("f_rest_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    n_rest_total = len(rest_names)
    n_rest = n_rest_total // 3
    sh_degree = int(round(np.sqrt(n_rest + 1))) - 1
    if n_rest_total:
        fr = np.stack([cols[nm] for nm in rest_names], axis=1)
        f_rest = fr.reshape(n, 3, n_rest).transpose(0, 2, 1)
    else:
        f_rest = np.zeros((n, 0, 3), np.float32)
    opacity = cols["opacity"][:, None]
    scaling = np.stack([cols[f"scale_{i}"] for i in range(3)], axis=1)
    rotation = np.stack([cols[f"rot_{i}"] for i in range(4)], axis=1)

    def pad(x, fill=0.0):
        return np.concatenate(
            [x, np.full((capacity - n,) + x.shape[1:], fill, np.float32)]
        ).astype(np.float32)

    params = {
        "xyz": jnp.asarray(pad(xyz)),
        "f_dc": jnp.asarray(pad(f_dc)),
        "f_rest": jnp.asarray(pad(f_rest)),
        "opacity": jnp.asarray(pad(opacity)),
        "scaling": jnp.asarray(pad(scaling, fill=-10.0)),
        "rotation": jnp.asarray(
            np.concatenate(
                [
                    rotation,
                    np.tile(
                        np.array([[1, 0, 0, 0]], np.float32), (capacity - n, 1)
                    ),
                ]
            )
        ),
    }
    aux = GaussianAux(
        alive=jnp.asarray(np.arange(capacity) < n),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
    )
    return params, aux, sh_degree
