"""Allclose gate against reference rasterizer dumps.

Fixtures are produced on a CUDA machine by
``scripts/dump_parity_fixtures.py``. Until one is reachable, the
committed goldens come from the dense jnp oracle
(``scripts/dump_oracle_goldens.py``, same schema, marked
``oracle="dense_jnp"``) — an explicit interim stand-in that still locks
the Pallas tile=16 path (forward image + per-gaussian gradients) against
drift. Oracle goldens are hash-pinned by GOLDENS.sha256 so they cannot
be silently regenerated to mask a regression; real CUDA dumps (no
``oracle`` key) replace them without a pin.
"""

import glob
import hashlib
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "cuda_parity"
)
CASES = sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.npz")))

pytestmark = pytest.mark.skipif(
    not CASES, reason="no CUDA parity fixtures (see scripts/dump_parity_fixtures.py)"
)


def _pinned_hashes():
    path = os.path.join(FIXTURE_DIR, "GOLDENS.sha256")
    if not os.path.exists(path):
        return {}
    out = {}
    for line in open(path):
        digest, name = line.split()
        out[name] = digest
    return out


@pytest.mark.parametrize("path", CASES, ids=[os.path.basename(c) for c in CASES])
def test_oracle_goldens_hash_pinned(path):
    """Dense-oracle goldens must match their committed sha256 pins."""
    d = np.load(path, allow_pickle=True)
    if "oracle" not in d:
        pytest.skip("real CUDA dump — no hash pin")
    pins = _pinned_hashes()
    name = os.path.basename(path)
    assert name in pins, f"{name} missing from GOLDENS.sha256"
    digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
    assert digest == pins[name], (
        f"{name} drifted from its pin — regenerate deliberately via "
        "scripts/dump_oracle_goldens.py and update GOLDENS.sha256"
    )


@pytest.mark.parametrize("path", CASES, ids=[os.path.basename(c) for c in CASES])
def test_forward_and_grads_match_cuda(path):
    from dreamgaussian_tpu.ops.rasterize import render_gaussians
    from dreamgaussian_tpu.utils.camera import Camera, orbit_camera

    d = np.load(path)
    size = int(d["size"])
    fov = float(d["fovy"])
    cam = Camera.from_pose(
        orbit_camera(float(d["elev"]), float(d["azim"]), float(d["radius"])),
        size, size, fov, fov,
    )
    a = {k: jnp.asarray(v) for k, v in cam.arrays().items()}

    def run(xyz, scale, quat, opacity, shs, tap):
        # max_tiles=256 clamps to the full tile grid => binning is exact
        # (no duplicate-slot truncation) for every case size here.
        out = render_gaussians(
            xyz, scale, quat, opacity, shs, a["view"], a["full_proj"],
            a["campos"], a["tanfov"], size, size, jnp.ones(3),
            sh_degree=0, mean2d_tap=tap, tile=16, max_tiles=256,
        )
        return out

    args = tuple(
        jnp.asarray(d[k]) for k in ("xyz", "scale", "quat", "opacity", "shs")
    )
    tap = jnp.zeros((args[0].shape[0], 2))
    out = run(*args, tap)
    assert int(out.overflow) == 0, "binning must be exact for the gate"

    # CUDA layout is CHW.
    np.testing.assert_allclose(
        np.asarray(out.image).transpose(2, 0, 1), d["image"], atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out.alpha)[None], d["alpha"], atol=2e-4
    )
    np.testing.assert_array_equal(
        (np.asarray(out.radii) > 0), (d["radii"] > 0)
    )

    w_img = jnp.asarray(d["w_img"]).transpose(1, 2, 0)
    w_alpha = jnp.asarray(d["w_alpha"])[0]

    def loss(xyz, scale, quat, opacity, shs, tap):
        out = run(xyz, scale, quat, opacity, shs, tap)
        return jnp.sum(out.image * w_img) + jnp.sum(out.alpha * w_alpha)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(*args, tap)
    for g, key in zip(
        grads, ("g_xyz", "g_scale", "g_quat", "g_opacity", "g_shs")
    ):
        ref = d[key].reshape(np.asarray(g).shape)
        mag = np.abs(ref).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(g), ref, atol=5e-4 * mag, rtol=5e-3, err_msg=key
        )
    # means2D grad: CUDA reports half-image units on x/y.
    g_tap = np.asarray(grads[5]) * (size / 2.0)
    ref2d = d["g_means2d"][:, :2]
    mag = np.abs(ref2d).max() + 1e-6
    np.testing.assert_allclose(g_tap, ref2d, atol=1e-3 * mag, rtol=1e-2)
