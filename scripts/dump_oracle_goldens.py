#!/usr/bin/env python
"""Interim parity goldens from the dense jnp oracle.

The BASELINE allclose gate (tests/test_cuda_parity.py) is designed to
run against dumps from the real CUDA ``diff_gaussian_rasterization``
kernels (scripts/dump_parity_fixtures.py). This environment has no CUDA
machine reachable, so — as an explicit interim measure — this script
writes goldens in the SAME npz schema from the dense jnp oracle
(ops/rasterize_ref.py, which replicates the CUDA compositing semantics
and is itself finite-difference-validated in tests/test_rasterize.py).

Each npz carries ``oracle="dense_jnp"`` so it is distinguishable from a
real CUDA dump, and tests/test_cuda_parity.py pins the committed files
by sha256 (tests/fixtures/cuda_parity/GOLDENS.sha256): the gate then
locks the Pallas rasterizer against silent drift across rounds. Replace
these files with real CUDA dumps (same filenames, no ``oracle`` key)
when a CUDA machine is available; the hash pin only applies to oracle
goldens.

Run on CPU: JAX_PLATFORMS=cpu (conftest-style) is forced below.
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

os.environ.setdefault("XLA_FLAGS", "")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dreamgaussian_tpu.ops.project import project_gaussians  # noqa: E402
from dreamgaussian_tpu.ops.rasterize_ref import composite_dense  # noqa: E402
from dreamgaussian_tpu.utils.camera import Camera, orbit_camera  # noqa: E402
from scripts.dump_parity_fixtures import make_scene  # noqa: E402

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "cuda_parity",
)
# Same cases as the CUDA dump script plus a per-case opacity scale: the
# denser scenes are toned down so no pixel sits at the T<1e-4
# early-termination knife edge with a NON-trivial contribution — there,
# order-of-accumulation fp noise flips whether a gaussian contributes at
# all and ANY two correct implementations (CUDA included) disagree on
# its gradient. Measured: medium at 0.5 / large at 0.25 bring worst-case
# relative gradient deviation vs the Pallas path from O(1) to ~1e-6.
CASES = {
    "small_front": (200, 0, 15.0, 30.0, 64, 1.0),
    "medium_side": (1000, 1, -20.0, 120.0, 128, 0.5),
    "large_back": (5000, 2, 0.0, 180.0, 256, 0.25),
}


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    fov = math.radians(49.1)
    hashes = {}
    for case, (n, seed, elev, azim, size, op_scale) in CASES.items():
        sc = make_scene(n, seed)
        sc["opacity"] = (sc["opacity"] * op_scale).astype(np.float32)
        cam = Camera.from_pose(
            orbit_camera(elev, azim, 2.0), size, size, fov, fov
        )
        a = {k: jnp.asarray(v) for k, v in cam.arrays().items()}

        def fwd(xyz, scale, quat, opacity, shs, tap):
            proj = project_gaussians(
                xyz, scale, quat, opacity, shs,
                a["view"], a["full_proj"], a["campos"], a["tanfov"],
                size, size, sh_degree=0,
            )
            proj = proj._replace(mean2d=proj.mean2d + tap)
            out = composite_dense(proj, size, size, jnp.ones(3))
            return out._replace(image=jnp.clip(out.image, 0.0, 1.0))

        args = tuple(
            jnp.asarray(sc[k])
            for k in ("xyz", "scale", "quat", "opacity", "shs")
        )
        tap = jnp.zeros((n, 2))
        out = jax.jit(fwd)(*args, tap)

        rng = np.random.default_rng(seed + 100)
        w_img = rng.normal(size=(3, size, size)).astype(np.float32)
        w_alpha = rng.normal(size=(1, size, size)).astype(np.float32)
        wi = jnp.asarray(w_img).transpose(1, 2, 0)
        wa = jnp.asarray(w_alpha)[0]

        def loss(xyz, scale, quat, opacity, shs, tap):
            o = fwd(xyz, scale, quat, opacity, shs, tap)
            return jnp.sum(o.image * wi) + jnp.sum(o.alpha * wa)

        grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5)))(
            *args, tap
        )
        g_means2d = np.zeros((n, 3), np.float32)
        g_means2d[:, :2] = np.asarray(grads[5]) * (size / 2.0)

        path = os.path.join(OUT_DIR, f"{case}.npz")
        np.savez(
            path, **sc,
            oracle="dense_jnp",
            elev=elev, azim=azim, size=size, radius=2.0, fovy=fov,
            image=np.asarray(out.image).transpose(2, 0, 1),
            depth=np.asarray(out.depth)[None],
            alpha=np.asarray(out.alpha)[None],
            radii=np.asarray(out.radii),
            w_img=w_img, w_alpha=w_alpha,
            g_xyz=np.asarray(grads[0]),
            g_scale=np.asarray(grads[1]),
            g_quat=np.asarray(grads[2]),
            g_opacity=np.asarray(grads[3])[:, None],
            g_shs=np.asarray(grads[4]),
            g_means2d=g_means2d,
        )
        hashes[f"{case}.npz"] = hashlib.sha256(
            open(path, "rb").read()
        ).hexdigest()
        print(f"wrote {case}.npz")

    with open(os.path.join(OUT_DIR, "GOLDENS.sha256"), "w") as f:
        for name in sorted(hashes):
            f.write(f"{hashes[name]}  {name}\n")
    print("wrote GOLDENS.sha256")


if __name__ == "__main__":
    main()
