"""Shared deterministic inputs for the multi-host correctness test.

Imported by BOTH the 2-process workers and the single-process reference
so the two runs see bitwise-identical host inputs.
"""

import numpy as np


def fake_guidance(images, cond, step_ratio, key):
    import jax.numpy as jnp

    return jnp.mean((images - 0.5) ** 2)


LRS = {
    "total_iters": 100.0,
    "xyz": lambda s: 1e-2,
    "f_dc": 1e-2,
    "f_rest": 5e-4,
    "opacity": 0.05,
    "scaling": 5e-3,
    "rotation": 5e-3,
}

N_STEPS = 3


def make_inputs():
    """(known_cams, novel_cams[4 views], ref_rgb, ref_mask, step keys)."""
    import jax
    import jax.numpy as jnp

    from dreamgaussian_tpu.utils.camera import (
        Camera, orbit_camera, stack_cameras,
    )

    cams = [
        Camera.from_pose(
            orbit_camera(10.0, 90.0 * i - 180.0, 2.0), 32, 32, 0.857, 0.857
        )
        for i in range(4)
    ]
    novel = {k: np.asarray(v) for k, v in stack_cameras(cams).items()}
    known = {
        k: jnp.asarray(v)
        for k, v in Camera.from_pose(
            orbit_camera(0.0, 0.0, 2.0), 32, 32, 0.857, 0.857
        ).arrays().items()
    }
    ref_rgb = jnp.ones((32, 32, 3)) * 0.5
    ref_mask = jnp.ones((32, 32))
    keys = [np.asarray(jax.random.PRNGKey(100 + i)) for i in range(N_STEPS)]
    return known, novel, ref_rgb, ref_mask, keys
