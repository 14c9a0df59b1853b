"""Tile-sharded rendering tests: forward and gradient parity vs
single-device, on the virtual 8-device CPU mesh."""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from dreamgaussian_tpu.ops.rasterize import render_gaussians
from dreamgaussian_tpu.parallel.tile_shard import (
    make_tile_sharded_render,
    render_gaussians_tile_sharded,
)
from dreamgaussian_tpu.utils.camera import Camera, orbit_camera


def scene(n=200, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(n, 3)) * 0.35, jnp.float32),
        jnp.asarray(np.exp(rng.uniform(-4.2, -2.5, size=(n, 3))), jnp.float32),
        jnp.asarray(rng.normal(size=(n, 4)), jnp.float32),
        jnp.asarray(1 / (1 + np.exp(-rng.normal(size=(n,)))), jnp.float32),
        jnp.asarray(rng.normal(size=(n, 1, 3)) * 0.3, jnp.float32),
    )


def cam_arrays(size=256):
    fov = math.radians(49.1)
    c = Camera.from_pose(orbit_camera(15, 30, 2.0), size, size, fov, fov)
    return {k: jnp.asarray(v) for k, v in c.arrays().items()}


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("tile",))


SIZE = 256  # 8 tile rows at tile=32 -> one row per device


class TestTileShard:
    def test_forward_matches_single_device(self, mesh):
        xyz, scale, quat, op, shs = scene()
        a = cam_arrays(SIZE)
        single = render_gaussians(
            xyz, scale, quat, op, shs, a["view"], a["full_proj"], a["campos"],
            a["tanfov"], SIZE, SIZE, jnp.ones(3), tile=32, max_tiles=12,
        ).image
        fn = make_tile_sharded_render(mesh, SIZE, SIZE)
        sharded = fn(xyz, scale, quat, op, shs, a["view"], a["full_proj"],
                     a["campos"], a["tanfov"])
        # INTERPRET-MODE caveat: on CPU the Pallas kernel body is plain
        # traced jnp, so XLA may fuse/reassociate its elementwise math
        # differently inside the single-device and shard_map programs; a
        # pair sitting exactly on the T<TERM_EPS early-stop threshold can
        # then flip its contributor decision, changing that pixel by up
        # to one near-terminal contribution (w <= ~1e-2). On real TPU the
        # compiled Mosaic kernel is identical in both programs, so the
        # outputs match bitwise. Assert near-exactness for the mass and
        # bound the rare threshold flips.
        d = np.abs(np.asarray(sharded) - np.asarray(single))
        assert (d > 1e-5).mean() < 1e-4, f"{(d > 1e-5).sum()} pixels differ"
        assert d.max() < 2e-2, f"max diff {d.max()} exceeds flip bound"

    def test_gradients_match_single_device(self, mesh):
        xyz, scale, quat, op, shs = scene(n=120, seed=3)
        a = cam_arrays(SIZE)
        rng = np.random.default_rng(7)
        wr = jnp.asarray(rng.normal(size=(SIZE, SIZE, 3)).astype(np.float32))

        def loss_single(xyz, scale, quat, op, shs):
            out = render_gaussians(
                xyz, scale, quat, op, shs, a["view"], a["full_proj"],
                a["campos"], a["tanfov"], SIZE, SIZE, jnp.ones(3),
                tile=32, max_tiles=12,
            )
            return jnp.sum(out.image * wr) + jnp.sum(out.alpha)

        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(P(),) * 5, out_specs=P(),
            check_vma=False,
        )
        def loss_sharded(xyz, scale, quat, op, shs):
            out = render_gaussians_tile_sharded(
                xyz, scale, quat, op, shs, a["view"], a["full_proj"],
                a["campos"], a["tanfov"], SIZE, SIZE, jnp.ones(3),
                tile=32, max_tiles=12,
            )
            return jnp.sum(out.image * wr) + jnp.sum(out.alpha)

        g1 = jax.grad(loss_single, argnums=(0, 1, 2, 3, 4))(
            xyz, scale, quat, op, shs
        )
        g2 = jax.jit(jax.grad(loss_sharded, argnums=(0, 1, 2, 3, 4)))(
            xyz, scale, quat, op, shs
        )
        for a_, b_ in zip(g1, g2):
            a_, b_ = np.asarray(a_), np.asarray(b_)
            mag = np.abs(a_).max() + 1e-6
            np.testing.assert_allclose(a_, b_, atol=1e-4 * mag, rtol=1e-3)
