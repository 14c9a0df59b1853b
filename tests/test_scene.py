"""Scene-state tests: init, Adam, density control, opacity reset, PLY I/O."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamgaussian_tpu.scene import (
    accumulate_stats,
    adam_init,
    adam_update,
    densify_and_prune,
    expon_lr,
    init_random,
    load_ply,
    num_alive,
    prune_only,
    reset_opacity,
    save_ply,
)
from dreamgaussian_tpu.scene.gaussians import from_arrays, inverse_sigmoid


def small_scene(num=64, cap=256, seed=0):
    return init_random(jax.random.PRNGKey(seed), num_pts=num, capacity=cap)


class TestInit:
    def test_shapes_and_mask(self):
        params, aux = small_scene()
        assert params["xyz"].shape == (256, 3)
        assert params["f_dc"].shape == (256, 1, 3)
        assert params["f_rest"].shape == (256, 0, 3)
        assert int(num_alive(aux)) == 64

    def test_init_statistics(self):
        params, aux = init_random(jax.random.PRNGKey(1), num_pts=2000, capacity=2048)
        alive = np.asarray(aux.alive)
        xyz = np.asarray(params["xyz"])[alive]
        r = np.linalg.norm(xyz, axis=1)
        assert r.max() <= 0.5 + 1e-5
        # Uniform ball: median radius = 0.5 * cbrt(0.5) ~ 0.397.
        assert abs(np.median(r) - 0.5 * 0.5 ** (1 / 3)) < 0.02
        op = 1 / (1 + np.exp(-np.asarray(params["opacity"])[alive]))
        np.testing.assert_allclose(op, 0.1, atol=1e-6)
        # Scales: log sqrt(mean 3-NN dist^2), isotropic.
        s = np.asarray(params["scaling"])[alive]
        assert np.allclose(s[:, 0], s[:, 1])
        assert np.isfinite(s).all()

    def test_from_arrays_colors(self):
        xyz = np.random.default_rng(0).normal(size=(32, 3)).astype(np.float32)
        rgb = np.full((32, 3), 0.5, np.float32)
        params, aux = from_arrays(xyz, rgb, capacity=64)
        np.testing.assert_allclose(np.asarray(params["f_dc"])[:32], 0.0, atol=1e-6)


class TestAdam:
    def test_matches_torch_adam(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(0)
        p0 = rng.normal(size=(8, 3)).astype(np.float32)
        params = {"xyz": jnp.asarray(p0)}
        state = adam_init(params)
        tp = torch.nn.Parameter(torch.tensor(p0))
        topt = torch.optim.Adam([tp], lr=1e-2, eps=1e-15)
        for i in range(5):
            g = rng.normal(size=(8, 3)).astype(np.float32)
            params, state = adam_update(
                params, {"xyz": jnp.asarray(g)}, state, {"xyz": 1e-2}
            )
            tp.grad = torch.tensor(g)
            topt.step()
        np.testing.assert_allclose(
            np.asarray(params["xyz"]), tp.detach().numpy(), rtol=1e-5, atol=1e-6
        )

    def test_expon_lr_schedule(self):
        # Reference defaults: init 1e-3*10, final 2e-5*10, delay_mult .02,
        # max_steps 500.
        fn = expon_lr(1e-2, 2e-4, lr_delay_steps=0, lr_delay_mult=0.02, max_steps=500)
        assert abs(float(fn(0)) - 1e-2) < 1e-9
        assert abs(float(fn(500)) - 2e-4) < 1e-9
        mid = float(fn(250))
        assert 2e-4 < mid < 1e-2
        assert abs(mid - np.exp(0.5 * (np.log(1e-2) + np.log(2e-4)))) < 1e-7


class TestDensify:
    def test_clone_small_high_grad(self):
        params, aux = small_scene()
        n0 = int(num_alive(aux))
        # Small scales (< percent_dense*extent = 0.04) + high grad => clone.
        params = dict(params)
        params["scaling"] = jnp.full_like(params["scaling"], jnp.log(0.01))
        aux = aux._replace(
            grad_accum=jnp.where(aux.alive, 1.0, 0.0),
            denom=jnp.where(aux.alive, 1.0, 0.0),
        )
        adam = adam_init(params)
        p2, a2, x2, _ = densify_and_prune(
            params, adam, aux, jax.random.PRNGKey(0), grad_threshold=0.01
        )
        assert int(num_alive(x2)) == 2 * n0
        # Clones: originals survive in place with identical params.
        assert np.asarray(x2.alive)[:n0].all()
        np.testing.assert_allclose(
            np.asarray(p2["xyz"])[:n0], np.asarray(params["xyz"])[:n0]
        )
        # Stats reset.
        assert float(jnp.sum(x2.grad_accum)) == 0.0

    def test_split_large_high_grad(self):
        params, aux = small_scene()
        n0 = int(num_alive(aux))
        # Make gaussians large so they split: scale > percent_dense*extent.
        params = dict(params)
        params["scaling"] = jnp.where(
            aux.alive[:, None], jnp.log(0.1), params["scaling"]
        )
        aux = aux._replace(
            grad_accum=jnp.where(aux.alive, 1.0, 0.0),
            denom=jnp.where(aux.alive, 1.0, 0.0),
        )
        p2, a2, x2, _ = densify_and_prune(
            params, adam_init(params), aux, jax.random.PRNGKey(0)
        )
        # Each original splits into 2 children, original pruned.
        assert int(num_alive(x2)) == 2 * n0
        alive = np.asarray(x2.alive)
        s = np.asarray(p2["scaling"])[alive]
        np.testing.assert_allclose(np.exp(s), 0.1 / 1.6, rtol=1e-5)

    def test_prune_low_opacity(self):
        params, aux = small_scene()
        n0 = int(num_alive(aux))
        params = dict(params)
        # Half the alive gaussians get near-zero opacity.
        kill = (jnp.arange(256) % 2 == 0) & aux.alive
        params["opacity"] = jnp.where(
            kill[:, None], inverse_sigmoid(jnp.asarray(0.001)), params["opacity"]
        )
        p2, a2, x2, _ = densify_and_prune(
            params, adam_init(params), aux, jax.random.PRNGKey(0)
        )
        assert int(num_alive(x2)) == n0 - int(jnp.sum(kill))

    def test_capacity_overflow_drops_extras(self):
        params, aux = init_random(jax.random.PRNGKey(0), num_pts=60, capacity=64)
        aux = aux._replace(
            grad_accum=jnp.where(aux.alive, 1.0, 0.0),
            denom=jnp.where(aux.alive, 1.0, 0.0),
        )
        p2, a2, x2, _ = densify_and_prune(
            params, adam_init(params), aux, jax.random.PRNGKey(0)
        )
        assert int(num_alive(x2)) == 64  # filled, no overflow error

    def test_moments_zeroed_for_new_slots(self):
        params, aux = small_scene()
        # Force the clone path so originals survive in place.
        params = dict(params)
        params["scaling"] = jnp.full_like(params["scaling"], jnp.log(0.01))
        adam = adam_init(params)
        # Fake nonzero moments everywhere.
        adam = adam._replace(
            mu={k: jnp.ones_like(v) for k, v in adam.mu.items()},
            nu={k: jnp.ones_like(v) for k, v in adam.nu.items()},
        )
        aux2 = aux._replace(
            grad_accum=jnp.where(aux.alive, 1.0, 0.0),
            denom=jnp.where(aux.alive, 1.0, 0.0),
        )
        p2, a2, x2, _ = densify_and_prune(
            params, adam, aux2, jax.random.PRNGKey(0)
        )
        new_slots = np.asarray(x2.alive) & ~np.asarray(aux.alive)
        assert new_slots.any()
        assert np.all(np.asarray(a2.mu["xyz"])[new_slots] == 0.0)
        # Surviving originals keep moments.
        kept = np.asarray(aux.alive) & np.asarray(x2.alive)
        assert np.all(np.asarray(a2.mu["xyz"])[kept] == 1.0)

    def test_prune_only_uses_live_radii(self):
        params, aux = small_scene()
        aux = aux._replace(
            max_radii2d=jnp.where(aux.alive, 5.0, 0.0)
        )
        p2, a2, x2 = prune_only(
            params, adam_init(params), aux, max_screen_size=1.0
        )
        assert int(num_alive(x2)) == 0


class TestResetOpacity:
    def test_clamps_and_zeroes_moments(self):
        params, aux = small_scene()
        adam = adam_init(params)
        adam = adam._replace(mu={**adam.mu, "opacity": jnp.ones_like(adam.mu["opacity"])})
        p2, a2 = reset_opacity(params, adam)
        op = jax.nn.sigmoid(p2["opacity"])
        assert float(jnp.max(op)) <= 0.01 + 1e-6
        assert float(jnp.sum(jnp.abs(a2.mu["opacity"]))) == 0.0


class TestStats:
    def test_accumulate(self):
        params, aux = small_scene()
        g = jnp.ones((256, 2)) * 3.0
        radii = jnp.where(aux.alive, 2, 0).astype(jnp.int32)
        aux2 = accumulate_stats(aux, g, radii)
        alive = np.asarray(aux.alive)
        np.testing.assert_allclose(
            np.asarray(aux2.grad_accum)[alive], np.sqrt(18.0), rtol=1e-6
        )
        assert np.all(np.asarray(aux2.denom)[alive] == 1.0)
        assert np.all(np.asarray(aux2.max_radii2d)[alive] == 2.0)
        assert np.all(np.asarray(aux2.denom)[~alive] == 0.0)


class TestPlyIO:
    def test_roundtrip(self, tmp_path):
        params, aux = small_scene()
        path = str(tmp_path / "gs.ply")
        n = save_ply(path, params, aux)
        assert n == 64
        p2, a2, deg = load_ply(path)
        assert deg == 0
        alive0 = np.asarray(aux.alive)
        alive2 = np.asarray(a2.alive)
        assert alive2.sum() == 64
        for k in params:
            np.testing.assert_allclose(
                np.asarray(p2[k])[alive2],
                np.asarray(params[k])[alive0],
                atol=1e-6,
                err_msg=k,
            )

    def test_reference_compatible_header(self, tmp_path):
        params, aux = small_scene()
        path = str(tmp_path / "gs.ply")
        save_ply(path, params, aux)
        header = open(path, "rb").read(600).decode("latin1")
        for field in ("x", "y", "z", "nx", "f_dc_0", "f_dc_2", "opacity",
                      "scale_0", "rot_3"):
            assert f"property float {field}" in header
