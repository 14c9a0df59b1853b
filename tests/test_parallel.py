"""Multi-device data-parallel training tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamgaussian_tpu.parallel import make_data_mesh, make_dp_train_step
from dreamgaussian_tpu.parallel.dp import shard_cameras
from dreamgaussian_tpu.scene import adam_init, init_random
from dreamgaussian_tpu.utils.camera import Camera, orbit_camera, stack_cameras


def make_views(n, size=32, fov=0.857):
    cams = []
    for i in range(n):
        pose = orbit_camera(10.0, 360.0 * i / n - 180.0, 2.0)
        cams.append(Camera.from_pose(pose, size, size, fov, fov))
    return stack_cameras(cams)


def fake_guidance(images, cond, step_ratio, key):
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


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_data_mesh(8)


class TestDP:
    def test_step_runs_and_replicates(self, mesh):
        params, aux = init_random(jax.random.PRNGKey(0), num_pts=128,
                                  capacity=256)
        adam = adam_init(params)
        step_fn = make_dp_train_step(
            mesh, novel_size=32, ref_size=32, sh_degree=0,
            views_per_device=1, use_known_view=True, warmup_rgb_loss=False,
            lr_schedules=LRS, guidance_fns=((1.0, fake_guidance),),
        )
        novel = shard_cameras(mesh, make_views(8))
        known = {k: jnp.asarray(v) for k, v in
                 Camera.from_pose(orbit_camera(0, 0, 2.0), 32, 32, 0.857,
                                  0.857).arrays().items()}
        ref_rgb = jnp.ones((32, 32, 3)) * 0.5
        ref_mask = jnp.ones((32, 32))
        p2, a2, x2, metrics = step_fn(
            params, adam, aux, jnp.float32(1.0), known, novel,
            jnp.ones(3), ref_rgb, ref_mask, jax.random.PRNGKey(1), {},
        )
        loss = metrics["loss"]
        assert np.isfinite(float(loss))
        assert int(metrics["overflow"]) == 0
        # Params changed and are fully replicated (single logical value).
        assert not np.allclose(np.asarray(p2["xyz"]), np.asarray(params["xyz"]))
        assert float(jnp.sum(x2.denom)) > 0

    def test_matches_single_device_gradient_math(self, mesh):
        """DP psum over 8x1 views == single-device step over the same 8 views."""
        from dreamgaussian_tpu.train.stage1 import make_train_step

        params, aux = init_random(jax.random.PRNGKey(0), num_pts=128,
                                  capacity=256)
        adam = adam_init(params)
        views = make_views(8)
        known_cam = Camera.from_pose(orbit_camera(0, 0, 2.0), 32, 32,
                                     0.857, 0.857)
        known = {k: jnp.asarray(v) for k, v in known_cam.arrays().items()}
        ref_rgb = jnp.ones((32, 32, 3)) * 0.5
        ref_mask = jnp.ones((32, 32))
        key = jax.random.PRNGKey(7)

        dp_fn = make_dp_train_step(
            mesh, novel_size=32, ref_size=32, sh_degree=0,
            views_per_device=1, use_known_view=True, warmup_rgb_loss=False,
            lr_schedules=LRS, guidance_fns=((1.0, fake_guidance),),
        )
        p_dp, _, _, m_dp = dp_fn(
            params, adam, aux, jnp.float32(1.0), known,
            shard_cameras(mesh, views), jnp.ones(3), ref_rgb, ref_mask,
            key, {},
        )
        loss_dp = m_dp["loss"]

        single_fn = make_train_step(
            novel_size=32, n_novel=8, ref_size=32, sh_degree=0,
            use_known_view=True, warmup_rgb_loss=False, lr_schedules=LRS,
            guidance_fns=((1.0, fake_guidance),),
        )
        p_s, _, _, m_s = single_fn(
            params, adam, aux, jnp.float32(1.0), known,
            {k: jnp.asarray(v) for k, v in views.items()},
            jnp.ones(3), ref_rgb, ref_mask, key, {}, jnp.asarray(True),
        )
        loss_s = m_s["loss"]
        np.testing.assert_allclose(float(loss_dp), float(loss_s), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(p_dp["xyz"]), np.asarray(p_s["xyz"]), atol=1e-5
        )


class TestMeshTrainer:
    """Stage1Trainer with a mesh runs the production shard_map'd scan."""

    def _mk(self, mesh, seed=0, **over):
        import sys
        sys.path.insert(0, "tests")
        from test_stage1 import make_target, tiny_opt

        from dreamgaussian_tpu.train import Stage1Trainer

        rgb, mask = make_target(64)
        kw = dict(
            ref_size=64, novel_resolutions=[64, 64, 64], batch_size=8,
            iters=12, density_start_iter=1000,
        )
        kw.update(over)
        opt = tiny_opt(**kw)
        return Stage1Trainer(
            opt, ref_rgb=rgb, ref_mask=mask,
            guidance_fns=((1.0, fake_guidance),), capacity=512, seed=seed,
            mesh=mesh,
        )

    def test_matches_single_device_params(self, mesh):
        """DP-scan trainer == single-device-scan trainer after 6 steps
        WITH density control active (same seed => same cameras/keys).
        DP's densify stats are masked to the globally-last view exactly
        like single-device (the reference's last-view quirk), so the
        decisions match and this no longer needs densify disabled
        (VERDICT r4 next-#6)."""
        kw = dict(density_start_iter=1, density_end_iter=10,
                  densification_interval=3, opacity_reset_interval=5)
        tr_dp = self._mk(mesh, **kw)
        tr_sd = self._mk(None, **kw)
        l_dp = tr_dp.train_segment(6, 12)
        l_sd = tr_sd.train_segment(6, 12)
        np.testing.assert_allclose(
            np.asarray(l_dp), np.asarray(l_sd), rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(tr_dp.params["xyz"]), np.asarray(tr_sd.params["xyz"]),
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(tr_dp.aux.alive), np.asarray(tr_sd.aux.alive)
        )

    def test_densify_inside_mesh_scan(self, mesh):
        """Densify/reset flags fire inside the sharded scan; params stay
        replicated and finite."""
        tr = self._mk(mesh, density_start_iter=1, density_end_iter=10,
                      densification_interval=3, opacity_reset_interval=5)
        losses = tr.train_segment(8, 12)
        assert np.isfinite(np.asarray(losses)).all()
        # train_step routes through the same machinery at k=1
        loss = tr.train_step()
        assert np.isfinite(float(np.asarray(loss)))
        assert tr.step == 9

    def test_mesh_with_tile_axis(self):
        from jax.sharding import Mesh

        devs = np.array(jax.devices()[:8]).reshape(4, 2)
        mesh2d = Mesh(devs, ("data", "tile"))
        tr = self._mk(mesh2d)
        losses = tr.train_segment(3, 12)
        assert np.isfinite(np.asarray(losses)).all()


class TestMeshHostSplitDensify:
    """Mesh mode with in_scan_densify=False (the TPU default — the
    in-scan lax.cond + real guidance scan body faults the real TPU
    backend, see make_train_scan) splits segments host-side and must
    match the single-device host-split trainer exactly."""

    def test_mesh_hostsplit_matches_single_device(self, mesh):
        import sys
        sys.path.insert(0, "tests")
        from test_stage1 import make_target, tiny_opt
        from dreamgaussian_tpu.train import Stage1Trainer

        rgb, mask = make_target(64)
        kw = dict(
            ref_size=64, novel_resolutions=[64, 64, 64], batch_size=8,
            iters=12, density_start_iter=1, density_end_iter=10,
            densification_interval=3, opacity_reset_interval=5,
            in_scan_densify=False,
        )
        mk = lambda m: Stage1Trainer(  # noqa: E731
            tiny_opt(**kw), ref_rgb=rgb, ref_mask=mask,
            guidance_fns=((1.0, fake_guidance),), capacity=512, seed=0,
            mesh=m,
        )
        tr_dp = mk(mesh)
        tr_sd = mk(None)
        assert not tr_dp.in_scan_densify  # explicit opt wins on CPU too
        l_dp = tr_dp.train_segment(8, 12)
        l_sd = tr_sd.train_segment(8, 12)
        np.testing.assert_allclose(
            np.asarray(l_dp), np.asarray(l_sd), rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(tr_dp.params["xyz"]), np.asarray(tr_sd.params["xyz"]),
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(tr_dp.aux.alive), np.asarray(tr_sd.aux.alive)
        )
        assert tr_dp.step == 8
