"""Guidance-layer tests: scheduler math, SDS loss semantics, UNet/VAE shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamgaussian_tpu.guidance.scheduler import DDIMScheduler
from dreamgaussian_tpu.guidance.sds import (
    Backbone,
    StableDiffusionGuidance,
    Zero123Guidance,
    anneal_t,
    mvdream_camera,
    sds_grad_loss,
    zero123_cam_embed,
)
from dreamgaussian_tpu.guidance.unet import (
    TinyUNet,
    UNet,
    UNetConfig,
    timestep_embedding,
)
from dreamgaussian_tpu.guidance.vae import AutoencoderKL, VAEConfig


class TestScheduler:
    def test_alphas_monotone(self):
        s = DDIMScheduler()
        a = np.asarray(s.alphas_cumprod)
        assert a.shape == (1000,)
        assert (np.diff(a) < 0).all()
        assert 0.99 < a[0] < 1.0
        assert a[-1] < 0.01

    def test_add_noise_limits(self):
        s = DDIMScheduler()
        x = jnp.ones((2, 4, 4, 4))
        n = jnp.zeros_like(x)
        near_clean = s.add_noise(x, n, jnp.array([0, 0]))
        np.testing.assert_allclose(near_clean, np.sqrt(np.asarray(
            s.alphas_cumprod[0])), rtol=1e-5)

    def test_ddim_step_recovers_x0_at_eta0(self):
        """From x_t with the TRUE eps, a DDIM step moves toward x0."""
        s = DDIMScheduler()
        s.set_timesteps(50)
        key = jax.random.PRNGKey(0)
        x0 = jax.random.normal(key, (1, 8, 8, 4))
        t = int(s.timesteps[10])
        eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        xt = s.add_noise(x0, eps, jnp.array([t]))
        x_prev = s.step(eps, t, xt)
        # exact DDIM with true eps lands on q(x_{t-dt}|x0) mean.
        t_prev = t - 1000 // 50
        expect = (
            jnp.sqrt(s.alphas_cumprod[t_prev]) * x0
            + jnp.sqrt(1 - s.alphas_cumprod[t_prev]) * eps
        )
        np.testing.assert_allclose(x_prev, expect, atol=1e-4)

    def test_anneal_t(self):
        assert int(anneal_t(0.0, 1000, 20, 980)) == 980
        assert int(anneal_t(1.0, 1000, 20, 980)) == 20
        assert int(anneal_t(0.5, 1000, 20, 980)) == 500


class TestSDSLoss:
    def test_gradient_equals_grad(self):
        """d(sds_loss)/d(latents) == grad  (the SDS trick)."""
        key = jax.random.PRNGKey(0)
        latents = jax.random.normal(key, (2, 4, 4, 4))
        grad = jax.random.normal(jax.random.PRNGKey(1), latents.shape)

        g = jax.grad(lambda z: sds_grad_loss(z, grad, divide_by_batch=False))(
            latents
        )
        np.testing.assert_allclose(g, grad, atol=1e-6)

    def test_batch_division(self):
        latents = jnp.ones((4, 2, 2, 4))
        grad = jnp.ones_like(latents)
        a = sds_grad_loss(latents, grad, True)
        b = sds_grad_loss(latents, grad, False)
        np.testing.assert_allclose(float(b), float(a) * 4)


class TestCameraEmbeds:
    def test_zero123_embed(self):
        e = zero123_cam_embed(
            jnp.array([30.0]), jnp.array([90.0]), jnp.array([0.5])
        )
        np.testing.assert_allclose(
            np.asarray(e[0]),
            [np.deg2rad(30), 1.0, np.cos(np.deg2rad(90)), 0.5],
            atol=1e-6,
        )

    def test_zero123_stable_variant(self):
        e = zero123_cam_embed(
            jnp.array([30.0]), jnp.array([0.0]), jnp.array([0.5]),
            default_elevation=10.0, stable=True,
        )
        np.testing.assert_allclose(float(e[0, 3]), np.deg2rad(100.0), atol=1e-6)

    def test_mvdream_camera_normalized(self):
        from dreamgaussian_tpu.utils.camera import orbit_camera

        poses = np.stack([orbit_camera(0, h, 2.0) for h in (0, 90)], axis=0)
        cam = mvdream_camera(jnp.asarray(poses))
        assert cam.shape == (2, 16)
        t = np.asarray(cam).reshape(2, 4, 4)[:, :3, 3]
        np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1.0, atol=1e-5)


def tiny_backbone(latent_size=8, image_size=64, in_ch=4, ctx_dim=32):
    """TinyUNet-based backbone: latents are 8x-downsampled mean pools."""
    unet = TinyUNet(channels=16, context_dim=ctx_dim, out_channels=4)
    key = jax.random.PRNGKey(0)
    uparams = unet.init(
        key, jnp.zeros((1, latent_size, latent_size, in_ch)),
        jnp.zeros((1,)), jnp.zeros((1, 2, ctx_dim)),
    )

    def unet_apply(x, t, ctx, **kw):
        return unet.apply(uparams, x, t, ctx)

    def vae_encode(imgs):
        b, h, w, c = imgs.shape
        f = h // latent_size
        lat = imgs.reshape(b, latent_size, f, latent_size, f, c).mean((2, 4))
        return jnp.concatenate([lat, lat[..., :1]], axis=-1)  # 4 channels

    def vae_decode(z):
        b = z.shape[0]
        return jax.image.resize(
            z[..., :3], (b, image_size, image_size, 3), "nearest"
        )

    return Backbone(unet_apply, vae_encode, vae_decode, DDIMScheduler(),
                    latent_size)


class TestSDGuidance:
    def test_loss_and_grads_flow_to_images(self):
        bk = tiny_backbone()
        emb = {k: np.random.default_rng(0).normal(size=(2, 32)).astype(np.float32)
               for k in ("pos", "neg", "front", "side", "back")}
        g = StableDiffusionGuidance(bk, emb, image_size=64)
        fn = g.guidance_fn()
        images = jnp.full((2, 32, 32, 3), 0.5)
        cond = {"hors": jnp.array([0.0, 100.0])}

        loss, grads = jax.value_and_grad(
            lambda im: fn(im, cond, 0.5, jax.random.PRNGKey(0))
        )(images)
        assert np.isfinite(float(loss))
        assert float(jnp.max(jnp.abs(grads))) > 0

    def test_refine_returns_images(self):
        bk = tiny_backbone()
        emb = {k: np.zeros((2, 32), np.float32) for k in ("pos", "neg")}
        g = StableDiffusionGuidance(bk, emb, image_size=64)
        out = g.refine(jnp.full((1, 32, 32, 3), 0.5), jax.random.PRNGKey(0),
                       steps=4, strength=0.5)
        assert out.shape == (1, 64, 64, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestZero123Guidance:
    def test_loss_runs_with_8ch_unet(self):
        bk = tiny_backbone(in_ch=8)
        rng = np.random.default_rng(0)
        g = Zero123Guidance(
            bk,
            clip_emb=rng.normal(size=(1, 24)).astype(np.float32),
            vae_latent=rng.normal(size=(1, 8, 8, 4)).astype(np.float32),
            cam_proj=(
                rng.normal(size=(28, 32)).astype(np.float32) * 0.1,
                np.zeros(32, np.float32),
            ),
            image_size=64,
        )
        fn = g.guidance_fn()
        images = jnp.full((1, 32, 32, 3), 0.5)
        cond = {
            "vers": jnp.array([10.0]),
            "hors": jnp.array([45.0]),
            "radii": jnp.array([0.0]),
        }
        loss, grads = jax.value_and_grad(
            lambda im: fn(im, cond, 0.5, jax.random.PRNGKey(0))
        )(images)
        assert np.isfinite(float(loss))
        assert float(jnp.max(jnp.abs(grads))) > 0


class TestFullArchitectures:
    """Shape/smoke tests of the full UNet/VAE at shrunken configs."""

    def test_sd_unet_tiny_config(self):
        cfg = UNetConfig(
            block_out_channels=(8, 16), layers_per_block=1,
            cross_attention_dim=16, attention_head_dim=4,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        )
        unet = UNet(cfg)
        x = jnp.zeros((2, 16, 16, 4))
        t = jnp.array([1.0, 500.0])
        ctx = jnp.zeros((2, 7, 16))
        params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
        out = unet.apply(params, x, t, ctx)
        assert out.shape == (2, 16, 16, 4)

    def test_zero123_unet_8ch(self):
        cfg = UNetConfig(
            in_channels=8, block_out_channels=(8, 16), layers_per_block=1,
            cross_attention_dim=16, num_attention_heads=2,
            use_linear_projection=False,
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        )
        unet = UNet(cfg)
        x = jnp.zeros((2, 16, 16, 8))
        t = jnp.array([1.0, 2.0])
        ctx = jnp.zeros((2, 1, 16))
        params = unet.init(jax.random.PRNGKey(0), x, t, ctx)
        assert unet.apply(params, x, t, ctx).shape == (2, 16, 16, 4)

    def test_multiview_attention_couples_views(self):
        """With num_views=2, view 0's output must depend on view 1's input."""
        cfg = UNetConfig(
            block_out_channels=(8,), layers_per_block=1,
            cross_attention_dim=16, attention_head_dim=4,
            down_block_types=("CrossAttnDownBlock2D",),
            up_block_types=("CrossAttnUpBlock2D",),
            num_views=2,
        )
        unet = UNet(cfg)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 8, 8, 4))
        t = jnp.zeros((2,))
        ctx = jnp.zeros((2, 3, 16))
        params = unet.init(key, x, t, ctx)
        out_a = unet.apply(params, x, t, ctx)
        x2 = x.at[1].add(1.0)
        out_b = unet.apply(params, x2, t, ctx)
        # view 0 changed because view 1 changed => joint attention works.
        assert float(jnp.max(jnp.abs(out_b[0] - out_a[0]))) > 1e-6

    def test_vae_roundtrip_shapes(self):
        cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1)
        vae = AutoencoderKL(cfg)
        x = jnp.zeros((1, 32, 32, 3))
        params = vae.init(jax.random.PRNGKey(0), x)
        z = vae.apply(params, x, method=vae.encode)
        assert z.shape == (1, 16, 16, 4)  # 2 downsamples
        out = vae.apply(params, z, method=vae.decode)
        assert out.shape == (1, 32, 32, 3)

    def test_timestep_embedding_matches_formula(self):
        emb = timestep_embedding(jnp.array([0.0]), 8)
        np.testing.assert_allclose(
            np.asarray(emb[0]), [1, 1, 1, 1, 0, 0, 0, 0], atol=1e-6
        )


class TestImageDreamGuidance:
    def test_5view_padding_and_loss(self):
        from dreamgaussian_tpu.guidance.sds import ImageDreamGuidance

        bk = tiny_backbone()
        rng = np.random.default_rng(0)

        seen_batches = {}

        def unet_apply(x, t, ctx, camera=None, ip=None, ip_img=None):
            seen_batches["b"] = x.shape[0]
            seen_batches["camera"] = camera
            seen_batches["t"] = t
            assert camera is not None and ip is not None and ip_img is not None
            return bk.unet_apply(x, t, ctx[..., :32])

        bk2 = bk._replace(unet_apply=unet_apply)
        g = ImageDreamGuidance(
            bk2,
            embeddings={"pos": rng.normal(size=(2, 32)).astype(np.float32),
                        "neg": np.zeros((2, 32), np.float32)},
            image_embeddings={
                "pos": rng.normal(size=(5, 16)).astype(np.float32),
                "ip_img": rng.normal(size=(8, 8, 4)).astype(np.float32),
            },
            image_size=64,
        )
        from dreamgaussian_tpu.utils.camera import orbit_camera

        poses = np.stack([orbit_camera(0, h, 2.0) for h in (0, 90, 180, -90)])
        images = jnp.full((4, 32, 32, 3), 0.5)
        cond = {"poses": jnp.asarray(poses)}
        fn = g.guidance_fn()
        loss, grads = jax.value_and_grad(
            lambda im: fn(im, cond, 0.5, jax.random.PRNGKey(0))
        )(images)
        assert np.isfinite(float(loss))
        assert float(jnp.max(jnp.abs(grads))) > 0
        # UNet saw 2 * (4+1) views (CFG doubling + extra view)
        assert seen_batches["b"] == 10
        # RAW 16-dim camera, zero-padded extra view
        # (imagedream_utils.py:162-165)...
        cam = np.asarray(seen_batches["camera"]).reshape(2, 5, 16)
        assert np.abs(cam[:, 4]).max() == 0.0
        assert np.abs(cam[:, :4]).max() > 0.0
        # ...and t REPEATED into the extra view (:184-185), not zeroed.
        t5 = np.asarray(seen_batches["t"]).reshape(2, 5)
        np.testing.assert_array_equal(t5[:, 4], t5[:, 0])
        assert t5.min() > 0


class TestFusedRefine:
    """The fused (single-jit, traced-strength) refine loops match the
    eager per-step loops exactly for the same PRNG key."""

    def _poses(self):
        from dreamgaussian_tpu.utils.camera import orbit_camera

        return jnp.asarray(
            np.stack([orbit_camera(0, h, 2.0) for h in (0, 90, 180, -90)])
        )

    def test_zero123_fused_matches_eager(self):
        from dreamgaussian_tpu.guidance.fake import fake_zero123_guidance

        g = fake_zero123_guidance()
        key = jax.random.PRNGKey(3)
        imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
        cond = {"vers": jnp.zeros(1), "hors": jnp.zeros(1),
                "radii": jnp.zeros(1)}
        fn, gp = g.refine_args(steps=50)
        for strength in (0.8, 0.92):
            eager = g.refine(imgs, cond["vers"], cond["hors"], cond["radii"],
                             key, strength=strength, steps=50)
            fused = fn(imgs, cond, strength, key, gp)
            np.testing.assert_allclose(
                np.asarray(fused), np.asarray(eager), atol=1e-5
            )

    def test_sd_fused_matches_eager(self):
        from dreamgaussian_tpu.guidance.fake import fake_sd_guidance

        g = fake_sd_guidance()
        key = jax.random.PRNGKey(4)
        imgs = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
        eager = g.refine(imgs, key, strength=0.85, steps=50,
                         hors=np.zeros(1))
        fn, gp = g.refine_args(steps=50)
        fused = fn(imgs, {"hors": jnp.zeros(1)}, 0.85, key, gp)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(eager), atol=1e-5
        )

    def test_mvdream_fused_matches_eager(self):
        from dreamgaussian_tpu.guidance.fake import fake_mvdream_guidance

        g = fake_mvdream_guidance()
        key = jax.random.PRNGKey(5)
        imgs = jax.random.uniform(jax.random.PRNGKey(2), (4, 64, 64, 3))
        poses = self._poses()
        eager = g.refine(imgs, poses, key, strength=0.85, steps=50)
        fn, gp = g.refine_args(steps=50)
        fused = fn(imgs, {"poses": poses}, 0.85, key, gp)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(eager), atol=1e-5
        )

    def test_imagedream_fused_matches_eager(self):
        from dreamgaussian_tpu.guidance.fake import fake_imagedream_guidance

        g = fake_imagedream_guidance()
        key = jax.random.PRNGKey(6)
        imgs = jax.random.uniform(jax.random.PRNGKey(2), (4, 64, 64, 3))
        poses = self._poses()
        eager = g.refine(imgs, poses, key, strength=0.85, steps=50)
        fn, gp = g.refine_args(steps=50)
        fused = fn(imgs, {"poses": poses}, 0.85, key, gp)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(eager), atol=1e-5
        )

    def test_one_compile_covers_all_strengths(self):
        """strength is traced: different values must NOT retrace."""
        from dreamgaussian_tpu.guidance.fake import fake_zero123_guidance

        g = fake_zero123_guidance()
        fn, gp = g.refine_args(steps=50)
        imgs = jnp.full((1, 64, 64, 3), 0.5)
        cond = {"vers": jnp.zeros(1), "hors": jnp.zeros(1),
                "radii": jnp.zeros(1)}
        key = jax.random.PRNGKey(0)
        fn(imgs, cond, 0.8, key, gp)
        n0 = fn._cache_size()
        fn(imgs, cond, 0.81, key, gp)
        fn(imgs, cond, 0.95, key, gp)
        assert fn._cache_size() == n0


class TestSampleFn:
    """Pure-noise samplers (the reference's standalone guidance demos)."""

    def _poses(self):
        from dreamgaussian_tpu.utils.camera import orbit_camera

        return jnp.asarray(
            np.stack([orbit_camera(0, h, 2.0) for h in (0, 90, 180, -90)])
        )

    def test_sd_sample_shape_and_range(self):
        from dreamgaussian_tpu.guidance.fake import fake_sd_guidance

        g = fake_sd_guidance()
        fn = g.sample_fn(steps=8)
        out = np.asarray(fn(jax.random.PRNGKey(0)))
        assert out.shape == (1, 64, 64, 3)
        assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1

    def test_sd_sample_deterministic_per_key(self):
        from dreamgaussian_tpu.guidance.fake import fake_sd_guidance

        g = fake_sd_guidance()
        fn = g.sample_fn(steps=6)
        a = np.asarray(fn(jax.random.PRNGKey(1)))
        b = np.asarray(fn(jax.random.PRNGKey(1)))
        c = np.asarray(fn(jax.random.PRNGKey(2)))
        np.testing.assert_array_equal(a, b)
        assert np.abs(a - c).max() > 0

    def test_sample_walks_full_chain(self):
        """The sampler must start at the LARGEST timestep (pure noise)
        and consume every step: a 1-step and an 8-step sample from the
        same key must differ (they share only the final t=0-ish step)."""
        from dreamgaussian_tpu.guidance.fake import fake_sd_guidance

        g = fake_sd_guidance()
        one = np.asarray(g.sample_fn(steps=1)(jax.random.PRNGKey(3)))
        many = np.asarray(g.sample_fn(steps=8)(jax.random.PRNGKey(3)))
        assert np.abs(one - many).max() > 1e-6

    def test_mvdream_sample_4views(self):
        from dreamgaussian_tpu.guidance.fake import fake_mvdream_guidance

        g = fake_mvdream_guidance()
        fn = g.sample_fn(steps=6)
        out = np.asarray(fn(self._poses(), jax.random.PRNGKey(0)))
        assert out.shape == (4, 64, 64, 3)
        assert np.isfinite(out).all()

    def test_imagedream_sample_4views(self):
        from dreamgaussian_tpu.guidance.fake import fake_imagedream_guidance

        g = fake_imagedream_guidance()
        fn = g.sample_fn(steps=6)
        out = np.asarray(fn(self._poses(), jax.random.PRNGKey(0)))
        assert out.shape == (4, 64, 64, 3)
        assert np.isfinite(out).all()
