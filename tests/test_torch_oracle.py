"""Numerical parity: converted Flax guidance nets vs independent torch
oracles (torch_oracle.py), on synthetic checkpoints.

This closes the torch->Flax conversion risk without pretrained weights:
the synthetic state dicts (guidance/synthetic.py) have exactly the real
checkpoints' key names and tensor layouts, the torch oracle consumes them
with the torch models' semantics, and the Flax side goes through the
SAME convert.py + unet/vae/text_encoder.py path a real checkpoint would.
If these pass, loading a real checkpoint can only fail on the file
itself, not on conversion or architecture semantics.

Tiny configs exercise every pathway (3D attention, camera MLP,
IP-adapter resampler + to_k_ip/to_v_ip, conv vs linear projections,
8-ch input). The slow tier repeats at the REAL model sizes (SD 2.1-base
865M, zero123, MVDream, ImageDream) per VERDICT r2 #1.
"""

import gc

import jax.numpy as jnp
import numpy as np
import pytest
import torch

import torch_oracle as oracle
from dreamgaussian_tpu.guidance import synthetic as syn
from dreamgaussian_tpu.guidance.convert import (
    convert_ldm_unet,
    convert_ldm_vae,
    convert_open_clip_text,
    convert_unet,
    convert_vae,
)
from dreamgaussian_tpu.guidance.text_encoder import (
    OpenCLIPTextConfig,
    OpenCLIPTextEncoder,
)
from dreamgaussian_tpu.guidance.unet import (
    IMAGEDREAM_CONFIG,
    MVDREAM_CONFIG,
    SD21_CONFIG,
    ZERO123_CONFIG,
    UNet,
)
from dreamgaussian_tpu.guidance.vae import AutoencoderKL, VAEConfig

torch.manual_seed(0)


def _cmp(flax_nhwc, torch_nchw, atol, rtol=1e-4):
    a = np.asarray(flax_nhwc).transpose(0, 3, 1, 2)
    b = torch_nchw.numpy()
    assert np.abs(b).mean() > 1e-4, "oracle output degenerate (all ~0)"
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol)


def _unet_inputs(cfg, b, hw, ctx_len=7, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(b, cfg.in_channels, hw, hw)).astype(np.float32)
    t = np.linspace(2.0, 998.0, b).astype(np.float32)
    ctx = rng.normal(
        size=(b, ctx_len, cfg.cross_attention_dim)
    ).astype(np.float32)
    return x, t, ctx


def _run_flax_unet(cfg, params, x, t, ctx, **kw):
    unet = UNet(cfg)
    jkw = {
        k: jnp.asarray(v.transpose(0, 2, 3, 1) if k == "ip_img" else v)
        for k, v in kw.items()
    }
    return unet.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jnp.asarray(ctx), **jkw
    )


def _run_torch_ldm(cfg, sd, x, t, ctx, **kw):
    tkw = {k: torch.from_numpy(v) for k, v in kw.items()}
    return oracle.ldm_unet_forward(
        sd, cfg, torch.from_numpy(x), torch.from_numpy(t),
        torch.from_numpy(ctx), **tkw
    )


class TestTinyLDM:
    def test_mvdream_unet(self):
        cfg = syn.TINY_MVDREAM_CONFIG
        sd = syn.synth_ldm_unet(cfg, seed=0)
        params = convert_ldm_unet(sd, cfg)
        x, t, ctx = _unet_inputs(cfg, b=4, hw=16)
        cam = np.random.default_rng(1).normal(size=(4, 16)).astype(np.float32)
        ref = _run_torch_ldm(cfg, sd, x, t, ctx, camera=cam)
        out = _run_flax_unet(cfg, params, x, t, ctx, camera=cam)
        _cmp(out, ref, atol=2e-5)

    def test_imagedream_unet(self):
        cfg = syn.TINY_IMAGEDREAM_CONFIG
        sd = syn.synth_ldm_unet(cfg, seed=3)
        params = convert_ldm_unet(sd, cfg)
        x, t, ctx = _unet_inputs(cfg, b=5, hw=16, seed=2)
        rng = np.random.default_rng(4)
        cam = rng.normal(size=(5, 16)).astype(np.float32)
        ip = rng.normal(size=(5, 6, cfg.ip_embed_dim)).astype(np.float32)
        ip_img = rng.normal(size=(1, 4, 16, 16)).astype(np.float32)
        ref = _run_torch_ldm(cfg, sd, x, t, ctx, camera=cam, ip=ip,
                             ip_img=ip_img)
        out = _run_flax_unet(cfg, params, x, t, ctx, camera=cam,
                             ip=jnp.asarray(ip), ip_img=ip_img)
        _cmp(out, ref, atol=2e-5)

    def test_vae(self):
        cfg = syn.TINY_VAE_CONFIG
        sd = syn.synth_ldm_vae(cfg, seed=5)
        params = convert_ldm_vae(sd, cfg)
        vae = AutoencoderKL(cfg)
        rng = np.random.default_rng(6)
        x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        moments = vae.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)),
            method=vae.encode_moments,
        )
        ref_m = oracle.vae_encode_moments(sd, cfg, torch.from_numpy(x),
                                          layout="ldm")
        _cmp(moments, ref_m, atol=2e-5)

        z = rng.normal(size=(2, cfg.latent_channels, 16, 16)).astype(
            np.float32)
        dec = vae.apply(
            params,
            jnp.asarray(z.transpose(0, 2, 3, 1)) * cfg.scaling_factor,
            method=vae.decode,
        )
        ref_d = oracle.vae_decode(sd, cfg, torch.from_numpy(z), layout="ldm")
        _cmp(dec, ref_d, atol=2e-5)

    def test_text_encoder(self):
        cfg = syn.TINY_TEXT_CONFIG
        sd = syn.synth_open_clip_text(cfg, seed=7)
        params = convert_open_clip_text(sd, cfg)
        enc = OpenCLIPTextEncoder(cfg)
        ids = np.random.default_rng(8).integers(
            0, cfg.vocab_size, size=(3, cfg.context_length)
        ).astype(np.int32)
        out = enc.apply(params, jnp.asarray(ids))
        ref = oracle.open_clip_text_forward(sd, cfg, ids)
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy(), atol=2e-5, rtol=1e-4
        )


class TestTinyDiffusers:
    @pytest.mark.parametrize("cfg_name", ["sd", "zero123"])
    def test_unet(self, cfg_name):
        cfg = (syn.TINY_SD_CONFIG if cfg_name == "sd"
               else syn.TINY_ZERO123_CONFIG)
        sd = syn.synth_diffusers_unet(cfg, seed=9)
        params = convert_unet(sd, cfg)
        x, t, ctx = _unet_inputs(cfg, b=2, hw=16, seed=10)
        ref = oracle.diffusers_unet_forward(
            sd, cfg, torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx),
        )
        out = _run_flax_unet(cfg, params, x, t, ctx)
        _cmp(out, ref, atol=2e-5)

    def test_vae(self):
        cfg = syn.TINY_VAE_CONFIG
        sd = syn.synth_diffusers_vae(cfg, seed=11)
        params = convert_vae(sd, cfg)
        vae = AutoencoderKL(cfg)
        rng = np.random.default_rng(12)
        x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
        moments = vae.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)),
            method=vae.encode_moments,
        )
        ref_m = oracle.vae_encode_moments(sd, cfg, torch.from_numpy(x),
                                          layout="diffusers")
        _cmp(moments, ref_m, atol=2e-5)

        z = rng.normal(size=(2, cfg.latent_channels, 16, 16)).astype(
            np.float32)
        dec = vae.apply(
            params,
            jnp.asarray(z.transpose(0, 2, 3, 1)) * cfg.scaling_factor,
            method=vae.decode,
        )
        ref_d = oracle.vae_decode(sd, cfg, torch.from_numpy(z),
                                  layout="diffusers")
        _cmp(dec, ref_d, atol=2e-5)


@pytest.mark.slow
class TestRealSize:
    """Parity at the REAL architectures' sizes (random weights).

    These are the exact configs loader.py instantiates for the real
    checkpoints; passing here means only the checkpoint FILE is missing,
    not any conversion/architecture semantics."""

    ATOL = 1e-4

    def test_sd21(self):
        cfg = SD21_CONFIG
        sd = syn.synth_diffusers_unet(cfg, seed=20)
        params = convert_unet(sd, cfg)
        x, t, ctx = _unet_inputs(cfg, b=1, hw=32, ctx_len=77, seed=21)
        ref = oracle.diffusers_unet_forward(
            sd, cfg, torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx),
        )
        out = _run_flax_unet(cfg, params, x, t, ctx)
        _cmp(out, ref, atol=self.ATOL)
        del sd, params
        gc.collect()

    def test_zero123(self):
        cfg = ZERO123_CONFIG
        sd = syn.synth_diffusers_unet(cfg, seed=22)
        params = convert_unet(sd, cfg)
        x, t, ctx = _unet_inputs(cfg, b=1, hw=32, ctx_len=1, seed=23)
        ref = oracle.diffusers_unet_forward(
            sd, cfg, torch.from_numpy(x), torch.from_numpy(t),
            torch.from_numpy(ctx),
        )
        out = _run_flax_unet(cfg, params, x, t, ctx)
        _cmp(out, ref, atol=self.ATOL)
        del sd, params
        gc.collect()

    def test_mvdream(self):
        cfg = MVDREAM_CONFIG
        sd = syn.synth_ldm_unet(cfg, seed=24)
        params = convert_ldm_unet(sd, cfg)
        x, t, ctx = _unet_inputs(cfg, b=4, hw=32, ctx_len=77, seed=25)
        cam = np.random.default_rng(26).normal(size=(4, 16)).astype(
            np.float32)
        ref = _run_torch_ldm(cfg, sd, x, t, ctx, camera=cam)
        out = _run_flax_unet(cfg, params, x, t, ctx, camera=cam)
        _cmp(out, ref, atol=self.ATOL)
        del sd, params
        gc.collect()

    def test_imagedream(self):
        cfg = IMAGEDREAM_CONFIG
        sd = syn.synth_ldm_unet(cfg, seed=27)
        params = convert_ldm_unet(sd, cfg)
        x, t, ctx = _unet_inputs(cfg, b=5, hw=32, ctx_len=77, seed=28)
        rng = np.random.default_rng(29)
        cam = rng.normal(size=(5, 16)).astype(np.float32)
        ip = rng.normal(size=(5, 257, cfg.ip_embed_dim)).astype(np.float32)
        ip_img = rng.normal(size=(1, 4, 32, 32)).astype(np.float32)
        ref = _run_torch_ldm(cfg, sd, x, t, ctx, camera=cam, ip=ip,
                             ip_img=ip_img)
        out = _run_flax_unet(cfg, params, x, t, ctx, camera=cam,
                             ip=jnp.asarray(ip), ip_img=ip_img)
        _cmp(out, ref, atol=self.ATOL)
        del sd, params
        gc.collect()

    def test_vae(self):
        cfg = VAEConfig()  # the real SD VAE architecture
        sd = syn.synth_ldm_vae(cfg, seed=30)
        params = convert_ldm_vae(sd, cfg)
        vae = AutoencoderKL(cfg)
        x = np.random.default_rng(31).normal(size=(1, 3, 64, 64)).astype(
            np.float32)
        moments = vae.apply(
            params, jnp.asarray(x.transpose(0, 2, 3, 1)),
            method=vae.encode_moments,
        )
        ref_m = oracle.vae_encode_moments(sd, cfg, torch.from_numpy(x),
                                          layout="ldm")
        _cmp(moments, ref_m, atol=self.ATOL)
        del sd, params
        gc.collect()

    def test_text_encoder(self):
        cfg = OpenCLIPTextConfig()  # the real SD 2.1 open_clip ViT-H tower
        sd = syn.synth_open_clip_text(cfg, seed=32)
        params = convert_open_clip_text(sd, cfg)
        enc = OpenCLIPTextEncoder(cfg)
        ids = np.random.default_rng(33).integers(
            0, cfg.vocab_size, size=(2, cfg.context_length)
        ).astype(np.int32)
        out = enc.apply(params, jnp.asarray(ids))
        ref = oracle.open_clip_text_forward(sd, cfg, ids)
        np.testing.assert_allclose(
            np.asarray(out), ref.numpy(), atol=self.ATOL, rtol=1e-4
        )


class TestRefineDDIM:
    """The fused stage-2 refine (one jitted DDIM img2img tail,
    guidance/sds.py _fused_ddim_loop + Zero123Guidance.refine_fn) vs an
    independent torch re-derivation of the diffusers DDIM semantics
    (torch_oracle.ddim_img2img_refine) on a tiny synthetic checkpoint.
    This is the one guidance layer with no oracle until now (VERDICT r3
    #6): the refine IS the entire stage-2 training signal
    (/root/reference/guidance/zero123_utils.py:75-118)."""

    @pytest.mark.parametrize("strength", [0.8, 0.4])
    def test_zero123_refine_matches_torch(self, strength):
        import jax

        from dreamgaussian_tpu.guidance.loader import _backbone_from_params
        from dreamgaussian_tpu.guidance.sds import Zero123Guidance

        unet_cfg = syn.TINY_ZERO123_CONFIG
        vae_cfg = syn.TINY_VAE_CONFIG
        unet_sd = syn.synth_diffusers_unet(unet_cfg, seed=20)
        vae_sd = syn.synth_diffusers_vae(vae_cfg, seed=21)
        unet_params = convert_unet(unet_sd, unet_cfg)
        vae_params = convert_vae(vae_sd, vae_cfg)
        unet = UNet(unet_cfg)
        vae = AutoencoderKL(vae_cfg)
        image_size = 32
        factor = 2 ** (len(vae_cfg.block_out_channels) - 1)
        lat_hw = image_size // factor
        bk = _backbone_from_params(
            unet, unet_params, vae, vae_params, image_size
        )._replace(latent_size=lat_hw)

        rng = np.random.default_rng(22)
        ctx_dim = unet_cfg.cross_attention_dim
        clip_emb = rng.normal(size=(1, ctx_dim - 4)).astype(np.float32) * 0.1
        w = rng.normal(size=(ctx_dim, ctx_dim)).astype(np.float32) * 0.05
        bias = rng.normal(size=(ctx_dim,)).astype(np.float32) * 0.01
        vae_latent = rng.normal(
            size=(1, lat_hw, lat_hw, vae_cfg.latent_channels)
        ).astype(np.float32) * 0.1
        g = Zero123Guidance(
            bk, clip_emb=jnp.asarray(clip_emb),
            vae_latent=jnp.asarray(vae_latent),
            cam_proj=(jnp.asarray(w), jnp.asarray(bias)),
            image_size=image_size,
        )

        b, steps, gs = 2, 8, 5.0
        images = rng.uniform(size=(b, image_size, image_size, 3)).astype(
            np.float32)
        cond = {
            "vers": np.array([10.0, -20.0], np.float32),
            "hors": np.array([30.0, -90.0], np.float32),
            "radii": np.array([0.0, 0.1], np.float32),
        }
        key = jax.random.PRNGKey(23)
        fn = g.refine_fn(steps=steps, guidance_scale=gs)
        out = fn(jnp.asarray(images), cond, jnp.float32(strength), key)

        # torch side: same conditioning values and the SAME q-sample
        # noise draw (the RNG is jax's; the oracle checks the math chain,
        # not the PRNG), everything else independently derived.
        cc = np.asarray(g._cond_tokens(
            jnp.asarray(cond["vers"]), jnp.asarray(cond["hors"]),
            jnp.asarray(cond["radii"]), b,
        ))
        k_n, _ = jax.random.split(key)
        noise = np.asarray(jax.random.normal(
            k_n, (b, lat_hw, lat_hw, vae_cfg.latent_channels)))
        vae_emb = np.broadcast_to(
            vae_latent, (b,) + vae_latent.shape[1:]).copy()
        ref = oracle.ddim_img2img_refine(
            unet_sd, unet_cfg, vae_sd, vae_cfg,
            torch.from_numpy(images.transpose(0, 3, 1, 2)),
            torch.from_numpy(noise.transpose(0, 3, 1, 2)),
            torch.from_numpy(cc),
            torch.from_numpy(vae_emb.transpose(0, 3, 1, 2)),
            steps=steps, strength=strength, guidance_scale=gs,
        )
        _cmp(out, ref, atol=5e-4, rtol=1e-3)
