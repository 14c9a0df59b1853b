"""FakeGuidance: a tiny random-weight denoiser standing in for the real
diffusion priors.

Used by tests and by the CLI when no pretrained weights are available
(this environment has no HF cache and no egress). It exercises the exact
SDS code paths — VAE-less latent encode, scheduler noise, CFG arithmetic,
SDS loss — so the pipeline is verified end-to-end even though the
"prior" carries no semantic knowledge.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .scheduler import DDIMScheduler
from .sds import Backbone, StableDiffusionGuidance, Zero123Guidance
from .unet import TinyUNet


def _pool_encode(latent_size: int):
    def vae_encode(imgs):
        b, h, w, c = imgs.shape
        f = h // latent_size
        lat = imgs.reshape(b, latent_size, f, latent_size, f, c).mean((2, 4))
        return jnp.concatenate([lat, lat[..., :1]], axis=-1)

    return vae_encode


def _resize_decode(image_size: int):
    def vae_decode(z):
        b = z.shape[0]
        return jax.image.resize(
            z[..., :3], (b, image_size, image_size, 3), "nearest"
        )

    return vae_decode


def make_fake_backbone(
    image_size: int = 64, latent_size: int = 8, in_ch: int = 4,
    ctx_dim: int = 32, seed: int = 0,
) -> Backbone:
    unet = TinyUNet(channels=16, context_dim=ctx_dim, out_channels=4)
    params = unet.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, latent_size, latent_size, in_ch)),
        jnp.zeros((1,)),
        jnp.zeros((1, 2, ctx_dim)),
    )
    return Backbone(
        unet_apply=lambda x, t, ctx, **kw: unet.apply(params, x, t, ctx),
        vae_encode=_pool_encode(latent_size),
        vae_decode=_resize_decode(image_size),
        scheduler=DDIMScheduler(),
        latent_size=latent_size,
    )


def fake_sd_guidance(image_size: int = 64, seed: int = 0):
    bk = make_fake_backbone(image_size=image_size, seed=seed)
    rng = jax.random.PRNGKey(seed + 1)
    emb = {
        k: jax.random.normal(jax.random.fold_in(rng, i), (2, 32)) * 0.1
        for i, k in enumerate(("pos", "neg", "front", "side", "back"))
    }
    return StableDiffusionGuidance(bk, emb, image_size=image_size)


def fake_zero123_guidance(image_size: int = 64, seed: int = 0,
                          stable: bool = False, default_elevation: float = 0.0):
    bk = make_fake_backbone(image_size=image_size, in_ch=8, seed=seed)
    rng = jax.random.PRNGKey(seed + 2)
    k1, k2, k3 = jax.random.split(rng, 3)
    return Zero123Guidance(
        bk,
        clip_emb=jax.random.normal(k1, (1, 24)) * 0.1,
        vae_latent=jax.random.normal(k2, (1, 8, 8, 4)) * 0.1,
        cam_proj=(jax.random.normal(k3, (28, 32)) * 0.05, jnp.zeros(32)),
        image_size=image_size,
        stable=stable,
        default_elevation=default_elevation,
    )


def fake_mvdream_guidance(image_size: int = 64, seed: int = 0):
    import numpy as np

    from .sds import MVDreamGuidance

    bk = make_fake_backbone(image_size=image_size, seed=seed)
    rng = jax.random.PRNGKey(seed + 3)
    emb = {
        "pos": jax.random.normal(jax.random.fold_in(rng, 0), (2, 32)) * 0.1,
        "neg": jnp.zeros((2, 32)),
    }
    return MVDreamGuidance(bk, emb, image_size=image_size)


def fake_imagedream_guidance(image_size: int = 64, seed: int = 0):
    from .sds import ImageDreamGuidance

    bk = make_fake_backbone(image_size=image_size, seed=seed)
    rng = jax.random.PRNGKey(seed + 4)
    k1, k2 = jax.random.split(rng)
    return ImageDreamGuidance(
        bk,
        embeddings={"pos": jax.random.normal(k1, (2, 32)) * 0.1,
                    "neg": jnp.zeros((2, 32))},
        image_embeddings={
            "pos": jax.random.normal(k2, (5, 16)) * 0.1,
            "ip_img": jnp.zeros((8, 8, 4)),
        },
        image_size=image_size,
    )
