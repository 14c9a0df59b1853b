"""Real-ARCHITECTURE random-weight guidance backbones.

No pretrained checkpoints ship in this environment (no egress, no HF
cache), so weight-level semantics cannot be exercised here — but the
PERFORMANCE of the north-star workload (/root/reference/main.py stage 1:
zero123 SDS at 256^2 through the full UNet+VAE every iteration) depends
only on the architecture, not the weight values. This module builds the
full-size zero123 backbone (SD1.5-class UNet, 8-ch input, 320/640/1280/
1280 blocks + the full KL autoencoder) with random weights so bench.py
can measure the REAL per-iteration cost of SDS training on TPU.

The resulting guidance is numerically meaningless as a prior (like
``fake.py``) but FLOP- and memory-exact to the real thing; swapping in a
converted checkpoint via ``loader.load_zero123`` changes only the
parameter values, not the compiled program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .scheduler import DDIMScheduler
from .sds import Backbone, Zero123Guidance
from .unet import ZERO123_CONFIG, UNet
from .vae import AutoencoderKL, VAEConfig


def _init_on_device(module, *args, dtype=jnp.bfloat16, **kwargs):
    """Random-init params ON the default device, cast to ``dtype``.

    Host-side init + device_put was measured unusable on tunneled TPUs:
    3.4 GB of f32 params crawl through the tunnel on first use (>15 min).
    A jitted on-device init is one (persistently cached) compile and the
    random generation itself is microseconds of device time. bf16 params
    halve HBM and match the converted-checkpoint deployment dtype.
    """
    init = jax.jit(
        lambda key: jax.tree.map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
            module.init(key, *args, **kwargs),
        )
    )
    return init(jax.random.PRNGKey(0))


def random_zero123_backbone(image_size: int = 256,
                            dtype=jnp.bfloat16) -> Backbone:
    """Full zero123 architecture, random weights, bf16 activations."""
    import dataclasses

    latent = image_size // 8
    cfg = dataclasses.replace(ZERO123_CONFIG, dtype=dtype)
    unet = UNet(cfg)
    ctx_dim = cfg.cross_attention_dim
    unet_params = _init_on_device(
        unet,
        jnp.zeros((1, latent, latent, cfg.in_channels)),
        jnp.zeros((1,)),
        jnp.zeros((1, 1, ctx_dim)),
        dtype=dtype,
    )
    vae_cfg = VAEConfig(dtype=dtype)
    vae = AutoencoderKL(vae_cfg)
    vae_params = _init_on_device(
        vae, jnp.zeros((1, image_size, image_size, 3)), dtype=dtype
    )

    from .loader import _backbone_from_params

    return _backbone_from_params(unet, unet_params, vae, vae_params,
                                 image_size)


def random_zero123_guidance(image_size: int = 256, seed: int = 0,
                            stable: bool = False,
                            default_elevation: float = 0.0,
                            ) -> Zero123Guidance:
    """Zero123 guidance with the REAL architecture and random weights.

    Matches loader.load_zero123's shapes exactly: clip_emb [1, 768],
    vae_latent [1, s/8, s/8, 4], cam_proj [772, 768] (+4 camera dims).
    """
    bk = random_zero123_backbone(image_size=image_size)
    rng = jax.random.PRNGKey(seed + 2)
    k1, k2, k3 = jax.random.split(rng, 3)
    latent = image_size // 8
    ctx = ZERO123_CONFIG.cross_attention_dim
    return Zero123Guidance(
        bk,
        clip_emb=jax.random.normal(k1, (1, ctx)) * 0.1,
        vae_latent=jax.random.normal(k2, (1, latent, latent, 4)) * 0.1,
        cam_proj=(jax.random.normal(k3, (ctx + 4, ctx)) * 0.02,
                  jnp.zeros(ctx)),
        image_size=image_size,
        stable=stable,
        default_elevation=default_elevation,
    )


def _random_mv_backbone(cfg, image_size: int, init_batch: int,
                        dtype=jnp.bfloat16, **init_kwargs) -> Backbone:
    """Shared random-weight builder for the 4(+1)-view UNet families."""
    latent = image_size // 8
    import dataclasses

    cfg = dataclasses.replace(cfg, dtype=dtype)
    unet = UNet(cfg)
    unet_params = _init_on_device(
        unet,
        jnp.zeros((init_batch, latent, latent, cfg.in_channels)),
        jnp.zeros((init_batch,)),
        jnp.zeros((init_batch, 77, cfg.cross_attention_dim)),
        camera=jnp.zeros((init_batch, 16)),
        dtype=dtype,
        **init_kwargs,
    )
    vae_cfg = VAEConfig(dtype=dtype)
    vae = AutoencoderKL(vae_cfg)
    vae_params = _init_on_device(
        vae, jnp.zeros((1, image_size, image_size, 3)), dtype=dtype
    )

    from .loader import _backbone_from_params

    return _backbone_from_params(unet, unet_params, vae, vae_params,
                                 image_size)


def random_mvdream_guidance(image_size: int = 256, seed: int = 0,
                            ) -> "MVDreamGuidance":
    """MVDream guidance with the REAL 4-view 3D-attention architecture
    (sd-v2.1-base-4view class: SD2.1 UNet + camera_embedding MLP, views
    folded into the attention batch) and random weights — FLOP-exact to
    the real 4-view joint SDS workload
    (/root/reference/guidance/mvdream_utils.py:94-190)."""
    from .sds import MVDreamGuidance
    from .unet import MVDREAM_CONFIG

    bk = _random_mv_backbone(MVDREAM_CONFIG, image_size, init_batch=4)
    rng = jax.random.PRNGKey(seed + 3)
    d = MVDREAM_CONFIG.cross_attention_dim
    emb = {
        "pos": jax.random.normal(jax.random.fold_in(rng, 0), (77, d)) * 0.1,
        "neg": jnp.zeros((77, d)),
    }
    return MVDreamGuidance(bk, emb, image_size=image_size)


def random_imagedream_guidance(image_size: int = 256, seed: int = 0,
                               ) -> "ImageDreamGuidance":
    """ImageDream guidance with the REAL 5-view ip-attention architecture
    (sd-v2.1-base-4view-ipmv class: 4 views + identity view, 16 resampled
    CLIP-ViT-H image tokens through dedicated ip cross-attention) and
    random weights (/root/reference/guidance/imagedream_utils.py:129-214).
    """
    from .sds import ImageDreamGuidance
    from .unet import IMAGEDREAM_CONFIG

    latent = image_size // 8
    bk = _random_mv_backbone(
        IMAGEDREAM_CONFIG, image_size, init_batch=5,
        ip=jnp.zeros((5, 257, IMAGEDREAM_CONFIG.ip_embed_dim)),
        ip_img=jnp.zeros((1, latent, latent, 4)),
    )
    rng = jax.random.PRNGKey(seed + 4)
    k1, k2, k3 = jax.random.split(rng, 3)
    d = IMAGEDREAM_CONFIG.cross_attention_dim
    return ImageDreamGuidance(
        bk,
        embeddings={"pos": jax.random.normal(k1, (77, d)) * 0.1,
                    "neg": jnp.zeros((77, d))},
        image_embeddings={
            "pos": jax.random.normal(
                k2, (257, IMAGEDREAM_CONFIG.ip_embed_dim)
            ) * 0.1,
            "ip_img": jax.random.normal(k3, (latent, latent, 4)) * 0.1,
        },
        image_size=image_size,
    )
