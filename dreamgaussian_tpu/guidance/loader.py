"""Assemble real guidance objects from local diffusers-format checkpoints.

Checkpoint directories follow the HF snapshot layout the reference
downloads (stabilityai/stable-diffusion-2-1-base,
ashawkey/zero123-xl-diffusers, ashawkey/stable-zero123-diffusers):

    <dir>/unet/diffusion_pytorch_model.{safetensors,bin}
    <dir>/vae/...
    <dir>/text_encoder/ + <dir>/tokenizer/      (SD)
    <dir>/image_encoder/ + <dir>/clip_camera_projection/   (zero123)

Weights are converted on the fly (convert.py) into the NHWC Flax modules;
UNet/VAE run in bfloat16 by default (f32 GroupNorm statistics — see
unet.GroupNorm32), matching the reference's fp16 usage
(/root/reference/guidance/sd_utils.py:30-45).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .convert import convert_unet, convert_vae, load_torch_state_dict
from .scheduler import DDIMScheduler
from .sds import (
    Backbone,
    ImageDreamGuidance,
    MVDreamGuidance,
    StableDiffusionGuidance,
    Zero123Guidance,
)
from .unet import (
    IMAGEDREAM_CONFIG,
    MVDREAM_CONFIG,
    SD21_CONFIG,
    ZERO123_CONFIG,
    UNet,
    UNetConfig,
)
from .vae import AutoencoderKL, VAEConfig

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _build_backbone(ckpt_dir: str, unet_config: UNetConfig,
                    image_size: int, dtype=jnp.bfloat16) -> Backbone:
    unet_config = UNetConfig(**{
        **unet_config.__dict__, "dtype": dtype,
    })
    unet = UNet(unet_config)
    unet_sd = load_torch_state_dict(ckpt_dir, "unet")
    unet_params = convert_unet(unet_sd, unet_config)
    vae_cfg = VAEConfig(dtype=dtype)
    vae = AutoencoderKL(vae_cfg)
    vae_params = convert_vae(load_torch_state_dict(ckpt_dir, "vae"), vae_cfg)

    unet_apply = jax.jit(
        lambda x, t, ctx, **kw: unet.apply(unet_params, x, t, ctx, **kw)
    )
    vae_encode = jax.jit(
        lambda imgs: vae.apply(vae_params, imgs, method=vae.encode)
    )
    vae_decode = jax.jit(
        lambda z: vae.apply(vae_params, z, method=vae.decode)
    )
    return Backbone(
        unet_apply=unet_apply,
        vae_encode=vae_encode,
        vae_decode=vae_decode,
        scheduler=DDIMScheduler(),
        latent_size=image_size // 8,
    )


def _encode_text(ckpt_dir: str, prompts: list[str]) -> np.ndarray:
    """CLIP text embeddings [N, 77, D] via transformers Flax."""
    from transformers import CLIPTokenizer, FlaxCLIPTextModel

    tok = CLIPTokenizer.from_pretrained(os.path.join(ckpt_dir, "tokenizer"))
    enc = FlaxCLIPTextModel.from_pretrained(
        os.path.join(ckpt_dir, "text_encoder"), from_pt=True
    )
    inputs = tok(
        prompts, padding="max_length", max_length=tok.model_max_length,
        truncation=True, return_tensors="np",
    )
    return np.asarray(enc(input_ids=inputs.input_ids)[0])


def _camera_embed_from_ckpt(ckpt_dir: str, unet_config: UNetConfig):
    """Camera-conditioning MLP for MVDream/ImageDream UNets (maps the
    normalized 16-dim camera to the time-embedding dim; applied by
    UNet's camera_embedding pathway at inference — here the loader wires
    it as a standalone callable for the guidance class)."""
    sd = load_torch_state_dict(ckpt_dir, "unet")
    w1 = sd["camera_embedding.linear_1.weight"].T
    b1 = sd["camera_embedding.linear_1.bias"]
    w2 = sd["camera_embedding.linear_2.weight"].T
    b2 = sd["camera_embedding.linear_2.bias"]

    def camera_embed(cam16):
        h = jnp.asarray(cam16) @ w1 + b1
        return jax.nn.silu(h) @ w2 + b2

    return camera_embed


def load_stable_diffusion(
    ckpt_dir: str,
    prompt: str,
    negative_prompt: str = "",
    mvdream: bool = False,
    guidance_scale: float | None = None,
    image_size: int | None = None,
    anneal: bool = True,
):
    """SD 2.1 SDS guidance — or MVDream 4-view joint guidance when
    ``mvdream`` (the reference's enable_sd switch, main.py:122-143).

    Directional prompt embeddings (front/side/back) mirror
    /root/reference/guidance/sd_utils.py:84-94.
    """
    if mvdream:
        image_size = image_size or 256
        backbone = _build_backbone(ckpt_dir, MVDREAM_CONFIG, image_size)
        embs = _encode_text(ckpt_dir, [prompt, negative_prompt or ""])
        return MVDreamGuidance(
            backbone,
            {"pos": embs[0], "neg": embs[1]},
            camera_embed=_camera_embed_from_ckpt(ckpt_dir, MVDREAM_CONFIG),
            guidance_scale=guidance_scale or 100.0,
            image_size=image_size,
            anneal=anneal,
        )
    image_size = image_size or 512
    backbone = _build_backbone(ckpt_dir, SD21_CONFIG, image_size)
    prompts = [prompt, negative_prompt or ""]
    dirs = [f"{prompt}, {d} view" for d in ("front", "side", "back")]
    embs = _encode_text(ckpt_dir, prompts + dirs)
    embeddings = {
        "pos": embs[0], "neg": embs[1],
        "front": embs[2], "side": embs[3], "back": embs[4],
    }
    return StableDiffusionGuidance(
        backbone, embeddings, guidance_scale=guidance_scale or 100.0,
        image_size=image_size, anneal=anneal,
    )


def load_imagedream(
    ckpt_dir: str,
    ref_image: np.ndarray,
    prompt: str,
    negative_prompt: str = "",
    guidance_scale: float = 5.0,
    image_size: int = 256,
    anneal: bool = True,
) -> ImageDreamGuidance:
    """ImageDream 4(+1)-view guidance from a local snapshot
    (/root/reference/guidance/imagedream_utils.py:45-60)."""
    backbone = _build_backbone(ckpt_dir, IMAGEDREAM_CONFIG, image_size)
    embs = _encode_text(ckpt_dir, [prompt, negative_prompt or ""])
    clip_tokens = _clip_image_embed(ckpt_dir, ref_image)
    img = jax.image.resize(
        jnp.asarray(ref_image, jnp.float32)[None],
        (1, image_size, image_size, 3), "bilinear",
    ) * 2.0 - 1.0
    ip_img = np.asarray(backbone.vae_encode(img))[0]
    return ImageDreamGuidance(
        backbone,
        embeddings={"pos": embs[0], "neg": embs[1]},
        image_embeddings={"pos": clip_tokens, "ip_img": ip_img},
        camera_embed=_camera_embed_from_ckpt(ckpt_dir, IMAGEDREAM_CONFIG),
        guidance_scale=guidance_scale,
        image_size=image_size,
        anneal=anneal,
    )


def _clip_image_embed(ckpt_dir: str, image: np.ndarray) -> np.ndarray:
    """CLIP vision projection embedding [1, 768] of an RGB [H,W,3] image
    in [0, 1] (the zero123 conditioning image encoder,
    /root/reference/guidance/zero123_utils.py:56-64)."""
    from transformers import FlaxCLIPVisionModelWithProjection

    enc = FlaxCLIPVisionModelWithProjection.from_pretrained(
        os.path.join(ckpt_dir, "image_encoder"), from_pt=True
    )
    img = jax.image.resize(
        jnp.asarray(image, jnp.float32), (224, 224, 3), "bilinear"
    )
    img = (np.asarray(img) - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    pixel_values = img.transpose(2, 0, 1)[None]  # NCHW
    out = enc(pixel_values=pixel_values)
    return np.asarray(out.image_embeds)


def load_zero123(
    ckpt_dir: str,
    ref_image: np.ndarray | None = None,
    stable: bool = False,
    default_elevation: float = 0.0,
    guidance_scale: float = 5.0,
    image_size: int = 256,
    anneal: bool = True,
) -> Zero123Guidance:
    """Zero123-XL / stable-zero123 guidance from a local snapshot.

    ref_image: RGB [H, W, 3] in [0, 1] (the conditioning view). Must be
    provided here (the reference sets it via get_img_embeds).
    """
    if ref_image is None:
        raise ValueError("load_zero123 requires the reference image")
    backbone = _build_backbone(ckpt_dir, ZERO123_CONFIG, image_size)

    clip_emb = _clip_image_embed(ckpt_dir, ref_image)

    # Unscaled VAE posterior mean of the 256x256 reference view
    # (zero123_utils.py:63: encode / scaling_factor).
    img = jax.image.resize(
        jnp.asarray(ref_image, jnp.float32)[None],
        (1, image_size, image_size, 3), "bilinear",
    ) * 2.0 - 1.0
    vae_latent = backbone.vae_encode(img) / VAEConfig().scaling_factor

    proj_sd = load_torch_state_dict(ckpt_dir, "clip_camera_projection")
    (wk,) = [k for k in proj_sd if k.endswith("weight")]
    (bk,) = [k for k in proj_sd if k.endswith("bias")]
    cam_proj = (np.ascontiguousarray(proj_sd[wk].T), proj_sd[bk])

    return Zero123Guidance(
        backbone,
        clip_emb=clip_emb,
        vae_latent=np.asarray(vae_latent),
        cam_proj=cam_proj,
        guidance_scale=guidance_scale,
        image_size=image_size,
        stable=stable,
        default_elevation=default_elevation,
        anneal=anneal,
    )
