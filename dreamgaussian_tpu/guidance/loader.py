"""Assemble real guidance objects from local checkpoints.

Two checkpoint layouts are supported:

1. **Diffusers snapshot directories** — the HF layout the reference
   downloads (stabilityai/stable-diffusion-2-1-base,
   ashawkey/zero123-xl-diffusers, ashawkey/stable-zero123-diffusers):

       <dir>/unet/diffusion_pytorch_model.{safetensors,bin}
       <dir>/vae/...
       <dir>/text_encoder/ + <dir>/tokenizer/      (SD)
       <dir>/image_encoder/ + <dir>/clip_camera_projection/   (zero123)

2. **Single-file LDM checkpoints** — what the MVDream / ImageDream pip
   packages the reference imports actually load
   (/root/reference/guidance/mvdream_utils.py:28-29 build_model):
   ``sd-v2.1-base-4view.pt`` / ``sd-v2.1-base-4view-ipmv.pt`` with
   ``model.diffusion_model.*`` / ``first_stage_model.*`` /
   ``cond_stage_model.model.*`` keys. Tokenizer (and for ImageDream the
   CLIP vision encoder) are HF-format directories next to the file or
   passed explicitly.

Weights are converted on the fly (convert.py) into the NHWC Flax modules;
UNet/VAE run in bfloat16 by default (f32 GroupNorm statistics — see
unet.GroupNorm32), matching the reference's fp16 usage
(/root/reference/guidance/sd_utils.py:30-45).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .convert import (
    convert_ldm_unet,
    convert_ldm_vae,
    convert_open_clip_text,
    convert_unet,
    convert_vae,
    is_ldm_layout,
    load_torch_state_dict,
)
from .scheduler import DDIMScheduler
from .sds import (
    Backbone,
    ImageDreamGuidance,
    MVDreamGuidance,
    StableDiffusionGuidance,
    Zero123Guidance,
)
from .text_encoder import OpenCLIPTextConfig, OpenCLIPTextEncoder
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


def _backbone_from_params(unet, unet_params, vae, vae_params,
                          image_size: int) -> Backbone:
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
        # Param-passing forms: used when the SDS step is traced into an
        # outer jit (see Backbone docstring — closed-over real-size
        # params would be inlined into the module as dense literals).
        unet_apply_p=lambda p, x, t, ctx, **kw: unet.apply(p, x, t, ctx,
                                                           **kw),
        vae_encode_p=lambda p, imgs: vae.apply(p, imgs, method=vae.encode),
        vae_decode_p=lambda p, z: vae.apply(p, z, method=vae.decode),
        net_params={"unet": unet_params, "vae": vae_params},
    )


_UNET_JSON_FIELDS = (
    "in_channels", "out_channels", "block_out_channels", "layers_per_block",
    "cross_attention_dim", "attention_head_dim", "down_block_types",
    "up_block_types", "use_linear_projection", "flip_sin_to_cos",
    "freq_shift",
)
_VAE_JSON_FIELDS = (
    "in_channels", "latent_channels", "block_out_channels",
    "layers_per_block", "scaling_factor",
)


def _config_from_json(ckpt_dir: str, subfolder: str, default, fields):
    """Override a config dataclass from the snapshot's ``config.json``.

    Real diffusers snapshots ship one per model subfolder; honoring it
    makes the loader robust to architecture variants AND lets the
    weights-day rehearsal (tests/test_weights_day.py) exercise the FULL
    checkpoint path — load -> convert -> jit -> train -> export — on a
    tiny synthetic snapshot without any test-only code paths.
    """
    import json as _json

    p = os.path.join(ckpt_dir, subfolder, "config.json")
    if not os.path.exists(p):
        return default
    with open(p) as f:
        raw = _json.load(f)
    kw = {}
    for k in fields:
        if k in raw:
            v = raw[k]
            kw[k] = tuple(v) if isinstance(v, list) else v
    return dataclasses.replace(default, **kw)


def _build_backbone(ckpt_dir: str, unet_config: UNetConfig,
                    image_size: int, dtype=jnp.bfloat16) -> Backbone:
    """Diffusers-directory layout (unet/ + vae/ subfolders)."""
    unet_config = _config_from_json(
        ckpt_dir, "unet", unet_config, _UNET_JSON_FIELDS
    )
    unet_config = dataclasses.replace(unet_config, dtype=dtype)
    unet = UNet(unet_config)
    unet_sd = load_torch_state_dict(ckpt_dir, "unet")
    unet_params = convert_unet(unet_sd, unet_config)
    vae_cfg = _config_from_json(
        ckpt_dir, "vae", VAEConfig(dtype=dtype), _VAE_JSON_FIELDS
    )
    vae = AutoencoderKL(vae_cfg)
    vae_params = convert_vae(load_torch_state_dict(ckpt_dir, "vae"), vae_cfg)
    factor = 2 ** (len(vae_cfg.block_out_channels) - 1)
    return _backbone_from_params(unet, unet_params, vae, vae_params,
                                 image_size)._replace(
        latent_size=image_size // factor
    )


def _build_backbone_ldm(sd: dict, unet_config: UNetConfig,
                        image_size: int, dtype=jnp.bfloat16,
                        vae_config: VAEConfig | None = None) -> Backbone:
    """Single-file LDM layout (model.diffusion_model.* etc.)."""
    unet_config = dataclasses.replace(unet_config, dtype=dtype)
    unet = UNet(unet_config)
    unet_params = convert_ldm_unet(sd, unet_config)
    vae_cfg = dataclasses.replace(vae_config or VAEConfig(), dtype=dtype)
    vae = AutoencoderKL(vae_cfg)
    vae_params = convert_ldm_vae(sd, vae_cfg)
    factor = 2 ** (len(vae_cfg.block_out_channels) - 1)
    return _backbone_from_params(unet, unet_params, vae, vae_params,
                                 image_size)._replace(
        latent_size=image_size // factor
    )


def _encode_text(ckpt_dir: str, prompts: list[str]) -> np.ndarray:
    """CLIP text embeddings [N, 77, D]. Torch on the host — the
    installed transformers ships no Flax classes, and this is a one-time
    conditioning encode."""
    import torch
    from transformers import CLIPTextModel, CLIPTokenizer

    tok = CLIPTokenizer.from_pretrained(os.path.join(ckpt_dir, "tokenizer"))
    enc = CLIPTextModel.from_pretrained(os.path.join(ckpt_dir, "text_encoder"))
    inputs = tok(
        prompts, padding="max_length", max_length=tok.model_max_length,
        truncation=True, return_tensors="pt",
    )
    with torch.no_grad():
        out = enc(input_ids=inputs.input_ids)[0]
    return out.numpy()


def _tokenize_open_clip(tokenizer_dir: str, prompts: list[str],
                        context_length: int = 77) -> np.ndarray:
    """open_clip-style token ids [N, 77]: [SOT] tokens [EOT] zero-padded
    (open_clip.tokenize semantics — HF CLIPTokenizer shares the BPE but
    pads differently, so pad manually with id 0)."""
    from transformers import CLIPTokenizer

    tok = CLIPTokenizer.from_pretrained(tokenizer_dir)
    out = []
    for p in prompts:
        ids = tok(p, truncation=True, max_length=context_length)["input_ids"]
        out.append(ids + [0] * (context_length - len(ids)))
    return np.asarray(out, np.int32)


def _encode_text_open_clip(sd: dict, tokenizer_dir: str,
                           prompts: list[str]) -> np.ndarray:
    """Penultimate-layer embeddings [N, 77, 1024] via the checkpoint's
    embedded open_clip text tower (ldm FrozenOpenCLIPEmbedder path)."""
    width = int(np.asarray(sd["cond_stage_model.model.ln_final.weight"]).shape[0])
    heads = max(1, width // 64)
    n_layers = 0
    while (f"cond_stage_model.model.transformer.resblocks.{n_layers}"
           ".ln_1.weight") in sd:
        n_layers += 1
    vocab, _ = np.asarray(
        sd["cond_stage_model.model.token_embedding.weight"]
    ).shape
    ctx_len = int(np.asarray(
        sd["cond_stage_model.model.positional_embedding"]
    ).shape[0])
    cfg = OpenCLIPTextConfig(
        vocab_size=vocab, width=width, heads=heads, layers=n_layers,
        context_length=ctx_len,
    )
    enc = OpenCLIPTextEncoder(cfg)
    params = convert_open_clip_text(sd, cfg)
    ids = _tokenize_open_clip(tokenizer_dir, prompts, ctx_len)
    return np.asarray(enc.apply(params, jnp.asarray(ids)))


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
        return load_mvdream(
            ckpt_dir, prompt, negative_prompt=negative_prompt,
            guidance_scale=guidance_scale or 100.0,
            image_size=image_size or 256, anneal=anneal,
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


def load_mvdream(
    ckpt: str,
    prompt: str,
    negative_prompt: str = "",
    tokenizer_dir: str | None = None,
    guidance_scale: float = 100.0,
    image_size: int = 256,
    anneal: bool = True,
    unet_config: UNetConfig | None = None,
    vae_config: VAEConfig | None = None,
    dtype=jnp.bfloat16,
) -> MVDreamGuidance:
    """MVDream 4-view guidance.

    ``ckpt``: either a diffusers snapshot directory (unet/ vae/
    text_encoder/ tokenizer/ subfolders, camera MLP converted into the
    UNet's ``camera_embedding``) or the single ``sd-v2.1-base-4view.pt``
    LDM file the mvdream package ships
    (/root/reference/guidance/mvdream_utils.py:28-29); for the latter,
    ``tokenizer_dir`` (HF CLIPTokenizer files) defaults to a ``tokenizer``
    directory next to the file."""
    prompts = [prompt, negative_prompt or ""]
    ucfg = unet_config or MVDREAM_CONFIG
    if os.path.isfile(ckpt):
        sd = load_torch_state_dict(ckpt)
        if not is_ldm_layout(sd):
            raise ValueError(f"{ckpt} is not an LDM-layout checkpoint")
        backbone = _build_backbone_ldm(sd, ucfg, image_size, dtype=dtype,
                                       vae_config=vae_config)
        tok_dir = tokenizer_dir or os.path.join(
            os.path.dirname(ckpt), "tokenizer"
        )
        embs = _encode_text_open_clip(sd, tok_dir, prompts)
    else:
        backbone = _build_backbone(ckpt, ucfg, image_size, dtype=dtype)
        embs = _encode_text(ckpt, prompts)
    return MVDreamGuidance(
        backbone,
        {"pos": embs[0], "neg": embs[1]},
        guidance_scale=guidance_scale,
        image_size=image_size,
        anneal=anneal,
    )


def load_imagedream(
    ckpt: str,
    ref_image: np.ndarray,
    prompt: str,
    negative_prompt: str = "",
    tokenizer_dir: str | None = None,
    image_encoder_dir: str | None = None,
    guidance_scale: float = 5.0,
    image_size: int = 256,
    anneal: bool = True,
    unet_config: UNetConfig | None = None,
    vae_config: VAEConfig | None = None,
    dtype=jnp.bfloat16,
) -> ImageDreamGuidance:
    """ImageDream 4(+1)-view guidance
    (/root/reference/guidance/imagedream_utils.py:45-60).

    ``ckpt``: diffusers snapshot directory OR the single
    ``sd-v2.1-base-4view-ipmv.pt`` LDM file. The CLIP ViT-H vision
    encoder (for the ip tokens) is an HF-format directory: the snapshot's
    ``image_encoder`` subfolder, or ``image_encoder_dir`` / a sibling
    directory for the single-file layout."""
    is_file = os.path.isfile(ckpt)
    base_dir = os.path.dirname(ckpt) if is_file else ckpt
    enc_dir = image_encoder_dir or os.path.join(base_dir, "image_encoder")
    prompts = [prompt, negative_prompt or ""]
    ucfg = unet_config or IMAGEDREAM_CONFIG
    if is_file:
        sd = load_torch_state_dict(ckpt)
        if not is_ldm_layout(sd):
            raise ValueError(f"{ckpt} is not an LDM-layout checkpoint")
        backbone = _build_backbone_ldm(sd, ucfg, image_size, dtype=dtype,
                                       vae_config=vae_config)
        tok_dir = tokenizer_dir or os.path.join(base_dir, "tokenizer")
        embs = _encode_text_open_clip(sd, tok_dir, prompts)
    else:
        backbone = _build_backbone(ckpt, ucfg, image_size, dtype=dtype)
        embs = _encode_text(ckpt, prompts)
    clip_tokens = _clip_image_tokens(enc_dir, ref_image)
    img = jax.image.resize(
        jnp.asarray(ref_image, jnp.float32)[None],
        (1, image_size, image_size, 3), "bilinear",
    ) * 2.0 - 1.0
    ip_img = np.asarray(backbone.vae_encode(img))[0]
    return ImageDreamGuidance(
        backbone,
        embeddings={"pos": embs[0], "neg": embs[1]},
        image_embeddings={"pos": clip_tokens, "ip_img": ip_img},
        guidance_scale=guidance_scale,
        image_size=image_size,
        anneal=anneal,
    )


def _clip_pixel_values(image: np.ndarray, size: int = 224) -> np.ndarray:
    img = jax.image.resize(
        jnp.asarray(image, jnp.float32), (size, size, 3), "bilinear"
    )
    img = (np.asarray(img) - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    return img.transpose(2, 0, 1)[None]  # NCHW


def _clip_image_embed(ckpt_dir: str, image: np.ndarray) -> np.ndarray:
    """CLIP vision projection embedding [1, 768] of an RGB [H,W,3] image
    in [0, 1] (the zero123 conditioning image encoder,
    /root/reference/guidance/zero123_utils.py:56-64).

    Runs the TORCH CLIP tower on the host — the installed transformers
    ships no Flax CLIP classes (caught by tests/test_weights_day.py),
    and this is a one-time conditioning embed, not a hot path.
    """
    import torch
    from transformers import CLIPVisionModelWithProjection

    enc = CLIPVisionModelWithProjection.from_pretrained(
        os.path.join(ckpt_dir, "image_encoder")
    )
    size = getattr(enc.config, "image_size", 224)
    with torch.no_grad():
        out = enc(pixel_values=torch.from_numpy(
            _clip_pixel_values(image, size)
        ))
    return out.image_embeds.numpy()


def _clip_image_tokens(encoder_dir: str, image: np.ndarray) -> np.ndarray:
    """CLIP vision TOKEN sequence [257, 1280] (cls + patches) of an RGB
    [H,W,3] image in [0,1] — ImageDream's ip conditioning
    (get_learned_image_conditioning, consumed by the UNet's resampler).
    Torch on host (see _clip_image_embed)."""
    import torch
    from transformers import CLIPVisionModel

    enc = CLIPVisionModel.from_pretrained(encoder_dir)
    size = getattr(enc.config, "image_size", 224)
    with torch.no_grad():
        out = enc(pixel_values=torch.from_numpy(
            _clip_pixel_values(image, size)
        ))
    return out.last_hidden_state[0].numpy()


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
