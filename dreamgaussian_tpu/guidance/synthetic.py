"""Synthetic torch-layout checkpoints for loader/converter tests.

Generates random state dicts with EXACTLY the key names and (torch-side)
shapes of the real checkpoint formats:

- LDM single-file layout: ``model.diffusion_model.*`` (incl. MVDream's
  ``camera_embed`` and ImageDream's ``image_embed`` resampler +
  ``to_k_ip``/``to_v_ip``), ``first_stage_model.*``,
  ``cond_stage_model.model.*`` — the format the reference's
  mvdream/imagedream packages load
  (/root/reference/guidance/mvdream_utils.py:28-29).

This is deliberately written INDEPENDENTLY of convert.py's mapping code
(mirroring the torch module structure instead), so the pair
generator->converter actually exercises key coverage and shape
orientation: a transposed or misnamed mapping fails
``assert_tree_shapes_match`` against the Flax module's init tree as long
as the dimensions involved differ.

Shapes follow torch conventions: Linear [out, in], Conv OIHW,
Norm weight/bias [C].
"""

from __future__ import annotations

import json
import os

import numpy as np

from .text_encoder import OpenCLIPTextConfig
from .unet import UNetConfig
from .vae import VAEConfig

# Tiny full-architecture configs (every pathway present, non-square dims
# wherever possible so layout mistakes change shapes).
TINY_SD_CONFIG = UNetConfig(
    block_out_channels=(8, 16), layers_per_block=1,
    cross_attention_dim=24, num_attention_heads=2,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    use_linear_projection=True,
)
# zero123 is SD1.5-based: 8-ch input, conv transformer projections.
TINY_ZERO123_CONFIG = UNetConfig(
    in_channels=8, block_out_channels=(8, 16), layers_per_block=1,
    cross_attention_dim=24, num_attention_heads=2,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    use_linear_projection=False,
)
TINY_MVDREAM_CONFIG = UNetConfig(
    block_out_channels=(8, 16), layers_per_block=1,
    cross_attention_dim=24, num_attention_heads=2,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    use_linear_projection=True, num_views=4,
)
TINY_IMAGEDREAM_CONFIG = UNetConfig(
    block_out_channels=(8, 16), layers_per_block=1,
    cross_attention_dim=24, num_attention_heads=2,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    use_linear_projection=True, num_views=5,
    ip_dim=4, ip_embed_dim=20, ip_resampler_dim=16,
    ip_resampler_depth=2, ip_resampler_heads=2,
)
TINY_VAE_CONFIG = VAEConfig(block_out_channels=(8, 16), layers_per_block=1)
# width == the UNets' cross_attention_dim (as in the real models, where
# both are 1024).
TINY_TEXT_CONFIG = OpenCLIPTextConfig(
    vocab_size=64, width=24, heads=2, layers=3, context_length=16,
)


class _R:
    def __init__(self, seed):
        self.rng = np.random.default_rng(seed)

    def __call__(self, *shape):
        return (self.rng.normal(size=shape) * 0.05).astype(np.float32)


def _linear(sd, p, out_d, in_d, r, bias=True):
    sd[p + ".weight"] = r(out_d, in_d)
    if bias:
        sd[p + ".bias"] = r(out_d)


def _conv3(sd, p, out_c, in_c, r, k=3):
    sd[p + ".weight"] = r(out_c, in_c, k, k)
    sd[p + ".bias"] = r(out_c)


def _norm(sd, p, c, r):
    sd[p + ".weight"] = np.ones(c, np.float32) + r(c)
    sd[p + ".bias"] = r(c)


def _ldm_resnet(sd, p, in_c, out_c, temb, r):
    _norm(sd, p + ".in_layers.0", in_c, r)
    _conv3(sd, p + ".in_layers.2", out_c, in_c, r)
    _linear(sd, p + ".emb_layers.1", out_c, temb, r)
    _norm(sd, p + ".out_layers.0", out_c, r)
    _conv3(sd, p + ".out_layers.3", out_c, out_c, r)
    if in_c != out_c:
        _conv3(sd, p + ".skip_connection", out_c, in_c, r, k=1)


def _ldm_transformer(sd, p, ch, ctx_dim, r, ip: bool):
    _norm(sd, p + ".norm", ch, r)
    _linear(sd, p + ".proj_in", ch, ch, r)
    _linear(sd, p + ".proj_out", ch, ch, r)
    tp = p + ".transformer_blocks.0"
    _norm(sd, tp + ".norm1", ch, r)
    for qkv, d in (("to_q", ch), ("to_k", ch), ("to_v", ch)):
        _linear(sd, f"{tp}.attn1.{qkv}", ch, d, r, bias=False)
    _linear(sd, tp + ".attn1.to_out.0", ch, ch, r)
    _norm(sd, tp + ".norm2", ch, r)
    _linear(sd, tp + ".attn2.to_q", ch, ch, r, bias=False)
    _linear(sd, tp + ".attn2.to_k", ch, ctx_dim, r, bias=False)
    _linear(sd, tp + ".attn2.to_v", ch, ctx_dim, r, bias=False)
    if ip:
        _linear(sd, tp + ".attn2.to_k_ip", ch, ctx_dim, r, bias=False)
        _linear(sd, tp + ".attn2.to_v_ip", ch, ctx_dim, r, bias=False)
    _linear(sd, tp + ".attn2.to_out.0", ch, ch, r)
    _norm(sd, tp + ".norm3", ch, r)
    _linear(sd, tp + ".ff.net.0.proj", ch * 8, ch, r)  # GEGLU doubles 4x
    _linear(sd, tp + ".ff.net.2", ch, ch * 4, r)


def synth_ldm_unet(cfg: UNetConfig, seed: int = 0,
                   prefix: str = "model.diffusion_model.") -> dict:
    r = _R(seed)
    sd: dict = {}
    g = lambda n: prefix + n  # noqa: E731
    ch0 = cfg.block_out_channels[0]
    temb = ch0 * 4
    ip = cfg.ip_dim > 0
    _linear(sd, g("time_embed.0"), temb, ch0, r)
    _linear(sd, g("time_embed.2"), temb, temb, r)
    if cfg.num_views > 1:
        _linear(sd, g("camera_embed.0"), temb, 16, r)
        _linear(sd, g("camera_embed.2"), temb, temb, r)
        # Boost the camera MLP so conditioning visibly reaches the output
        # even through the small-scale random chain (tests assert on it).
        for k in ("camera_embed.0.weight", "camera_embed.2.weight"):
            sd[g(k)] = sd[g(k)] * 8.0
    if ip:
        d = cfg.ip_resampler_dim
        ep = g("image_embed")
        sd[ep + ".latents"] = r(1, cfg.ip_dim, d)
        _linear(sd, ep + ".proj_in", d, cfg.ip_embed_dim, r)
        _linear(sd, ep + ".proj_out", cfg.cross_attention_dim, d, r)
        _norm(sd, ep + ".norm_out", cfg.cross_attention_dim, r)
        for i in range(cfg.ip_resampler_depth):
            lp = f"{ep}.layers.{i}"
            _norm(sd, lp + ".0.norm1", d, r)
            _norm(sd, lp + ".0.norm2", d, r)
            _linear(sd, lp + ".0.to_q", d, d, r, bias=False)
            _linear(sd, lp + ".0.to_kv", 2 * d, d, r, bias=False)
            _linear(sd, lp + ".0.to_out", d, d, r, bias=False)
            _norm(sd, lp + ".1.0", d, r)
            _linear(sd, lp + ".1.1", 4 * d, d, r, bias=False)
            _linear(sd, lp + ".1.3", d, 4 * d, r, bias=False)

    _conv3(sd, g("input_blocks.0.0"), ch0, cfg.in_channels, r)
    skips = [ch0]
    h = ch0
    ib = 1
    for i, (btype, ch) in enumerate(
        zip(cfg.down_block_types, cfg.block_out_channels)
    ):
        for j in range(cfg.layers_per_block):
            _ldm_resnet(sd, g(f"input_blocks.{ib}.0"), h, ch, temb, r)
            h = ch
            if btype == "CrossAttnDownBlock2D":
                _ldm_transformer(
                    sd, g(f"input_blocks.{ib}.1"), ch,
                    cfg.cross_attention_dim, r, ip,
                )
            skips.append(ch)
            ib += 1
        if i < len(cfg.block_out_channels) - 1:
            _conv3(sd, g(f"input_blocks.{ib}.0.op"), ch, ch, r)
            skips.append(ch)
            ib += 1

    chm = cfg.block_out_channels[-1]
    _ldm_resnet(sd, g("middle_block.0"), chm, chm, temb, r)
    _ldm_transformer(
        sd, g("middle_block.1"), chm, cfg.cross_attention_dim, r, ip
    )
    _ldm_resnet(sd, g("middle_block.2"), chm, chm, temb, r)

    rev_ch = list(reversed(cfg.block_out_channels))
    h = chm
    ob = 0
    for i, btype in enumerate(cfg.up_block_types):
        ch = rev_ch[i]
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            _ldm_resnet(sd, g(f"output_blocks.{ob}.0"), h + skip, ch, temb, r)
            h = ch
            sub = 1
            if btype == "CrossAttnUpBlock2D":
                _ldm_transformer(
                    sd, g(f"output_blocks.{ob}.{sub}"), ch,
                    cfg.cross_attention_dim, r, ip,
                )
                sub += 1
            if (j == cfg.layers_per_block
                    and i < len(cfg.up_block_types) - 1):
                _conv3(sd, g(f"output_blocks.{ob}.{sub}.conv"), ch, ch, r)
            ob += 1

    _norm(sd, g("out.0"), cfg.block_out_channels[0], r)
    _conv3(sd, g("out.2"), cfg.out_channels, cfg.block_out_channels[0], r)
    return sd


def synth_ldm_vae(cfg: VAEConfig, seed: int = 1,
                  prefix: str = "first_stage_model.") -> dict:
    r = _R(seed)
    sd: dict = {}
    g = lambda n: prefix + n  # noqa: E731
    chans = list(cfg.block_out_channels)
    n = len(chans)
    lat = cfg.latent_channels

    def vres(p, in_c, out_c):
        _norm(sd, p + ".norm1", in_c, r)
        _conv3(sd, p + ".conv1", out_c, in_c, r)
        _norm(sd, p + ".norm2", out_c, r)
        _conv3(sd, p + ".conv2", out_c, out_c, r)
        if in_c != out_c:
            _conv3(sd, p + ".nin_shortcut", out_c, in_c, r, k=1)

    def vattn(p, c):
        _norm(sd, p + ".norm", c, r)
        for nm in ("q", "k", "v", "proj_out"):
            _conv3(sd, f"{p}.{nm}", c, c, r, k=1)

    _conv3(sd, g("encoder.conv_in"), chans[0], cfg.in_channels, r)
    h = chans[0]
    for i, ch in enumerate(chans):
        for j in range(cfg.layers_per_block):
            vres(g(f"encoder.down.{i}.block.{j}"), h, ch)
            h = ch
        if i < n - 1:
            _conv3(sd, g(f"encoder.down.{i}.downsample.conv"), ch, ch, r)
    vres(g("encoder.mid.block_1"), h, h)
    vattn(g("encoder.mid.attn_1"), h)
    vres(g("encoder.mid.block_2"), h, h)
    _norm(sd, g("encoder.norm_out"), h, r)
    _conv3(sd, g("encoder.conv_out"), 2 * lat, h, r)
    _conv3(sd, g("quant_conv"), 2 * lat, 2 * lat, r, k=1)

    _conv3(sd, g("post_quant_conv"), lat, lat, r, k=1)
    _conv3(sd, g("decoder.conv_in"), chans[-1], lat, r)
    h = chans[-1]
    vres(g("decoder.mid.block_1"), h, h)
    vattn(g("decoder.mid.attn_1"), h)
    vres(g("decoder.mid.block_2"), h, h)
    for i, ch in enumerate(reversed(chans)):
        lvl = n - 1 - i
        for j in range(cfg.layers_per_block + 1):
            vres(g(f"decoder.up.{lvl}.block.{j}"), h, ch)
            h = ch
        if i < n - 1:
            _conv3(sd, g(f"decoder.up.{lvl}.upsample.conv"), ch, ch, r)
    _norm(sd, g("decoder.norm_out"), h, r)
    _conv3(sd, g("decoder.conv_out"), cfg.in_channels, h, r)
    return sd


def synth_open_clip_text(cfg: OpenCLIPTextConfig, seed: int = 2,
                         prefix: str = "cond_stage_model.model.") -> dict:
    r = _R(seed)
    sd: dict = {}
    g = lambda nm: prefix + nm  # noqa: E731
    w = cfg.width
    sd[g("token_embedding.weight")] = r(cfg.vocab_size, w)
    sd[g("positional_embedding")] = r(cfg.context_length, w)
    for i in range(cfg.layers):
        bp = g(f"transformer.resblocks.{i}")
        _norm(sd, bp + ".ln_1", w, r)
        sd[bp + ".attn.in_proj_weight"] = r(3 * w, w)
        sd[bp + ".attn.in_proj_bias"] = r(3 * w)
        _linear(sd, bp + ".attn.out_proj", w, w, r)
        _norm(sd, bp + ".ln_2", w, r)
        _linear(sd, bp + ".mlp.c_fc", 4 * w, w, r)
        _linear(sd, bp + ".mlp.c_proj", w, 4 * w, r)
    _norm(sd, g("ln_final"), w, r)
    sd[g("text_projection")] = r(w, w)  # dead weight, present in real ckpts
    return sd


# ---------------------------------------------------------------------------
# Diffusers snapshot layout (SD 2.1-base, ashawkey/zero123-*-diffusers).
# Mirrors the torch UNet2DConditionModel / AutoencoderKL module structure
# independently of convert.py.
# ---------------------------------------------------------------------------


def _df_resnet(sd, p, in_c, out_c, temb, r):
    _norm(sd, p + ".norm1", in_c, r)
    _conv3(sd, p + ".conv1", out_c, in_c, r)
    _linear(sd, p + ".time_emb_proj", out_c, temb, r)
    _norm(sd, p + ".norm2", out_c, r)
    _conv3(sd, p + ".conv2", out_c, out_c, r)
    if in_c != out_c:
        _conv3(sd, p + ".conv_shortcut", out_c, in_c, r, k=1)


def _df_transformer(sd, p, ch, ctx_dim, r, linear_proj: bool, depth: int = 1):
    _norm(sd, p + ".norm", ch, r)
    if linear_proj:
        _linear(sd, p + ".proj_in", ch, ch, r)
        _linear(sd, p + ".proj_out", ch, ch, r)
    else:
        _conv3(sd, p + ".proj_in", ch, ch, r, k=1)
        _conv3(sd, p + ".proj_out", ch, ch, r, k=1)
    for i in range(depth):
        tp = f"{p}.transformer_blocks.{i}"
        _norm(sd, tp + ".norm1", ch, r)
        for qkv, d in (("to_q", ch), ("to_k", ch), ("to_v", ch)):
            _linear(sd, f"{tp}.attn1.{qkv}", ch, d, r, bias=False)
        _linear(sd, tp + ".attn1.to_out.0", ch, ch, r)
        _norm(sd, tp + ".norm2", ch, r)
        _linear(sd, tp + ".attn2.to_q", ch, ch, r, bias=False)
        _linear(sd, tp + ".attn2.to_k", ch, ctx_dim, r, bias=False)
        _linear(sd, tp + ".attn2.to_v", ch, ctx_dim, r, bias=False)
        _linear(sd, tp + ".attn2.to_out.0", ch, ch, r)
        _norm(sd, tp + ".norm3", ch, r)
        _linear(sd, tp + ".ff.net.0.proj", ch * 8, ch, r)  # GEGLU 2x4x
        _linear(sd, tp + ".ff.net.2", ch, ch * 4, r)


def synth_diffusers_unet(cfg: UNetConfig, seed: int = 0) -> dict:
    """Random UNet2DConditionModel-layout state dict for ``cfg``."""
    r = _R(seed)
    sd: dict = {}
    ch = list(cfg.block_out_channels)
    temb = ch[0] * 4
    ctx = cfg.cross_attention_dim
    ulp = cfg.use_linear_projection
    _linear(sd, "time_embedding.linear_1", temb, ch[0], r)
    _linear(sd, "time_embedding.linear_2", temb, temb, r)
    _conv3(sd, "conv_in", ch[0], cfg.in_channels, r)
    h = ch[0]
    for i, btype in enumerate(cfg.down_block_types):
        for j in range(cfg.layers_per_block):
            _df_resnet(sd, f"down_blocks.{i}.resnets.{j}", h, ch[i], temb, r)
            h = ch[i]
            if btype == "CrossAttnDownBlock2D":
                _df_transformer(
                    sd, f"down_blocks.{i}.attentions.{j}", ch[i], ctx, r, ulp
                )
        if i < len(ch) - 1:
            _conv3(sd, f"down_blocks.{i}.downsamplers.0.conv", h, h, r)
    _df_resnet(sd, "mid_block.resnets.0", h, ch[-1], temb, r)
    _df_transformer(sd, "mid_block.attentions.0", ch[-1], ctx, r, ulp)
    _df_resnet(sd, "mid_block.resnets.1", ch[-1], ch[-1], temb, r)
    skips = [ch[0]]
    for i, btype in enumerate(cfg.down_block_types):
        for j in range(cfg.layers_per_block):
            skips.append(ch[i])
        if i < len(ch) - 1:
            skips.append(ch[i])
    rev = list(reversed(ch))
    for i, btype in enumerate(cfg.up_block_types):
        c = rev[i]
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            _df_resnet(sd, f"up_blocks.{i}.resnets.{j}", h + skip, c, temb, r)
            h = c
            if btype == "CrossAttnUpBlock2D":
                _df_transformer(
                    sd, f"up_blocks.{i}.attentions.{j}", c, ctx, r, ulp
                )
        if i < len(cfg.up_block_types) - 1:
            _conv3(sd, f"up_blocks.{i}.upsamplers.0.conv", h, h, r)
    _norm(sd, "conv_norm_out", h, r)
    _conv3(sd, "conv_out", cfg.out_channels, h, r)
    return sd


def synth_diffusers_vae(cfg: VAEConfig, seed: int = 1) -> dict:
    """Random AutoencoderKL-layout state dict for ``cfg``."""
    r = _R(seed)
    sd: dict = {}
    chans = list(cfg.block_out_channels)
    n = len(chans)
    lat = cfg.latent_channels

    def vres(p, in_c, out_c):
        _norm(sd, p + ".norm1", in_c, r)
        _conv3(sd, p + ".conv1", out_c, in_c, r)
        _norm(sd, p + ".norm2", out_c, r)
        _conv3(sd, p + ".conv2", out_c, out_c, r)
        if in_c != out_c:
            _conv3(sd, p + ".conv_shortcut", out_c, in_c, r, k=1)

    def vattn(p, c):
        _norm(sd, p + ".group_norm", c, r)
        for nm in ("to_q", "to_k", "to_v", "to_out.0"):
            _linear(sd, f"{p}.{nm}", c, c, r)

    _conv3(sd, "encoder.conv_in", chans[0], cfg.in_channels, r)
    h = chans[0]
    for i, ch in enumerate(chans):
        for j in range(cfg.layers_per_block):
            vres(f"encoder.down_blocks.{i}.resnets.{j}", h, ch)
            h = ch
        if i < n - 1:
            _conv3(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                   ch, ch, r)
    vres("encoder.mid_block.resnets.0", h, h)
    vattn("encoder.mid_block.attentions.0", h)
    vres("encoder.mid_block.resnets.1", h, h)
    _norm(sd, "encoder.conv_norm_out", h, r)
    _conv3(sd, "encoder.conv_out", 2 * lat, h, r)
    _conv3(sd, "quant_conv", 2 * lat, 2 * lat, r, k=1)

    _conv3(sd, "post_quant_conv", lat, lat, r, k=1)
    _conv3(sd, "decoder.conv_in", chans[-1], lat, r)
    h = chans[-1]
    vres("decoder.mid_block.resnets.0", h, h)
    vattn("decoder.mid_block.attentions.0", h)
    vres("decoder.mid_block.resnets.1", h, h)
    for i, ch in enumerate(reversed(chans)):
        for j in range(cfg.layers_per_block + 1):
            vres(f"decoder.up_blocks.{i}.resnets.{j}", h, ch)
            h = ch
        if i < n - 1:
            _conv3(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", ch, ch, r)
    _norm(sd, "decoder.conv_norm_out", h, r)
    _conv3(sd, "decoder.conv_out", cfg.in_channels, h, r)
    return sd


def synth_ldm_checkpoint(unet_cfg: UNetConfig,
                         vae_cfg: VAEConfig = TINY_VAE_CONFIG,
                         text_cfg: OpenCLIPTextConfig = TINY_TEXT_CONFIG,
                         seed: int = 0) -> dict:
    sd = synth_ldm_unet(unet_cfg, seed)
    sd.update(synth_ldm_vae(vae_cfg, seed + 1))
    sd.update(synth_open_clip_text(text_cfg, seed + 2))
    return sd


def write_tiny_tokenizer(path: str) -> str:
    """Minimal HF CLIPTokenizer files (char-level BPE, ascii letters)."""
    os.makedirs(path, exist_ok=True)
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    i = 2
    for c in "abcdefghijklmnopqrstuvwxyz0123456789":
        vocab[c] = i
        vocab[c + "</w>"] = i + 1
        i += 2
    with open(os.path.join(path, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(path, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    with open(os.path.join(path, "tokenizer_config.json"), "w") as f:
        json.dump({
            "model_max_length": 16,
            "bos_token": "<|startoftext|>",
            "eos_token": "<|endoftext|>",
            "unk_token": "<|endoftext|>",
            "tokenizer_class": "CLIPTokenizer",
        }, f)
    with open(os.path.join(path, "special_tokens_map.json"), "w") as f:
        json.dump({
            "bos_token": "<|startoftext|>",
            "eos_token": "<|endoftext|>",
            "unk_token": "<|endoftext|>",
        }, f)
    return path
