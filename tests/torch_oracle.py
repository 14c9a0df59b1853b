"""Independent torch oracles for the guidance networks.

Re-implements, in plain ``torch.nn.functional`` driven directly by the
checkpoint state dicts, the forward semantics of the torch models the
reference's guidance stack runs:

- the LDM openaimodel UNet as instantiated by MVDream / ImageDream
  (camera_embed MLP, 3D self-attention across views, IP-adapter
  image_embed resampler + to_k_ip/to_v_ip cross-attention) —
  /root/reference/guidance/mvdream_utils.py:28-29 build_model;
- the diffusers UNet2DConditionModel (SD 2.1-base and zero123 layouts) —
  /root/reference/guidance/sd_utils.py:33-45, /root/reference/zero123.py:435-446;
- the LDM and diffusers AutoencoderKL;
- the open_clip text transformer, penultimate layer (ldm
  FrozenOpenCLIPEmbedder contract).

Written independently of dreamgaussian_tpu/guidance/{unet,vae,convert}.py:
the torch side walks the TORCH module structure by state-dict key, so a
wrong transpose, block-order mistake, eps mismatch, or mis-mapped key in
convert.py shows up as a numeric diff in test_torch_oracle.py. Everything
runs in float32 under torch.no_grad().
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(sd, k):
    return torch.from_numpy(np.asarray(sd[k]))


def _lin(sd, p, x):
    bias = _t(sd, p + ".bias") if p + ".bias" in sd else None
    return F.linear(x, _t(sd, p + ".weight"), bias)


def _conv(sd, p, x, stride=1, padding=1):
    return F.conv2d(x, _t(sd, p + ".weight"), _t(sd, p + ".bias"),
                    stride=stride, padding=padding)


def _gn(sd, p, x, eps=1e-5):
    w = _t(sd, p + ".weight")
    groups = math.gcd(32, w.shape[0])  # real ckpts: always 32
    return F.group_norm(x, groups, w, _t(sd, p + ".bias"), eps)


def _ln(sd, p, x, eps=1e-5):
    return F.layer_norm(x, x.shape[-1:], _t(sd, p + ".weight"),
                        _t(sd, p + ".bias"), eps)


def _attention(q, k, v, heads):
    b, n, c = q.shape
    m = k.shape[1]
    d = c // heads
    q = q.reshape(b, n, heads, d).transpose(1, 2)
    k = k.reshape(b, m, heads, d).transpose(1, 2)
    v = v.reshape(b, m, heads, d).transpose(1, 2)
    w = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1)
    return (w @ v).transpose(1, 2).reshape(b, n, c)


def timestep_embedding(t, dim):
    """[cos, sin] sinusoid — ldm openaimodel convention, identical to
    diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _transformer_block(sd, tp, x, ctx, heads, num_views=1, ip_dim=0,
                       ip_weight=1.0):
    """BasicTransformerBlock (diffusers) / BasicTransformerBlock3D
    (mvdream attention.py: the V views of a batch group attend jointly in
    attn1) with ImageDream's IP-adapter split in attn2."""
    h = _ln(sd, tp + ".norm1", x)
    if num_views > 1:
        bv, n, c = h.shape
        h = h.reshape(bv // num_views, num_views * n, c)
    q = _lin(sd, tp + ".attn1.to_q", h)
    k = _lin(sd, tp + ".attn1.to_k", h)
    v = _lin(sd, tp + ".attn1.to_v", h)
    h = _attention(q, k, v, heads)
    h = _lin(sd, tp + ".attn1.to_out.0", h)
    if num_views > 1:
        h = h.reshape(bv, n, c)
    x = x + h

    h = _ln(sd, tp + ".norm2", x)
    c_txt, c_ip = ctx, None
    if ip_dim:
        c_txt, c_ip = ctx[:, :-ip_dim], ctx[:, -ip_dim:]
    q = _lin(sd, tp + ".attn2.to_q", h)
    out = _attention(
        q, _lin(sd, tp + ".attn2.to_k", c_txt),
        _lin(sd, tp + ".attn2.to_v", c_txt), heads,
    )
    if c_ip is not None:
        out = out + ip_weight * _attention(
            q, _lin(sd, tp + ".attn2.to_k_ip", c_ip),
            _lin(sd, tp + ".attn2.to_v_ip", c_ip), heads,
        )
    x = x + _lin(sd, tp + ".attn2.to_out.0", out)

    h = _ln(sd, tp + ".norm3", x)
    h = _lin(sd, tp + ".ff.net.0.proj", h)
    h, gate = h.chunk(2, dim=-1)
    h = h * F.gelu(gate)  # GEGLU, exact erf gelu
    return x + _lin(sd, tp + ".ff.net.2", h)


def _spatial_transformer(sd, p, x, ctx, heads, linear_proj, num_views=1,
                         ip_dim=0, ip_weight=1.0):
    """diffusers Transformer2DModel / ldm SpatialTransformer (norm eps
    1e-6 in both, unlike the 1e-5 resnet norms)."""
    b, c, hh, ww = x.shape
    res = x
    h = _gn(sd, p + ".norm", x, eps=1e-6)
    if linear_proj:
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = _lin(sd, p + ".proj_in", h)
    else:
        h = _conv(sd, p + ".proj_in", h, padding=0)
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, -1)
    i = 0
    while f"{p}.transformer_blocks.{i}.norm1.weight" in sd:
        h = _transformer_block(
            sd, f"{p}.transformer_blocks.{i}", h, ctx, heads,
            num_views, ip_dim, ip_weight,
        )
        i += 1
    if linear_proj:
        h = _lin(sd, p + ".proj_out", h)
        h = h.reshape(b, hh, ww, -1).permute(0, 3, 1, 2)
    else:
        h = h.reshape(b, hh, ww, -1).permute(0, 3, 1, 2)
        h = _conv(sd, p + ".proj_out", h, padding=0)
    return h + res


def _resampler(sd, p, x, heads):
    """IP-adapter Resampler (ImageDream image_embed): learned latents,
    PerceiverAttention + no-bias FF blocks, proj_out + norm_out."""
    lat = _t(sd, p + ".latents").repeat(x.shape[0], 1, 1)
    x = _lin(sd, p + ".proj_in", x)
    i = 0
    while f"{p}.layers.{i}.0.to_q.weight" in sd:
        lp = f"{p}.layers.{i}"
        xn = _ln(sd, lp + ".0.norm1", x)
        latn = _ln(sd, lp + ".0.norm2", lat)
        q = _lin(sd, lp + ".0.to_q", latn)
        kv = _lin(sd, lp + ".0.to_kv", torch.cat([xn, latn], dim=-2))
        k, v = kv.chunk(2, dim=-1)
        lat = lat + _lin(sd, lp + ".0.to_out", _attention(q, k, v, heads))
        h = _ln(sd, lp + ".1.0", lat)
        h = F.gelu(_lin(sd, lp + ".1.1", h))
        lat = lat + _lin(sd, lp + ".1.3", h)
        i += 1
    return _ln(sd, p + ".norm_out", _lin(sd, p + ".proj_out", lat))


# ---------------------------------------------------------------------------
# LDM openaimodel UNet (MVDream / ImageDream single-file checkpoints)
# ---------------------------------------------------------------------------


def _ldm_resnet(sd, p, x, temb):
    h = _gn(sd, p + ".in_layers.0", x)
    h = _conv(sd, p + ".in_layers.2", F.silu(h))
    h = h + _lin(sd, p + ".emb_layers.1", F.silu(temb))[:, :, None, None]
    h = _gn(sd, p + ".out_layers.0", h)
    h = _conv(sd, p + ".out_layers.3", F.silu(h))
    if p + ".skip_connection.weight" in sd:
        x = _conv(sd, p + ".skip_connection", x, padding=0)
    return x + h


@torch.no_grad()
def ldm_unet_forward(sd, cfg, x, t, ctx, camera=None, ip=None, ip_img=None,
                     prefix="model.diffusion_model."):
    """x: [B, C, H, W]; t: [B]; ctx: [B, L, D]; camera: [B, 16];
    ip: [B, L_ip, ip_embed_dim]; ip_img: [B // num_views, 4, h, w]."""
    g = lambda n: prefix + n  # noqa: E731
    x, t, ctx = x.float(), t.float(), ctx.float()
    ch0 = cfg.block_out_channels[0]
    temb = timestep_embedding(t, ch0)
    temb = _lin(sd, g("time_embed.2"), F.silu(_lin(sd, g("time_embed.0"), temb)))
    if camera is not None:
        temb = temb + _lin(
            sd, g("camera_embed.2"),
            F.silu(_lin(sd, g("camera_embed.0"), camera.float())),
        )
    if ip_img is not None:
        v = cfg.num_views
        b = x.shape[0]
        x = x.clone().reshape(b // v, v, *x.shape[1:])
        x[:, -1] = ip_img.float()
        x = x.reshape(b, *x.shape[2:])
    ip_dim = 0
    if ip is not None:
        tokens = _resampler(sd, g("image_embed"), ip.float(),
                            cfg.ip_resampler_heads)
        ctx = torch.cat([ctx, tokens], dim=1)
        ip_dim = cfg.ip_dim

    def xf(key, h, ch):
        return _spatial_transformer(
            sd, key, h, ctx, cfg.heads_for(ch), cfg.use_linear_projection,
            cfg.num_views, ip_dim, cfg.ip_weight,
        )

    h = _conv(sd, g("input_blocks.0.0"), x)
    skips = [h]
    ib = 1
    for i, btype in enumerate(cfg.down_block_types):
        ch = cfg.block_out_channels[i]
        for _ in range(cfg.layers_per_block):
            h = _ldm_resnet(sd, g(f"input_blocks.{ib}.0"), h, temb)
            if btype == "CrossAttnDownBlock2D":
                h = xf(g(f"input_blocks.{ib}.1"), h, ch)
            skips.append(h)
            ib += 1
        if i < len(cfg.block_out_channels) - 1:
            h = _conv(sd, g(f"input_blocks.{ib}.0.op"), h, stride=2)
            skips.append(h)
            ib += 1

    chm = cfg.block_out_channels[-1]
    h = _ldm_resnet(sd, g("middle_block.0"), h, temb)
    h = xf(g("middle_block.1"), h, chm)
    h = _ldm_resnet(sd, g("middle_block.2"), h, temb)

    rev = list(reversed(cfg.block_out_channels))
    ob = 0
    for i, btype in enumerate(cfg.up_block_types):
        ch = rev[i]
        for j in range(cfg.layers_per_block + 1):
            h = torch.cat([h, skips.pop()], dim=1)
            h = _ldm_resnet(sd, g(f"output_blocks.{ob}.0"), h, temb)
            sub = 1
            if btype == "CrossAttnUpBlock2D":
                h = xf(g(f"output_blocks.{ob}.{sub}"), h, ch)
                sub += 1
            if (j == cfg.layers_per_block
                    and i < len(cfg.up_block_types) - 1):
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = _conv(sd, g(f"output_blocks.{ob}.{sub}.conv"), h)
            ob += 1

    h = F.silu(_gn(sd, g("out.0"), h))
    return _conv(sd, g("out.2"), h)


# ---------------------------------------------------------------------------
# Diffusers UNet2DConditionModel (SD 2.1-base / zero123 snapshots)
# ---------------------------------------------------------------------------


def _df_resnet(sd, p, x, temb):
    h = _conv(sd, p + ".conv1", F.silu(_gn(sd, p + ".norm1", x)))
    h = h + _lin(sd, p + ".time_emb_proj", F.silu(temb))[:, :, None, None]
    h = _conv(sd, p + ".conv2", F.silu(_gn(sd, p + ".norm2", h)))
    if p + ".conv_shortcut.weight" in sd:
        x = _conv(sd, p + ".conv_shortcut", x, padding=0)
    return x + h


@torch.no_grad()
def diffusers_unet_forward(sd, cfg, x, t, ctx):
    """x: [B, C, H, W]; t: [B]; ctx: [B, L, D]."""
    x, t, ctx = x.float(), t.float(), ctx.float()
    ch0 = cfg.block_out_channels[0]
    temb = timestep_embedding(t, ch0)
    temb = _lin(sd, "time_embedding.linear_2",
                F.silu(_lin(sd, "time_embedding.linear_1", temb)))

    def xf(key, h, ch):
        return _spatial_transformer(
            sd, key, h, ctx, cfg.heads_for(ch), cfg.use_linear_projection,
        )

    h = _conv(sd, "conv_in", x)
    skips = [h]
    for i, btype in enumerate(cfg.down_block_types):
        ch = cfg.block_out_channels[i]
        for j in range(cfg.layers_per_block):
            h = _df_resnet(sd, f"down_blocks.{i}.resnets.{j}", h, temb)
            if btype == "CrossAttnDownBlock2D":
                h = xf(f"down_blocks.{i}.attentions.{j}", h, ch)
            skips.append(h)
        if i < len(cfg.block_out_channels) - 1:
            h = _conv(sd, f"down_blocks.{i}.downsamplers.0.conv", h, stride=2)
            skips.append(h)

    chm = cfg.block_out_channels[-1]
    h = _df_resnet(sd, "mid_block.resnets.0", h, temb)
    h = xf("mid_block.attentions.0", h, chm)
    h = _df_resnet(sd, "mid_block.resnets.1", h, temb)

    rev = list(reversed(cfg.block_out_channels))
    for i, btype in enumerate(cfg.up_block_types):
        ch = rev[i]
        for j in range(cfg.layers_per_block + 1):
            h = torch.cat([h, skips.pop()], dim=1)
            h = _df_resnet(sd, f"up_blocks.{i}.resnets.{j}", h, temb)
            if btype == "CrossAttnUpBlock2D":
                h = xf(f"up_blocks.{i}.attentions.{j}", h, ch)
        if i < len(cfg.up_block_types) - 1:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = _conv(sd, f"up_blocks.{i}.upsamplers.0.conv", h)

    h = F.silu(_gn(sd, "conv_norm_out", h))
    return _conv(sd, "conv_out", h)


# ---------------------------------------------------------------------------
# AutoencoderKL (both layouts)
# ---------------------------------------------------------------------------


def _vae_attn_tokens(sd, p, h, q_name, k_name, v_name, o_name, conv_qkv):
    """Single-head spatial self-attention shared by both VAE layouts."""
    b, c, hh, ww = h.shape

    def proj(name):
        if conv_qkv:
            y = _conv(sd, f"{p}.{name}", h_norm, padding=0)
            return y.reshape(b, c, hh * ww).permute(0, 2, 1)
        y = h_norm.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        return _lin(sd, f"{p}.{name}", y)

    h_norm = _gn(sd, p + "." + ("norm" if conv_qkv else "group_norm"), h,
                 eps=1e-6)
    q, k, v = proj(q_name), proj(k_name), proj(v_name)
    o = _attention(q, k, v, heads=1)
    if conv_qkv:
        o = o.permute(0, 2, 1).reshape(b, c, hh, ww)
        return h + _conv(sd, f"{p}.{o_name}", o, padding=0)
    o = _lin(sd, f"{p}.{o_name}", o)
    return h + o.permute(0, 2, 1).reshape(b, c, hh, ww)


def _vae_resnet(sd, p, x, ldm: bool):
    h = _conv(sd, p + ".conv1", F.silu(_gn(sd, p + ".norm1", x, eps=1e-6)))
    h = _conv(sd, p + ".conv2", F.silu(_gn(sd, p + ".norm2", h, eps=1e-6)))
    short = ".nin_shortcut" if ldm else ".conv_shortcut"
    if p + short + ".weight" in sd:
        x = _conv(sd, p + short, x, padding=0)
    return x + h


@torch.no_grad()
def vae_encode_moments(sd, cfg, x, layout="ldm", prefix="first_stage_model."):
    """[B, 3, H, W] -> [B, 2*latent, H/8, W/8] moments (after quant_conv)."""
    ldm = layout == "ldm"
    g = (lambda n: prefix + n) if ldm else (lambda n: n)
    x = x.float()
    n = len(cfg.block_out_channels)

    def down_key(i, j):
        return (g(f"encoder.down.{i}.block.{j}") if ldm
                else f"encoder.down_blocks.{i}.resnets.{j}")

    h = _conv(sd, g("encoder.conv_in"), x)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            h = _vae_resnet(sd, down_key(i, j), h, ldm)
        if i < n - 1:
            key = (g(f"encoder.down.{i}.downsample.conv") if ldm
                   else f"encoder.down_blocks.{i}.downsamplers.0.conv")
            h = F.pad(h, (0, 1, 0, 1))
            h = _conv(sd, key, h, stride=2, padding=0)
    if ldm:
        h = _vae_resnet(sd, g("encoder.mid.block_1"), h, True)
        h = _vae_attn_tokens(sd, g("encoder.mid.attn_1"), h,
                             "q", "k", "v", "proj_out", conv_qkv=True)
        h = _vae_resnet(sd, g("encoder.mid.block_2"), h, True)
        h = F.silu(_gn(sd, g("encoder.norm_out"), h, eps=1e-6))
    else:
        h = _vae_resnet(sd, "encoder.mid_block.resnets.0", h, False)
        h = _vae_attn_tokens(sd, "encoder.mid_block.attentions.0", h,
                             "to_q", "to_k", "to_v", "to_out.0",
                             conv_qkv=False)
        h = _vae_resnet(sd, "encoder.mid_block.resnets.1", h, False)
        h = F.silu(_gn(sd, "encoder.conv_norm_out", h, eps=1e-6))
    h = _conv(sd, g("encoder.conv_out"), h)
    return _conv(sd, g("quant_conv"), h, padding=0)


@torch.no_grad()
def vae_decode(sd, cfg, z, layout="ldm", prefix="first_stage_model."):
    """[B, latent, h, w] (UNSCALED) -> [B, 3, H, W]."""
    ldm = layout == "ldm"
    g = (lambda n: prefix + n) if ldm else (lambda n: n)
    z = z.float()
    n = len(cfg.block_out_channels)
    h = _conv(sd, g("post_quant_conv"), z, padding=0)
    h = _conv(sd, g("decoder.conv_in"), h)
    if ldm:
        h = _vae_resnet(sd, g("decoder.mid.block_1"), h, True)
        h = _vae_attn_tokens(sd, g("decoder.mid.attn_1"), h,
                             "q", "k", "v", "proj_out", conv_qkv=True)
        h = _vae_resnet(sd, g("decoder.mid.block_2"), h, True)
    else:
        h = _vae_resnet(sd, "decoder.mid_block.resnets.0", h, False)
        h = _vae_attn_tokens(sd, "decoder.mid_block.attentions.0", h,
                             "to_q", "to_k", "to_v", "to_out.0",
                             conv_qkv=False)
        h = _vae_resnet(sd, "decoder.mid_block.resnets.1", h, False)
    # ldm indexes decoder.up by resolution level, applied in reverse.
    for i in range(n):
        lvl = n - 1 - i
        for j in range(cfg.layers_per_block + 1):
            key = (g(f"decoder.up.{lvl}.block.{j}") if ldm
                   else f"decoder.up_blocks.{i}.resnets.{j}")
            h = _vae_resnet(sd, key, h, ldm)
        if i < n - 1:
            key = (g(f"decoder.up.{lvl}.upsample.conv") if ldm
                   else f"decoder.up_blocks.{i}.upsamplers.0.conv")
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = _conv(sd, key, h)
    h = F.silu(_gn(sd, g("decoder.norm_out" if ldm else "decoder.conv_norm_out"),
                   h, eps=1e-6))
    return _conv(sd, g("decoder.conv_out"), h)


# ---------------------------------------------------------------------------
# open_clip text transformer (penultimate layer)
# ---------------------------------------------------------------------------


@torch.no_grad()
def open_clip_text_forward(sd, cfg, ids, prefix="cond_stage_model.model."):
    """ids: [B, n] int -> [B, n, width] penultimate states after ln_final.

    Uses F.multi_head_attention_forward — the exact kernel behind the
    nn.MultiheadAttention open_clip's ResidualAttentionBlock wraps."""
    g = lambda n: prefix + n  # noqa: E731
    tok = _t(sd, g("token_embedding.weight"))
    x = tok[torch.as_tensor(np.asarray(ids), dtype=torch.long)]
    x = x + _t(sd, g("positional_embedding"))[None]
    n = x.shape[1]
    mask = torch.full((n, n), float("-inf")).triu(1)
    n_blocks = cfg.layers - (1 if cfg.penultimate else 0)
    for i in range(n_blocks):
        bp = g(f"transformer.resblocks.{i}")
        h = _ln(sd, bp + ".ln_1", x)
        attn_out, _ = F.multi_head_attention_forward(
            h.transpose(0, 1), h.transpose(0, 1), h.transpose(0, 1),
            embed_dim_to_check=cfg.width, num_heads=cfg.heads,
            in_proj_weight=_t(sd, bp + ".attn.in_proj_weight"),
            in_proj_bias=_t(sd, bp + ".attn.in_proj_bias"),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
            out_proj_weight=_t(sd, bp + ".attn.out_proj.weight"),
            out_proj_bias=_t(sd, bp + ".attn.out_proj.bias"),
            need_weights=False, attn_mask=mask,
        )
        x = x + attn_out.transpose(0, 1)
        h = _ln(sd, bp + ".ln_2", x)
        h = F.gelu(_lin(sd, bp + ".mlp.c_fc", h))
        x = x + _lin(sd, bp + ".mlp.c_proj", h)
    return _ln(sd, g("ln_final"), x)


# ---------------------------------------------------------------------------
# DDIM img2img refine oracle (the stage-2 training signal)
# ---------------------------------------------------------------------------


def ddim_alphas_cumprod(num_train_timesteps=1000, beta_start=0.00085,
                        beta_end=0.012):
    """scaled_linear betas in float64, as diffusers DDIMScheduler."""
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                        num_train_timesteps, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas).astype(np.float32)


def ddim_img2img_refine(unet_sd, unet_cfg, vae_sd, vae_cfg, images, noise,
                        cam_tokens, vae_emb, steps, strength,
                        guidance_scale, num_train_timesteps=1000):
    """Independent torch img2img DDIM tail: the refine loop of
    /root/reference/guidance/zero123_utils.py:75-118 re-derived from
    diffusers semantics (leading-spaced descending timesteps, eta=0
    update, final_alpha_cumprod = alphas_cumprod[0], epsilon
    prediction), NOT a port of guidance/sds.py.

    images: [B,3,H,W] in [0,1]; noise: [B,4,h,w] (the q-sample draw);
    cam_tokens: [B,1,D] conditioned context; vae_emb: [B,4,h,w] the
    reference-image latent concatenated on channels (zero123's 8-ch
    input). Returns decoded images [B,3,H,W] in [0,1].
    """
    ac = torch.from_numpy(ddim_alphas_cumprod(num_train_timesteps))
    scaling = vae_cfg.scaling_factor

    x = images * 2.0 - 1.0
    moments = vae_encode_moments(vae_sd, vae_cfg, x, layout="diffusers")
    lat = moments[:, : moments.shape[1] // 2] * scaling

    spacing = num_train_timesteps // steps
    ts = (np.arange(steps)[::-1] * spacing).astype(np.int64)
    init_step = int(np.clip(np.floor(steps * strength), 0, steps - 1))
    t0 = int(ts[init_step])
    lat = ac[t0].sqrt() * lat + (1.0 - ac[t0]).sqrt() * noise

    b = lat.shape[0]
    ctx = torch.cat([cam_tokens, torch.zeros_like(cam_tokens)])
    vae_in = torch.cat([vae_emb, torch.zeros_like(vae_emb)])
    for i in range(init_step, steps):
        t = int(ts[i])
        x_in = torch.cat([torch.cat([lat] * 2), vae_in], dim=1)
        t_in = torch.full((2 * b,), float(t))
        eps = diffusers_unet_forward(unet_sd, unet_cfg, x_in, t_in, ctx)
        eps_cond, eps_uncond = eps.chunk(2)
        eps_hat = eps_uncond + guidance_scale * (eps_cond - eps_uncond)

        prev_t = t - spacing
        a_t = ac[t]
        a_prev = ac[prev_t] if prev_t >= 0 else ac[0]
        x0 = (lat - (1.0 - a_t).sqrt() * eps_hat) / a_t.sqrt()
        lat = a_prev.sqrt() * x0 + (1.0 - a_prev).sqrt() * eps_hat

    dec = vae_decode(vae_sd, vae_cfg, lat / scaling, layout="diffusers")
    return (dec * 0.5 + 0.5).clamp(0.0, 1.0)
