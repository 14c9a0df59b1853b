"""Weight-conversion tests: synthetic diffusers-style state dicts at tiny
configs, converted and checked against module init trees + value spots."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamgaussian_tpu.guidance.convert import (
    assert_tree_shapes_match,
    convert_unet,
    convert_vae,
)
from dreamgaussian_tpu.guidance.unet import UNet, UNetConfig
from dreamgaussian_tpu.guidance.vae import AutoencoderKL, VAEConfig

RNG = np.random.default_rng(0)


def t_lin(sd, name, din, dout, bias=True):
    sd[name + ".weight"] = RNG.normal(size=(dout, din)).astype(np.float32)
    if bias:
        sd[name + ".bias"] = RNG.normal(size=(dout,)).astype(np.float32)


def t_conv(sd, name, cin, cout, k=3):
    sd[name + ".weight"] = RNG.normal(size=(cout, cin, k, k)).astype(np.float32)
    sd[name + ".bias"] = RNG.normal(size=(cout,)).astype(np.float32)


def t_norm(sd, name, c):
    sd[name + ".weight"] = RNG.normal(size=(c,)).astype(np.float32)
    sd[name + ".bias"] = RNG.normal(size=(c,)).astype(np.float32)


def t_resnet(sd, p, cin, cout, temb):
    t_norm(sd, p + ".norm1", cin)
    t_conv(sd, p + ".conv1", cin, cout)
    t_lin(sd, p + ".time_emb_proj", temb, cout)
    t_norm(sd, p + ".norm2", cout)
    t_conv(sd, p + ".conv2", cout, cout)
    if cin != cout:
        t_conv(sd, p + ".conv_shortcut", cin, cout, k=1)


def t_attnblock(sd, p, c, ctx, linear_proj, depth=1):
    t_norm(sd, p + ".norm", c)
    if linear_proj:
        t_lin(sd, p + ".proj_in", c, c)
        t_lin(sd, p + ".proj_out", c, c)
    else:
        t_conv(sd, p + ".proj_in", c, c, k=1)
        t_conv(sd, p + ".proj_out", c, c, k=1)
    for i in range(depth):
        tp = f"{p}.transformer_blocks.{i}"
        t_norm(sd, tp + ".norm1", c)
        for a, d in (("attn1", c), ("attn2", ctx)):
            t_lin(sd, f"{tp}.{a}.to_q", c, c, bias=False)
            t_lin(sd, f"{tp}.{a}.to_k", d, c, bias=False)
            t_lin(sd, f"{tp}.{a}.to_v", d, c, bias=False)
            t_lin(sd, f"{tp}.{a}.to_out.0", c, c)
        t_norm(sd, tp + ".norm2", c)
        t_norm(sd, tp + ".norm3", c)
        t_lin(sd, tp + ".ff.net.0.proj", c, c * 8)
        t_lin(sd, tp + ".ff.net.2", c * 4, c)


def make_unet_sd(cfg: UNetConfig) -> dict:
    """Synthesize a diffusers-convention UNet state dict for cfg."""
    sd: dict = {}
    ch = list(cfg.block_out_channels)
    temb = ch[0] * 4
    ctx = cfg.cross_attention_dim
    ulp = cfg.use_linear_projection
    t_lin(sd, "time_embedding.linear_1", ch[0], temb)
    t_lin(sd, "time_embedding.linear_2", temb, temb)
    t_conv(sd, "conv_in", cfg.in_channels, ch[0])
    cin = ch[0]
    skips = [ch[0]]
    for i, btype in enumerate(cfg.down_block_types):
        for j in range(cfg.layers_per_block):
            t_resnet(sd, f"down_blocks.{i}.resnets.{j}", cin, ch[i], temb)
            cin = ch[i]
            if btype == "CrossAttnDownBlock2D":
                t_attnblock(sd, f"down_blocks.{i}.attentions.{j}", ch[i],
                            ctx, ulp)
            skips.append(cin)
        if i < len(ch) - 1:
            t_conv(sd, f"down_blocks.{i}.downsamplers.0.conv", cin, cin)
            skips.append(cin)
    t_resnet(sd, "mid_block.resnets.0", cin, ch[-1], temb)
    t_attnblock(sd, "mid_block.attentions.0", ch[-1], ctx, ulp)
    t_resnet(sd, "mid_block.resnets.1", ch[-1], ch[-1], temb)
    rev = list(reversed(ch))
    for i, btype in enumerate(cfg.up_block_types):
        c = rev[i]
        for j in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            t_resnet(sd, f"up_blocks.{i}.resnets.{j}", cin + skip, c, temb)
            cin = c
            if btype == "CrossAttnUpBlock2D":
                t_attnblock(sd, f"up_blocks.{i}.attentions.{j}", c, ctx, ulp)
        if i < len(cfg.up_block_types) - 1:
            t_conv(sd, f"up_blocks.{i}.upsamplers.0.conv", cin, cin)
    t_norm(sd, "conv_norm_out", cin)
    t_conv(sd, "conv_out", cin, cfg.out_channels)
    return sd


@pytest.mark.parametrize("linear_proj", [True, False])
def test_unet_convert_matches_init_tree(linear_proj):
    cfg = UNetConfig(
        block_out_channels=(8, 16), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        use_linear_projection=linear_proj,
    )
    unet = UNet(cfg)
    init = unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 3, 16)),
    )
    sd = make_unet_sd(cfg)
    conv = convert_unet(sd, cfg)
    assert_tree_shapes_match(conv["params"], init["params"])

    # spot-check value placement + transposition
    np.testing.assert_allclose(
        conv["params"]["conv_in"]["kernel"],
        sd["conv_in.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        conv["params"]["time_embedding"]["linear_1"]["kernel"],
        sd["time_embedding.linear_1.weight"].T,
    )
    tb = conv["params"]["down_0_attn_0"]["transformer_blocks_0"]
    np.testing.assert_allclose(
        tb["attn2"]["to_k"]["kernel"],
        sd["down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight"].T,
    )

    # converted weights actually run through the model
    out = unet.apply(conv, jnp.ones((1, 16, 16, 4)), jnp.ones((1,)),
                     jnp.zeros((1, 3, 16)))
    assert np.isfinite(np.asarray(out)).all()


def make_vae_sd(cfg: VAEConfig) -> dict:
    sd: dict = {}
    ch = list(cfg.block_out_channels)
    t_conv(sd, "encoder.conv_in", cfg.in_channels, ch[0])
    cin = ch[0]
    for i in range(len(ch)):
        for j in range(cfg.layers_per_block):
            p = f"encoder.down_blocks.{i}.resnets.{j}"
            t_norm(sd, p + ".norm1", cin)
            t_conv(sd, p + ".conv1", cin, ch[i])
            t_norm(sd, p + ".norm2", ch[i])
            t_conv(sd, p + ".conv2", ch[i], ch[i])
            if cin != ch[i]:
                t_conv(sd, p + ".conv_shortcut", cin, ch[i], k=1)
            cin = ch[i]
        if i < len(ch) - 1:
            t_conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", cin, cin)

    def vres(p, c):
        t_norm(sd, p + ".norm1", c)
        t_conv(sd, p + ".conv1", c, c)
        t_norm(sd, p + ".norm2", c)
        t_conv(sd, p + ".conv2", c, c)

    def vattn(p, c):
        t_norm(sd, p + ".group_norm", c)
        t_lin(sd, p + ".to_q", c, c)
        t_lin(sd, p + ".to_k", c, c)
        t_lin(sd, p + ".to_v", c, c)
        t_lin(sd, p + ".to_out.0", c, c)

    vres("encoder.mid_block.resnets.0", ch[-1])
    vattn("encoder.mid_block.attentions.0", ch[-1])
    vres("encoder.mid_block.resnets.1", ch[-1])
    t_norm(sd, "encoder.conv_norm_out", ch[-1])
    t_conv(sd, "encoder.conv_out", ch[-1], 2 * cfg.latent_channels)
    t_conv(sd, "quant_conv", 2 * cfg.latent_channels, 2 * cfg.latent_channels,
           k=1)
    t_conv(sd, "post_quant_conv", cfg.latent_channels, cfg.latent_channels,
           k=1)
    t_conv(sd, "decoder.conv_in", cfg.latent_channels, ch[-1])
    vres("decoder.mid_block.resnets.0", ch[-1])
    vattn("decoder.mid_block.attentions.0", ch[-1])
    vres("decoder.mid_block.resnets.1", ch[-1])
    cin = ch[-1]
    rev = list(reversed(ch))
    for i in range(len(rev)):
        for j in range(cfg.layers_per_block + 1):
            p = f"decoder.up_blocks.{i}.resnets.{j}"
            t_norm(sd, p + ".norm1", cin)
            t_conv(sd, p + ".conv1", cin, rev[i])
            t_norm(sd, p + ".norm2", rev[i])
            t_conv(sd, p + ".conv2", rev[i], rev[i])
            if cin != rev[i]:
                t_conv(sd, p + ".conv_shortcut", cin, rev[i], k=1)
            cin = rev[i]
        if i < len(rev) - 1:
            t_conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", cin, cin)
    t_norm(sd, "decoder.conv_norm_out", cin)
    t_conv(sd, "decoder.conv_out", cin, cfg.in_channels)
    return sd


def test_vae_convert_matches_init_tree():
    cfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1)
    vae = AutoencoderKL(cfg)
    init = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    sd = make_vae_sd(cfg)
    conv = convert_vae(sd, cfg)
    assert_tree_shapes_match(conv["params"], init["params"])
    z = vae.apply(conv, jnp.ones((1, 32, 32, 3)), method=vae.encode)
    out = vae.apply(conv, z, method=vae.decode)
    assert np.isfinite(np.asarray(out)).all()
