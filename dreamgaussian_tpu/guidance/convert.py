"""Torch checkpoint -> Flax params conversion (diffusers AND ldm layouts).

Maps HF diffusers ``UNet2DConditionModel`` / ``AutoencoderKL`` state dicts
onto the param trees of our NHWC Flax modules (guidance/unet.py, vae.py).
The reference consumes these exact checkpoints — SD 2.1-base
(/root/reference/guidance/sd_utils.py:33-45) and
``ashawkey/zero123-xl-diffusers`` (/root/reference/main.py:156-159) — so a
user can point ``sd_ckpt`` / ``zero123_ckpt`` at a downloaded snapshot and
run without torch at inference time.

Also maps the **single-file LDM layout** that MVDream / ImageDream ship
(``sd-v2.1-base-4view[-ipmv].pt`` loaded by their pip packages'
``build_model``, /root/reference/guidance/mvdream_utils.py:28-29): keys
``model.diffusion_model.*`` (UNet incl. ``camera_embed`` and ImageDream's
``image_embed`` resampler + ``to_k_ip``/``to_v_ip``),
``first_stage_model.*`` (VAE) and ``cond_stage_model.model.*`` (open_clip
text tower) — see convert_ldm_unet / convert_ldm_vae /
convert_open_clip_text.

Layout rules:
- torch Linear weight [out, in]   -> flax Dense kernel [in, out] (T)
- torch Conv weight OIHW          -> flax Conv kernel HWIO (2,3,1,0)
- torch *Norm weight/bias         -> flax scale/bias
"""

from __future__ import annotations

import os
from typing import Mapping

import numpy as np


def load_torch_state_dict(path_or_dir: str, subfolder: str = "") -> dict:
    """Load a state dict from a .safetensors / .bin file or a diffusers
    model directory."""
    root = os.path.join(path_or_dir, subfolder) if subfolder else path_or_dir
    if os.path.isdir(root):
        for name in (
            "diffusion_pytorch_model.safetensors",
            "diffusion_pytorch_model.bin",
            "model.safetensors",
            "pytorch_model.bin",
        ):
            p = os.path.join(root, name)
            if os.path.exists(p):
                root = p
                break
        else:
            raise FileNotFoundError(f"no model weights found under {root}")
    if root.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(root, framework="np") as f:
            for k in f.keys():
                out[k] = np.asarray(f.get_tensor(k))
        return out
    import torch

    sd = torch.load(root, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def _lin(sd, prefix):
    p = {"kernel": np.ascontiguousarray(sd[prefix + ".weight"].T)}
    if prefix + ".bias" in sd:
        p["bias"] = sd[prefix + ".bias"]
    return p


def _conv(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(
            sd[prefix + ".weight"].transpose(2, 3, 1, 0)
        ),
        "bias": sd[prefix + ".bias"],
    }


def _norm(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def _gn32(sd, prefix):
    """Our GroupNorm32 wraps an anonymous nn.GroupNorm submodule."""
    return {"GroupNorm_0": _norm(sd, prefix)}


def _resnet(sd, p):
    out = {
        "norm1": _gn32(sd, p + ".norm1"),
        "conv1": _conv(sd, p + ".conv1"),
        "time_emb_proj": _lin(sd, p + ".time_emb_proj"),
        "norm2": _gn32(sd, p + ".norm2"),
        "conv2": _conv(sd, p + ".conv2"),
    }
    if p + ".conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, p + ".conv_shortcut")
    return out


def _attention_block(sd, p, use_linear_projection: bool):
    proj = _lin if use_linear_projection else _conv
    out = {
        "norm": _gn32(sd, p + ".norm"),
        "proj_in": proj(sd, p + ".proj_in"),
        "proj_out": proj(sd, p + ".proj_out"),
    }
    i = 0
    while f"{p}.transformer_blocks.{i}.norm1.weight" in sd:
        tp = f"{p}.transformer_blocks.{i}"
        out[f"transformer_blocks_{i}"] = {
            "norm1": _norm(sd, tp + ".norm1"),
            "attn1": {
                "to_q": _lin(sd, tp + ".attn1.to_q"),
                "to_k": _lin(sd, tp + ".attn1.to_k"),
                "to_v": _lin(sd, tp + ".attn1.to_v"),
                "to_out_0": _lin(sd, tp + ".attn1.to_out.0"),
            },
            "norm2": _norm(sd, tp + ".norm2"),
            "attn2": {
                "to_q": _lin(sd, tp + ".attn2.to_q"),
                "to_k": _lin(sd, tp + ".attn2.to_k"),
                "to_v": _lin(sd, tp + ".attn2.to_v"),
                "to_out_0": _lin(sd, tp + ".attn2.to_out.0"),
            },
            "norm3": _norm(sd, tp + ".norm3"),
            "ff": {
                "net_0_proj": _lin(sd, tp + ".ff.net.0.proj"),
                "net_2": _lin(sd, tp + ".ff.net.2"),
            },
        }
        i += 1
    return out


def convert_unet(sd: Mapping[str, np.ndarray], config) -> dict:
    """diffusers UNet2DConditionModel state dict -> our UNet params."""
    p: dict = {
        "time_embedding": {
            "linear_1": _lin(sd, "time_embedding.linear_1"),
            "linear_2": _lin(sd, "time_embedding.linear_2"),
        },
        "conv_in": _conv(sd, "conv_in"),
        "conv_norm_out": _gn32(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    if "camera_embedding.linear_1.weight" in sd:
        p["camera_embedding"] = {
            "linear_1": _lin(sd, "camera_embedding.linear_1"),
            "linear_2": _lin(sd, "camera_embedding.linear_2"),
        }
    ulp = config.use_linear_projection
    for i, btype in enumerate(config.down_block_types):
        for j in range(config.layers_per_block):
            p[f"down_{i}_res_{j}"] = _resnet(
                sd, f"down_blocks.{i}.resnets.{j}"
            )
            if btype == "CrossAttnDownBlock2D":
                p[f"down_{i}_attn_{j}"] = _attention_block(
                    sd, f"down_blocks.{i}.attentions.{j}", ulp
                )
        if i < len(config.block_out_channels) - 1:
            p[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")
            }
    p["mid_res_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_attn"] = _attention_block(sd, "mid_block.attentions.0", ulp)
    p["mid_res_1"] = _resnet(sd, "mid_block.resnets.1")
    for i, btype in enumerate(config.up_block_types):
        for j in range(config.layers_per_block + 1):
            p[f"up_{i}_res_{j}"] = _resnet(sd, f"up_blocks.{i}.resnets.{j}")
            if btype == "CrossAttnUpBlock2D":
                p[f"up_{i}_attn_{j}"] = _attention_block(
                    sd, f"up_blocks.{i}.attentions.{j}", ulp
                )
        if i < len(config.up_block_types) - 1:
            p[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")
            }
    return {"params": p}


def _vae_resnet(sd, p):
    out = {
        "norm1": _gn32(sd, p + ".norm1"),
        "conv1": _conv(sd, p + ".conv1"),
        "norm2": _gn32(sd, p + ".norm2"),
        "conv2": _conv(sd, p + ".conv2"),
    }
    if p + ".conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, p + ".conv_shortcut")
    return out


def _vae_attn(sd, p):
    return {
        "group_norm": _gn32(sd, p + ".group_norm"),
        "to_q": _lin(sd, p + ".to_q"),
        "to_k": _lin(sd, p + ".to_k"),
        "to_v": _lin(sd, p + ".to_v"),
        "to_out_0": _lin(sd, p + ".to_out.0"),
    }


def convert_vae(sd: Mapping[str, np.ndarray], config) -> dict:
    """diffusers AutoencoderKL state dict -> our AutoencoderKL params."""
    n_blocks = len(config.block_out_channels)
    enc: dict = {"conv_in": _conv(sd, "encoder.conv_in")}
    for i in range(n_blocks):
        for j in range(config.layers_per_block):
            enc[f"down_{i}_res_{j}"] = _vae_resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}"
            )
        if i < n_blocks - 1:
            enc[f"down_{i}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv"
            )
    enc["mid_res_0"] = _vae_resnet(sd, "encoder.mid_block.resnets.0")
    enc["mid_attn"] = _vae_attn(sd, "encoder.mid_block.attentions.0")
    enc["mid_res_1"] = _vae_resnet(sd, "encoder.mid_block.resnets.1")
    enc["conv_norm_out"] = _gn32(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")
    enc["quant_conv"] = _conv(sd, "quant_conv")

    dec: dict = {
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_res_0": _vae_resnet(sd, "decoder.mid_block.resnets.0"),
        "mid_attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
        "mid_res_1": _vae_resnet(sd, "decoder.mid_block.resnets.1"),
        "conv_norm_out": _gn32(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    for i in range(n_blocks):
        for j in range(config.layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _vae_resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}"
            )
        if i < n_blocks - 1:
            dec[f"up_{i}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv"
            )
    return {"params": {"encoder": enc, "decoder": dec}}


# ---------------------------------------------------------------------------
# LDM single-file layout (MVDream `sd-v2.1-base-4view.pt`, ImageDream
# `sd-v2.1-base-4view-ipmv.pt`).
# ---------------------------------------------------------------------------


def is_ldm_layout(sd: Mapping[str, np.ndarray]) -> bool:
    return any(k.startswith("model.diffusion_model.") for k in sd)


def _ldm_resnet(sd, p):
    out = {
        "norm1": _gn32(sd, p + ".in_layers.0"),
        "conv1": _conv(sd, p + ".in_layers.2"),
        "time_emb_proj": _lin(sd, p + ".emb_layers.1"),
        "norm2": _gn32(sd, p + ".out_layers.0"),
        "conv2": _conv(sd, p + ".out_layers.3"),
    }
    if p + ".skip_connection.weight" in sd:
        out["conv_shortcut"] = _conv(sd, p + ".skip_connection")
    return out


def _ldm_transformer(sd, p, use_linear_projection: bool):
    """LDM SpatialTransformer -> our Transformer2D params. SD 2.x uses
    use_linear_in_transformer=True (Linear proj_in/out)."""
    proj = _lin if use_linear_projection else _conv
    out = {
        "norm": _gn32(sd, p + ".norm"),
        "proj_in": proj(sd, p + ".proj_in"),
        "proj_out": proj(sd, p + ".proj_out"),
    }
    i = 0
    while f"{p}.transformer_blocks.{i}.norm1.weight" in sd:
        tp = f"{p}.transformer_blocks.{i}"
        attn2 = {
            "to_q": _lin(sd, tp + ".attn2.to_q"),
            "to_k": _lin(sd, tp + ".attn2.to_k"),
            "to_v": _lin(sd, tp + ".attn2.to_v"),
            "to_out_0": _lin(sd, tp + ".attn2.to_out.0"),
        }
        # ImageDream ip-adapter projections live inside attn2.
        if tp + ".attn2.to_k_ip.weight" in sd:
            attn2["to_k_ip"] = _lin(sd, tp + ".attn2.to_k_ip")
            attn2["to_v_ip"] = _lin(sd, tp + ".attn2.to_v_ip")
        out[f"transformer_blocks_{i}"] = {
            "norm1": _norm(sd, tp + ".norm1"),
            "attn1": {
                "to_q": _lin(sd, tp + ".attn1.to_q"),
                "to_k": _lin(sd, tp + ".attn1.to_k"),
                "to_v": _lin(sd, tp + ".attn1.to_v"),
                "to_out_0": _lin(sd, tp + ".attn1.to_out.0"),
            },
            "norm2": _norm(sd, tp + ".norm2"),
            "attn2": attn2,
            "norm3": _norm(sd, tp + ".norm3"),
            "ff": {
                "net_0_proj": _lin(sd, tp + ".ff.net.0.proj"),
                "net_2": _lin(sd, tp + ".ff.net.2"),
            },
        }
        i += 1
    return out


def _ldm_resampler(sd, p):
    """ImageDream ``image_embed`` (IP-adapter Resampler) -> our Resampler.

    Torch layout (imagedream/ldm resampler, identical to the published
    IP-adapter Resampler): latents [1, Q, D]; proj_in/proj_out Linear;
    layers.{i}.0 = PerceiverAttention {norm1, norm2, to_q, to_kv, to_out
    (all no-bias Linears)}; layers.{i}.1 = FeedForward Sequential
    [0]=LayerNorm, [1]=Linear(no bias), [3]=Linear(no bias); norm_out."""
    out = {
        "latents": np.asarray(sd[p + ".latents"])[0],
        "proj_in": _lin(sd, p + ".proj_in"),
        "proj_out": _lin(sd, p + ".proj_out"),
        "norm_out": _norm(sd, p + ".norm_out"),
    }
    i = 0
    while f"{p}.layers.{i}.0.to_q.weight" in sd:
        lp = f"{p}.layers.{i}"
        out[f"layers_{i}_attn"] = {
            "norm1": _norm(sd, lp + ".0.norm1"),
            "norm2": _norm(sd, lp + ".0.norm2"),
            "to_q": _lin(sd, lp + ".0.to_q"),
            "to_kv": _lin(sd, lp + ".0.to_kv"),
            "to_out": _lin(sd, lp + ".0.to_out"),
        }
        out[f"layers_{i}_ff_norm"] = _norm(sd, lp + ".1.0")
        out[f"layers_{i}_ff_in"] = _lin(sd, lp + ".1.1")
        out[f"layers_{i}_ff_out"] = _lin(sd, lp + ".1.3")
        i += 1
    return out


def convert_ldm_unet(sd: Mapping[str, np.ndarray], config,
                     prefix: str = "model.diffusion_model.") -> dict:
    """LDM openaimodel UNet state dict -> our UNet params.

    Mirrors the SD 2.x block order: input_blocks.0.0 = conv_in, then per
    level ``layers_per_block`` [ResBlock, SpatialTransformer?] entries
    plus a Downsample ``op``; middle_block [res, attn, res]; 12
    output_blocks with the Upsample appended as the block's last member.
    MVDream adds ``camera_embed`` (-> our camera_embedding); ImageDream
    adds ``image_embed`` + attn2 to_k_ip/to_v_ip."""
    g = lambda name: prefix + name  # noqa: E731
    ulp = config.use_linear_projection
    p: dict = {
        "time_embedding": {
            "linear_1": _lin(sd, g("time_embed.0")),
            "linear_2": _lin(sd, g("time_embed.2")),
        },
        "conv_in": _conv(sd, g("input_blocks.0.0")),
        "conv_norm_out": _gn32(sd, g("out.0")),
        "conv_out": _conv(sd, g("out.2")),
    }
    if g("camera_embed.0.weight") in sd:
        p["camera_embedding"] = {
            "linear_1": _lin(sd, g("camera_embed.0")),
            "linear_2": _lin(sd, g("camera_embed.2")),
        }
    if g("image_embed.latents") in sd:
        p["image_embed"] = _ldm_resampler(sd, g("image_embed"))

    ib = 1
    for i, btype in enumerate(config.down_block_types):
        for j in range(config.layers_per_block):
            p[f"down_{i}_res_{j}"] = _ldm_resnet(sd, g(f"input_blocks.{ib}.0"))
            if btype == "CrossAttnDownBlock2D":
                p[f"down_{i}_attn_{j}"] = _ldm_transformer(
                    sd, g(f"input_blocks.{ib}.1"), ulp
                )
            ib += 1
        if i < len(config.block_out_channels) - 1:
            p[f"down_{i}_downsample"] = {
                "conv": _conv(sd, g(f"input_blocks.{ib}.0.op"))
            }
            ib += 1

    p["mid_res_0"] = _ldm_resnet(sd, g("middle_block.0"))
    p["mid_attn"] = _ldm_transformer(sd, g("middle_block.1"), ulp)
    p["mid_res_1"] = _ldm_resnet(sd, g("middle_block.2"))

    ob = 0
    for i, btype in enumerate(config.up_block_types):
        for j in range(config.layers_per_block + 1):
            p[f"up_{i}_res_{j}"] = _ldm_resnet(sd, g(f"output_blocks.{ob}.0"))
            sub = 1
            if btype == "CrossAttnUpBlock2D":
                p[f"up_{i}_attn_{j}"] = _ldm_transformer(
                    sd, g(f"output_blocks.{ob}.{sub}"), ulp
                )
                sub += 1
            if (j == config.layers_per_block
                    and i < len(config.up_block_types) - 1):
                p[f"up_{i}_upsample"] = {
                    "conv": _conv(sd, g(f"output_blocks.{ob}.{sub}.conv"))
                }
            ob += 1
    return {"params": p}


def _ldm_vae_resnet(sd, p):
    out = {
        "norm1": _gn32(sd, p + ".norm1"),
        "conv1": _conv(sd, p + ".conv1"),
        "norm2": _gn32(sd, p + ".norm2"),
        "conv2": _conv(sd, p + ".conv2"),
    }
    if p + ".nin_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, p + ".nin_shortcut")
    return out


def _ldm_vae_attn(sd, p):
    """LDM AttnBlock uses 1x1 convs for q/k/v/proj_out -> squeeze to
    Dense kernels."""

    def conv1x1_as_dense(name):
        w = np.asarray(sd[f"{p}.{name}.weight"])  # [O, I, 1, 1]
        return {
            "kernel": np.ascontiguousarray(w[:, :, 0, 0].T),
            "bias": sd[f"{p}.{name}.bias"],
        }

    return {
        "group_norm": _gn32(sd, p + ".norm"),
        "to_q": conv1x1_as_dense("q"),
        "to_k": conv1x1_as_dense("k"),
        "to_v": conv1x1_as_dense("v"),
        "to_out_0": conv1x1_as_dense("proj_out"),
    }


def convert_ldm_vae(sd: Mapping[str, np.ndarray], config,
                    prefix: str = "first_stage_model.") -> dict:
    """LDM AutoencoderKL state dict -> our AutoencoderKL params.

    LDM's decoder ``up`` ModuleList is indexed by resolution level and
    APPLIED in reverse (ldm/modules/diffusionmodules/model.py Decoder):
    our in-order up_{i} maps to ldm up.{n-1-i}."""
    g = lambda name: prefix + name  # noqa: E731
    n_blocks = len(config.block_out_channels)
    enc: dict = {"conv_in": _conv(sd, g("encoder.conv_in"))}
    for i in range(n_blocks):
        for j in range(config.layers_per_block):
            enc[f"down_{i}_res_{j}"] = _ldm_vae_resnet(
                sd, g(f"encoder.down.{i}.block.{j}")
            )
        if i < n_blocks - 1:
            enc[f"down_{i}_downsample"] = _conv(
                sd, g(f"encoder.down.{i}.downsample.conv")
            )
    enc["mid_res_0"] = _ldm_vae_resnet(sd, g("encoder.mid.block_1"))
    enc["mid_attn"] = _ldm_vae_attn(sd, g("encoder.mid.attn_1"))
    enc["mid_res_1"] = _ldm_vae_resnet(sd, g("encoder.mid.block_2"))
    enc["conv_norm_out"] = _gn32(sd, g("encoder.norm_out"))
    enc["conv_out"] = _conv(sd, g("encoder.conv_out"))
    enc["quant_conv"] = _conv(sd, g("quant_conv"))

    dec: dict = {
        "post_quant_conv": _conv(sd, g("post_quant_conv")),
        "conv_in": _conv(sd, g("decoder.conv_in")),
        "mid_res_0": _ldm_vae_resnet(sd, g("decoder.mid.block_1")),
        "mid_attn": _ldm_vae_attn(sd, g("decoder.mid.attn_1")),
        "mid_res_1": _ldm_vae_resnet(sd, g("decoder.mid.block_2")),
        "conv_norm_out": _gn32(sd, g("decoder.norm_out")),
        "conv_out": _conv(sd, g("decoder.conv_out")),
    }
    for i in range(n_blocks):
        lvl = n_blocks - 1 - i
        for j in range(config.layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _ldm_vae_resnet(
                sd, g(f"decoder.up.{lvl}.block.{j}")
            )
        if i < n_blocks - 1:
            dec[f"up_{i}_upsample"] = _conv(
                sd, g(f"decoder.up.{lvl}.upsample.conv")
            )
    return {"params": {"encoder": enc, "decoder": dec}}


def convert_open_clip_text(sd: Mapping[str, np.ndarray], config,
                           prefix: str = "cond_stage_model.model.") -> dict:
    """open_clip text tower -> our OpenCLIPTextEncoder params.

    Converts only the blocks the penultimate-layer forward uses (the last
    resblock and text_projection are dead weight for conditioning)."""
    g = lambda name: prefix + name  # noqa: E731
    p: dict = {
        "token_embedding": np.asarray(sd[g("token_embedding.weight")]),
        "positional_embedding": np.asarray(sd[g("positional_embedding")]),
        "ln_final": _norm(sd, g("ln_final")),
    }
    n_blocks = config.layers - (1 if config.penultimate else 0)
    for i in range(n_blocks):
        bp = g(f"transformer.resblocks.{i}")
        p[f"resblocks_{i}"] = {
            "ln_1": _norm(sd, bp + ".ln_1"),
            "in_proj": {
                "kernel": np.ascontiguousarray(
                    np.asarray(sd[bp + ".attn.in_proj_weight"]).T
                ),
                "bias": sd[bp + ".attn.in_proj_bias"],
            },
            "out_proj": _lin(sd, bp + ".attn.out_proj"),
            "ln_2": _norm(sd, bp + ".ln_2"),
            "c_fc": _lin(sd, bp + ".mlp.c_fc"),
            "c_proj": _lin(sd, bp + ".mlp.c_proj"),
        }
    return {"params": p}


def assert_tree_shapes_match(converted: dict, reference: dict, path="") -> None:
    """Recursively compare converted params against a module's init tree."""
    ck = set(converted)
    rk = set(reference)
    if ck != rk:
        raise ValueError(
            f"param key mismatch at '{path}': only-converted={ck - rk}, "
            f"only-model={rk - ck}"
        )
    for k in ck:
        c, r = converted[k], reference[k]
        if isinstance(r, dict):
            assert_tree_shapes_match(c, r, f"{path}/{k}")
        else:
            if tuple(np.shape(c)) != tuple(np.shape(r)):
                raise ValueError(
                    f"shape mismatch at '{path}/{k}': "
                    f"{np.shape(c)} vs {np.shape(r)}"
                )
