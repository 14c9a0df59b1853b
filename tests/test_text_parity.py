"""Numerical parity of the Flax OpenCLIP text encoder vs a torch oracle.

transformers' torch CLIPTextModel implements the same pre-LN causal
transformer as the open_clip text tower (SD 2.1's conditioning encoder,
``hidden_act="gelu"``). We map a random torch model's weights into the
open_clip key layout, convert with convert_open_clip_text, and require
allclose on the hidden states — a REAL torch-vs-jax parity check of the
whole block math (attention, gelu MLP, layer norms), runnable without any
pretrained weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamgaussian_tpu.guidance.convert import convert_open_clip_text
from dreamgaussian_tpu.guidance.text_encoder import (
    OpenCLIPTextConfig,
    OpenCLIPTextEncoder,
)

torch = pytest.importorskip("torch")


def _hf_to_open_clip(tsd: dict, layers: int) -> dict:
    """HF CLIPTextModel state dict -> open_clip cond_stage_model keys."""
    g = "cond_stage_model.model."
    out = {
        g + "token_embedding.weight":
            tsd["text_model.embeddings.token_embedding.weight"],
        g + "positional_embedding":
            tsd["text_model.embeddings.position_embedding.weight"],
        g + "ln_final.weight": tsd["text_model.final_layer_norm.weight"],
        g + "ln_final.bias": tsd["text_model.final_layer_norm.bias"],
    }
    for i in range(layers):
        hp = f"text_model.encoder.layers.{i}"
        op = g + f"transformer.resblocks.{i}"
        out[op + ".ln_1.weight"] = tsd[hp + ".layer_norm1.weight"]
        out[op + ".ln_1.bias"] = tsd[hp + ".layer_norm1.bias"]
        out[op + ".attn.in_proj_weight"] = np.concatenate([
            tsd[hp + ".self_attn.q_proj.weight"],
            tsd[hp + ".self_attn.k_proj.weight"],
            tsd[hp + ".self_attn.v_proj.weight"],
        ])
        out[op + ".attn.in_proj_bias"] = np.concatenate([
            tsd[hp + ".self_attn.q_proj.bias"],
            tsd[hp + ".self_attn.k_proj.bias"],
            tsd[hp + ".self_attn.v_proj.bias"],
        ])
        out[op + ".attn.out_proj.weight"] = tsd[hp + ".self_attn.out_proj.weight"]
        out[op + ".attn.out_proj.bias"] = tsd[hp + ".self_attn.out_proj.bias"]
        out[op + ".ln_2.weight"] = tsd[hp + ".layer_norm2.weight"]
        out[op + ".ln_2.bias"] = tsd[hp + ".layer_norm2.bias"]
        out[op + ".mlp.c_fc.weight"] = tsd[hp + ".mlp.fc1.weight"]
        out[op + ".mlp.c_fc.bias"] = tsd[hp + ".mlp.fc1.bias"]
        out[op + ".mlp.c_proj.weight"] = tsd[hp + ".mlp.fc2.weight"]
        out[op + ".mlp.c_proj.bias"] = tsd[hp + ".mlp.fc2.bias"]
    return out


def test_hidden_states_match_torch_clip():
    from transformers import CLIPTextConfig, CLIPTextModel

    layers = 3
    hf_cfg = CLIPTextConfig(
        vocab_size=64, hidden_size=24, intermediate_size=96,
        num_hidden_layers=layers, num_attention_heads=2,
        max_position_embeddings=16, hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg).eval()

    ids = np.array([[1, 5, 9, 3, 2, 7, 0, 4, 6, 8, 1, 2, 3, 4, 5, 6],
                    [2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2]],
                   np.int64)
    with torch.no_grad():
        ref = model(
            input_ids=torch.from_numpy(ids)
        ).last_hidden_state.numpy()

    tsd = {k: v.numpy() for k, v in model.state_dict().items()}
    sd = _hf_to_open_clip(tsd, layers)
    # Full depth (penultimate=False): HF's last_hidden_state applies
    # final_layer_norm after ALL layers — same as all-blocks + ln_final.
    cfg = OpenCLIPTextConfig(
        vocab_size=64, width=24, heads=2, layers=layers,
        context_length=16, penultimate=False,
    )
    enc = OpenCLIPTextEncoder(cfg)
    params = convert_open_clip_text(sd, cfg)
    out = np.asarray(enc.apply(params, jnp.asarray(ids, jnp.int32)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
