"""Flax OpenCLIP text transformer (SD 2.1 / MVDream conditioning).

The MVDream / ImageDream single-file checkpoints embed their text encoder
in open_clip layout (``cond_stage_model.model.*``), NOT the HF
CLIPTextModel layout our diffusers-dir path uses via transformers. The
reference reaches it through ``model.get_learned_conditioning(prompt)``
(/root/reference/guidance/mvdream_utils.py:51-53), which is ldm's
FrozenOpenCLIPEmbedder with layer="penultimate": token embedding +
positional embedding -> all-but-last resblocks with a causal mask ->
``ln_final``. This module reproduces exactly that forward; weights are
mapped by convert.convert_open_clip_text.

Note: the SD 2.1 text tower (open_clip ViT-H-14) uses EXACT gelu, unlike
OpenAI CLIP's QuickGELU.

All matmuls are plain Dense ops (MXU-friendly); the sequence length is a
static 77 so the whole encode jits once.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class OpenCLIPTextConfig:
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    # FrozenOpenCLIPEmbedder(layer="penultimate") skips the LAST resblock
    # (ldm/modules/encoders/modules.py text_transformer_forward).
    penultimate: bool = True
    dtype: jnp.dtype = jnp.float32


class TextBlock(nn.Module):
    """open_clip ResidualAttentionBlock (pre-LN, exact-GELU MLP)."""

    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, n, c = q.shape
        d = c // self.heads

        def split(t):
            return t.reshape(b, n, self.heads, d).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(d))
        attn = jax.nn.softmax(attn + mask, axis=-1).astype(self.dtype)
        h = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        h = h.transpose(0, 2, 1, 3).reshape(b, n, c)
        x = x + nn.Dense(self.width, dtype=self.dtype, name="out_proj")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="c_fc")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)


class OpenCLIPTextEncoder(nn.Module):
    """token ids [B, 77] int32 -> [B, 77, width] penultimate states
    (after ln_final, the FrozenOpenCLIPEmbedder contract)."""

    config: OpenCLIPTextConfig = OpenCLIPTextConfig()

    @nn.compact
    def __call__(self, ids):
        cfg = self.config
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.width),
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        x = jnp.take(tok, ids, axis=0).astype(cfg.dtype)
        x = x + pos[None].astype(cfg.dtype)
        n = ids.shape[1]
        causal = jnp.triu(
            jnp.full((n, n), -jnp.inf, jnp.float32), k=1
        )[None, None]
        n_blocks = cfg.layers - (1 if cfg.penultimate else 0)
        for i in range(n_blocks):
            x = TextBlock(
                cfg.width, cfg.heads, cfg.dtype, name=f"resblocks_{i}"
            )(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(
            x.astype(jnp.float32)
        )
        return x
