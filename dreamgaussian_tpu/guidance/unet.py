"""Flax UNet for Stable-Diffusion-family denoisers (NHWC, TPU-native).

From-scratch implementation of the architecture family used by the
reference's frozen guidance networks:

- SD 2.1-base (/root/reference/guidance/sd_utils.py:21-105): 4-ch latents,
  cross_attention_dim 1024, linear attention projections;
- Zero123(-XL / stable) (/root/reference/zero123.py:435-446): 8-ch input
  (latent ⊕ conditioning latent), cross_attention_dim 768, conv
  projections;
- MVDream / ImageDream 4(+1)-view joint UNets
  (/root/reference/guidance/mvdream_utils.py, imagedream_utils.py): SD
  backbone whose self-attention attends jointly across ``num_views``
  views ("3D attention").

Everything is NHWC and bf16-friendly: convolutions and attention matmuls
land on the MXU; GroupNorm statistics are computed in f32. Weight layout
matches ``convert.py``'s torch->flax mapping of HF diffusers checkpoints.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: int | Sequence[int] = 64  # int => head dim; SD1.x uses 8 heads
    num_attention_heads: int | None = None  # if set, overrides head-dim logic
    down_block_types: Sequence[str] = (
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D",
        "DownBlock2D",
    )
    up_block_types: Sequence[str] = (
        "UpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D",
    )
    use_linear_projection: bool = True
    num_views: int = 1            # >1 => joint self-attention across views
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    # ImageDream ip-adapter pathway (/root/reference/guidance/
    # imagedream_utils.py:172-177 passes ip/ip_img into the UNet):
    # ip_dim > 0 enables (a) a Resampler that maps CLIP image tokens to
    # ``ip_dim`` context tokens, appended to the text context, and (b)
    # dedicated to_k_ip/to_v_ip projections in every cross-attention that
    # attend to those tokens with weight ``ip_weight``.
    ip_dim: int = 0
    ip_weight: float = 1.0
    ip_embed_dim: int = 1280       # CLIP ViT-H vision token dim
    ip_resampler_dim: int = 1280
    ip_resampler_depth: int = 4
    ip_resampler_heads: int = 20   # dim_head 64
    dtype: jnp.dtype = jnp.float32

    def heads_for(self, channels: int) -> int:
        if self.num_attention_heads is not None:
            return self.num_attention_heads
        return max(1, channels // int(self.attention_head_dim))


SD21_CONFIG = UNetConfig()
SD15_CONFIG = UNetConfig(
    cross_attention_dim=768, num_attention_heads=8, use_linear_projection=False
)
ZERO123_CONFIG = UNetConfig(
    in_channels=8, cross_attention_dim=768, num_attention_heads=8,
    use_linear_projection=False,
)
MVDREAM_CONFIG = UNetConfig(num_views=4)
# sd-v2.1-base-4view-ipmv: 4 real + 1 identity view, 16 resampled image
# tokens via ip cross-attention.
IMAGEDREAM_CONFIG = UNetConfig(num_views=5, ip_dim=16)


def timestep_embedding(t, dim: int, flip_sin_to_cos: bool = True,
                       freq_shift: int = 0, max_period: float = 10000.0):
    """Sinusoidal timestep embedding, diffusers convention. t: [B] float."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    emb = jnp.exp(exponent)[None, :] * t.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    out = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


class GroupNorm32(nn.Module):
    """GroupNorm with f32 statistics regardless of activation dtype."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        # Real checkpoints always have channels % 32 == 0; adapt for the
        # shrunken test configs.
        groups = math.gcd(self.num_groups, x.shape[-1])
        y = nn.GroupNorm(
            num_groups=groups, epsilon=self.epsilon,
            dtype=jnp.float32, param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(orig)


class TimeEmbedding(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(emb)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        h = GroupNorm32(name="norm1", dtype=self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = GroupNorm32(name="norm2", dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


def _attention(q, k, v, heads: int, dtype):
    """Multi-head attention on [B, N, C] tensors (already projected)."""
    b, n, c = q.shape
    m = k.shape[1]
    d = c // heads

    def split(x, length):
        return x.reshape(b, length, heads, d).transpose(0, 2, 1, 3)

    q, k, v = split(q, n), split(k, m), split(v, m)
    scale = 1.0 / math.sqrt(d)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                      preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, c)


class CrossAttention(nn.Module):
    """Multi-head (cross-)attention.

    With ``ip_dim > 0`` and a context given, the LAST ``ip_dim`` context
    tokens are image-conditioning tokens: they get their own key/value
    projections (to_k_ip / to_v_ip, the IP-adapter scheme ImageDream's
    UNet uses) and their attention output is added with weight
    ``ip_weight`` (/root/reference/guidance/imagedream_utils.py passes
    ``ip`` into the ipmv model whose attention splits exactly so).
    """

    query_dim: int
    heads: int
    context_dim: int | None = None  # None => self-attention
    ip_dim: int = 0
    ip_weight: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        ctx = x if context is None else context
        ip = None
        if self.ip_dim > 0 and context is not None:
            ctx, ip = ctx[:, : -self.ip_dim], ctx[:, -self.ip_dim:]
        q = nn.Dense(self.query_dim, use_bias=False, dtype=self.dtype,
                     name="to_q")(x)
        k = nn.Dense(self.query_dim, use_bias=False, dtype=self.dtype,
                     name="to_k")(ctx)
        v = nn.Dense(self.query_dim, use_bias=False, dtype=self.dtype,
                     name="to_v")(ctx)
        out = _attention(q, k, v, self.heads, self.dtype)
        if ip is not None:
            k_ip = nn.Dense(self.query_dim, use_bias=False, dtype=self.dtype,
                            name="to_k_ip")(ip)
            v_ip = nn.Dense(self.query_dim, use_bias=False, dtype=self.dtype,
                            name="to_v_ip")(ip)
            out = out + self.ip_weight * _attention(
                q, k_ip, v_ip, self.heads, self.dtype
            )
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)


class PerceiverAttention(nn.Module):
    """Resampler block attention: learned latents attend to image tokens
    (keys/values over [tokens ++ latents], the IP-adapter layout)."""

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        latents = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(latents)
        q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                     name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = nn.Dense(self.dim * 2, use_bias=False, dtype=self.dtype,
                      name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)
        out = _attention(q, k, v, self.heads, self.dtype)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                        name="to_out")(out)


class Resampler(nn.Module):
    """Perceiver resampler: [B, L, embed_dim] CLIP image tokens ->
    [B, num_queries, output_dim] context tokens (ImageDream's
    ``image_embed`` module; same architecture as the IP-adapter
    Resampler)."""

    dim: int
    depth: int
    heads: int
    num_queries: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        latents = self.param(
            "latents", nn.initializers.normal(0.02),
            (self.num_queries, self.dim),
        ).astype(self.dtype)
        latents = jnp.broadcast_to(
            latents[None], (b, self.num_queries, self.dim)
        )
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(
            x.astype(self.dtype)
        )
        for i in range(self.depth):
            latents = latents + PerceiverAttention(
                self.dim, self.heads, self.dtype, name=f"layers_{i}_attn"
            )(x, latents)
            # FeedForward: LayerNorm -> Linear(4x, no bias) -> GELU ->
            # Linear (no bias), residual.
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"layers_{i}_ff_norm")(
                latents
            )
            h = nn.Dense(self.dim * 4, use_bias=False, dtype=self.dtype,
                         name=f"layers_{i}_ff_in")(h)
            # torch nn.GELU() is the exact (erf) form.
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         name=f"layers_{i}_ff_out")(h)
            latents = latents + h
        out = nn.Dense(self.output_dim, dtype=self.dtype,
                       name="proj_out")(latents)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_out")(out)


class FeedForward(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * 4
        h = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU uses exact (erf) gelu, not the tanh approximation.
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    context_dim: int
    num_views: int = 1
    ip_dim: int = 0
    ip_weight: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        # Self-attention; for num_views>1 the V views of each batch item
        # attend jointly (MVDream "3D attention": [B*V, N, C]->[B, V*N, C]).
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        if self.num_views > 1:
            bv, n, c = h.shape
            v = self.num_views
            h = h.reshape(bv // v, v * n, c)
            h = CrossAttention(self.dim, self.heads, None, dtype=self.dtype,
                               name="attn1")(h)
            h = h.reshape(bv, n, c)
        else:
            h = CrossAttention(self.dim, self.heads, None, dtype=self.dtype,
                               name="attn1")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(
            self.dim, self.heads, self.context_dim,
            ip_dim=self.ip_dim, ip_weight=self.ip_weight, dtype=self.dtype,
            name="attn2",
        )(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        return x + FeedForward(self.dim, self.dtype, name="ff")(h)


class Transformer2D(nn.Module):
    channels: int
    heads: int
    context_dim: int
    depth: int = 1
    use_linear_projection: bool = True
    num_views: int = 1
    ip_dim: int = 0
    ip_weight: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, hh, ww, c = x.shape
        res = x
        # diffusers Transformer2DModel / ldm SpatialTransformer both build
        # this norm with eps=1e-6 (unlike the 1e-5 resnet norms).
        h = GroupNorm32(name="norm", epsilon=1e-6, dtype=self.dtype)(x)
        if self.use_linear_projection:
            h = h.reshape(b, hh * ww, c)
            h = nn.Dense(self.channels, dtype=self.dtype, name="proj_in")(h)
        else:
            h = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                        name="proj_in")(h)
            h = h.reshape(b, hh * ww, self.channels)
        for i in range(self.depth):
            h = TransformerBlock(
                self.channels, self.heads, self.context_dim,
                num_views=self.num_views, ip_dim=self.ip_dim,
                ip_weight=self.ip_weight, dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h, context)
        if self.use_linear_projection:
            h = nn.Dense(self.channels, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(b, hh, ww, self.channels)
        else:
            h = h.reshape(b, hh, ww, self.channels)
            h = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                        name="proj_out")(h)
        return h + res


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class UNet(nn.Module):
    """Denoising UNet. Inputs NHWC latents, [B] timesteps, [B,L,D] context.

    ``camera`` (optional [B, 16]): MVDream/ImageDream RAW normalized
    flattened c2w; embedded INTERNALLY by the ``camera_embedding`` MLP and
    ADDED to the time embedding (the mvdream UNet's ``camera_embed``
    pathway) — callers never pre-embed it.

    ``ip`` (optional [B, L_ip, ip_embed_dim]): CLIP image tokens,
    resampled to ``ip_dim`` context tokens and appended to ``context``
    for the to_k_ip/to_v_ip cross-attention pathway (requires
    config.ip_dim > 0).

    ``ip_img`` (optional [B // num_views, h, w, 4]): identity-image VAE
    latent written into the LAST view slot of every ``num_views`` group
    (ImageDream's extra view; the caller pads that slot with zeros,
    /root/reference/guidance/imagedream_utils.py:186-189)."""

    config: UNetConfig

    @nn.compact
    def __call__(self, sample, timesteps, context, camera=None,
                 ip=None, ip_img=None):
        cfg = self.config
        dt = cfg.dtype
        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4

        temb = timestep_embedding(
            timesteps, ch0, cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(dt)
        temb = TimeEmbedding(temb_dim, dt, name="time_embedding")(temb)
        if camera is not None:
            temb = temb + TimeEmbedding(
                temb_dim, dt, name="camera_embedding"
            )(camera.astype(dt))

        sample = sample.astype(dt)
        context = context.astype(dt)

        if ip_img is not None:
            v = cfg.num_views
            b = sample.shape[0]
            grouped = sample.reshape((b // v, v) + sample.shape[1:])
            grouped = grouped.at[:, -1].set(ip_img.astype(dt))
            sample = grouped.reshape(sample.shape)
        if ip is not None:
            assert cfg.ip_dim > 0, "ip tokens given but config.ip_dim == 0"
            ip_tokens = Resampler(
                dim=cfg.ip_resampler_dim,
                depth=cfg.ip_resampler_depth,
                heads=cfg.ip_resampler_heads,
                num_queries=cfg.ip_dim,
                output_dim=cfg.cross_attention_dim,
                dtype=dt,
                name="image_embed",
            )(ip)
            context = jnp.concatenate([context, ip_tokens], axis=1)
        ip_dim = cfg.ip_dim if ip is not None else 0

        h = nn.Conv(ch0, (3, 3), padding=1, dtype=dt, name="conv_in")(sample)
        skips = [h]

        # Down path.
        for i, (btype, ch) in enumerate(
            zip(cfg.down_block_types, cfg.block_out_channels)
        ):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, dt, name=f"down_{i}_res_{j}")(h, temb)
                if btype == "CrossAttnDownBlock2D":
                    h = Transformer2D(
                        ch, cfg.heads_for(ch), cfg.cross_attention_dim,
                        use_linear_projection=cfg.use_linear_projection,
                        num_views=cfg.num_views, ip_dim=ip_dim,
                        ip_weight=cfg.ip_weight, dtype=dt,
                        name=f"down_{i}_attn_{j}",
                    )(h, context)
                skips.append(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample(ch, dt, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # Mid.
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock(ch, dt, name="mid_res_0")(h, temb)
        h = Transformer2D(
            ch, cfg.heads_for(ch), cfg.cross_attention_dim,
            use_linear_projection=cfg.use_linear_projection,
            num_views=cfg.num_views, ip_dim=ip_dim,
            ip_weight=cfg.ip_weight, dtype=dt, name="mid_attn",
        )(h, context)
        h = ResnetBlock(ch, dt, name="mid_res_1")(h, temb)

        # Up path (reversed channels; layers_per_block+1 resnets each).
        rev_ch = list(reversed(cfg.block_out_channels))
        for i, btype in enumerate(cfg.up_block_types):
            ch = rev_ch[i]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(ch, dt, name=f"up_{i}_res_{j}")(h, temb)
                if btype == "CrossAttnUpBlock2D":
                    h = Transformer2D(
                        ch, cfg.heads_for(ch), cfg.cross_attention_dim,
                        use_linear_projection=cfg.use_linear_projection,
                        num_views=cfg.num_views, ip_dim=ip_dim,
                        ip_weight=cfg.ip_weight, dtype=dt,
                        name=f"up_{i}_attn_{j}",
                    )(h, context)
            if i < len(cfg.up_block_types) - 1:
                h = Upsample(ch, dt, name=f"up_{i}_upsample")(h)

        h = GroupNorm32(name="conv_norm_out", dtype=dt)(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dt,
                    name="conv_out")(h)
        return h.astype(jnp.float32)


class TinyUNet(nn.Module):
    """Small UNet-shaped denoiser for tests and the FakeGuidance path."""

    channels: int = 16
    context_dim: int = 32
    out_channels: int = 4

    @nn.compact
    def __call__(self, sample, timesteps, context):
        temb = timestep_embedding(timesteps, self.channels)
        temb = nn.Dense(self.channels)(temb)
        h = nn.Conv(self.channels, (3, 3), padding=1)(sample)
        h = h + temb[:, None, None, :]
        h = nn.silu(nn.GroupNorm(num_groups=4)(h))
        ctx = nn.Dense(self.channels)(context.mean(axis=1))
        h = h + ctx[:, None, None, :]
        h = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1)(h)
        h = nn.silu(h)
        b, hh, ww, c = h.shape
        h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1)(h)
