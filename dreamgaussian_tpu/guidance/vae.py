"""Flax AutoencoderKL (SD VAE) — NHWC, from scratch.

Replaces the diffusers VAE used by every reference guidance module for
``encode_imgs``/``decode_latents`` (/root/reference/guidance/sd_utils.py:252-266,
zero123_utils.py:173-186). Latents are scaled by 0.18215; ``encode``
participates in the SDS gradient graph (grads flow from latents back to
rendered pixels), so everything here is differentiable.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet import GroupNorm32, _attention


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215
    dtype: jnp.dtype = jnp.float32


class VAEResnet(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(name="norm1", epsilon=1e-6, dtype=self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = GroupNorm32(name="norm2", epsilon=1e-6, dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        y = GroupNorm32(name="group_norm", epsilon=1e-6, dtype=self.dtype)(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        y = _attention(q, k, v, heads=1, dtype=self.dtype)
        y = nn.Dense(c, dtype=self.dtype, name="to_out_0")(y)
        return res + y.reshape(b, h, w, c)


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dt = cfg.dtype
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=dt,
                    name="conv_in")(x.astype(dt))
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnet(ch, dt, name=f"down_{i}_res_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                # diffusers pads asymmetrically ((0,1),(0,1)) for stride 2.
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=dt, name=f"down_{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = VAEResnet(ch, dt, name="mid_res_0")(h)
        h = VAEAttention(ch, dt, name="mid_attn")(h)
        h = VAEResnet(ch, dt, name="mid_res_1")(h)
        h = GroupNorm32(name="conv_norm_out", epsilon=1e-6, dtype=dt)(h)
        h = nn.silu(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=dt,
                    name="conv_out")(h)
        # diffusers quant_conv (1x1 on moments).
        h = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=dt,
                    name="quant_conv")(h)
        return h.astype(jnp.float32)  # [B, H/8, W/8, 2*latent] moments


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        dt = cfg.dtype
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=dt,
                    name="post_quant_conv")(z.astype(dt))
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=dt, name="conv_in")(z)
        h = VAEResnet(ch, dt, name="mid_res_0")(h)
        h = VAEAttention(ch, dt, name="mid_attn")(h)
        h = VAEResnet(ch, dt, name="mid_res_1")(h)
        rev = list(reversed(cfg.block_out_channels))
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnet(ch, dt, name=f"up_{i}_res_{j}")(h)
            if i < len(rev) - 1:
                b, hh, ww, c = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=dt,
                            name=f"up_{i}_upsample")(h)
        h = GroupNorm32(name="conv_norm_out", epsilon=1e-6, dtype=dt)(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=dt,
                    name="conv_out")(h)
        return h.astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """encode(imgs in [-1,1]) -> scaled latents; decode -> imgs in [-1,1]."""

    config: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.config)
        self.decoder = Decoder(self.config)

    def encode_moments(self, x):
        return self.encoder(x)

    def encode(self, x, key=None):
        """Posterior latents. key=None => mode (the reference samples;
        mode is the deterministic choice used for SDS stability)."""
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if key is not None:
            logvar = jnp.clip(logvar, -30.0, 20.0)
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                key, mean.shape
            )
        return mean * self.config.scaling_factor

    def decode(self, z):
        return self.decoder(z / self.config.scaling_factor)

    def __call__(self, x):  # for init
        z = self.encode(x)
        return self.decode(z)
