"""Diffusion noise schedule + DDIM sampling step (pure jnp).

Replaces the ``diffusers.DDIMScheduler`` usage of the reference guidance
modules (/root/reference/guidance/sd_utils.py:47-56,
/root/reference/guidance/zero123_utils.py:37-44): scaled-linear
(sqrt-space linear) beta schedule over 1000 train timesteps, alphas_cumprod
used both for SDS weighting ``w = 1 - alpha_prod_t`` and for the
img2img ``refine`` loop's DDIM steps.

All state is precomputed numpy on host; the jnp methods are traceable and
differentiable where that matters (``add_noise`` participates in the SDS
graph; ``step`` runs under no-grad sampling loops).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class DDIMScheduler:
    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        beta_schedule: str = "scaled_linear",
        prediction_type: str = "epsilon",
        set_alpha_to_one: bool = False,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        if beta_schedule == "scaled_linear":
            betas = (
                np.linspace(
                    beta_start**0.5, beta_end**0.5, num_train_timesteps,
                    dtype=np.float64,
                )
                ** 2
            )
        elif beta_schedule == "linear":
            betas = np.linspace(
                beta_start, beta_end, num_train_timesteps, dtype=np.float64
            )
        else:
            raise ValueError(beta_schedule)
        alphas = 1.0 - betas
        self.alphas_cumprod = jnp.asarray(
            np.cumprod(alphas, axis=0), jnp.float32
        )
        self.final_alpha_cumprod = (
            jnp.asarray(1.0) if set_alpha_to_one else self.alphas_cumprod[0]
        )
        self.init_noise_sigma = 1.0
        self.timesteps = None
        self.num_inference_steps = None

    # ---- training-side (SDS) ----

    def add_noise(self, sample, noise, t):
        """q(x_t | x_0): sqrt(a_t) x0 + sqrt(1-a_t) eps. t: int array [B]."""
        a = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (sample.ndim - 1)
        sa = jnp.sqrt(a).reshape(shape)
        sn = jnp.sqrt(1.0 - a).reshape(shape)
        return sa * sample + sn * noise

    # ---- inference-side (refine / full sampling) ----

    def set_timesteps(self, num_inference_steps: int):
        self.num_inference_steps = num_inference_steps
        step = self.num_train_timesteps // num_inference_steps
        # diffusers "leading" spacing: t = i*step, descending.
        self.timesteps = np.arange(0, num_inference_steps)[::-1] * step
        return self.timesteps

    def step(self, noise_pred, t: int, sample, eta: float = 0.0):
        """One deterministic DDIM update x_t -> x_{t-Delta} (eta=0)."""
        assert self.num_inference_steps is not None, "call set_timesteps()"
        return self.step_with_spacing(
            noise_pred, t, sample,
            self.num_train_timesteps // self.num_inference_steps,
        )

    def step_with_spacing(self, noise_pred, t, sample, spacing: int):
        """``step`` with the timestep spacing passed explicitly — no
        mutable scheduler state, so it is safe inside jitted loops whose
        ``t`` is traced (the fused refine path) and across guidances that
        use different inference step counts."""
        prev_t = t - spacing
        a_t = self.alphas_cumprod[t]
        a_prev = jnp.where(
            prev_t >= 0,
            self.alphas_cumprod[jnp.maximum(prev_t, 0)],
            self.final_alpha_cumprod,
        )
        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(1.0 - a_t) * noise_pred) / jnp.sqrt(a_t)
            eps = noise_pred
        elif self.prediction_type == "v_prediction":
            x0 = jnp.sqrt(a_t) * sample - jnp.sqrt(1.0 - a_t) * noise_pred
            eps = jnp.sqrt(a_t) * noise_pred + jnp.sqrt(1.0 - a_t) * sample
        else:
            raise ValueError(self.prediction_type)
        dir_xt = jnp.sqrt(1.0 - a_prev) * eps
        return jnp.sqrt(a_prev) * x0 + dir_xt

    def pred_x0_and_eps(self, model_out, t, sample):
        """(x0, eps) from a model output under this prediction type."""
        a_t = self.alphas_cumprod[t]
        shape = (-1,) + (1,) * (sample.ndim - 1)
        sa = jnp.sqrt(a_t).reshape(shape)
        sn = jnp.sqrt(1.0 - a_t).reshape(shape)
        if self.prediction_type == "epsilon":
            return (sample - sn * model_out) / sa, model_out
        if self.prediction_type == "v_prediction":
            return sa * sample - sn * model_out, sa * model_out + sn * sample
        raise ValueError(self.prediction_type)
