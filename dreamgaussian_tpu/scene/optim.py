"""Grouped Adam with per-parameter-group learning rates (torch semantics).

The reference drives six optimizer param groups with distinct learning
rates and an exponentially decayed xyz schedule
(/root/reference/gs_renderer.py:356-382, 25-47), and its density controller
performs surgery on the Adam moments when gaussians are cloned, split,
pruned, or have their opacity reset (/root/reference/gs_renderer.py:464-533).

Rather than adapting optax's opaque ``multi_transform`` state, we keep a
transparent ``AdamState`` whose ``mu``/``nu`` mirror the params pytree —
so the density controller can zero moment rows of freed/new capacity slots
with plain indexed updates and everything stays jittable at fixed shape.

Update rule matches ``torch.optim.Adam`` (the reference uses eps=1e-15):
``p -= lr * (m / (1 - b1^t)) / (sqrt(v / (1 - b2^t)) + eps)``.
"""

from __future__ import annotations

import math
from typing import Callable, Mapping, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: dict     # first moments, same structure as params
    nu: dict     # second moments, same structure as params
    count: jnp.ndarray  # [] int32, shared across groups (torch keeps per-group
    #                       steps but they advance in lockstep here)


def adam_init(params: Mapping[str, jnp.ndarray]) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, dict(params))
    return AdamState(
        mu=zeros,
        nu=jax.tree.map(jnp.zeros_like, dict(params)),
        count=jnp.zeros((), jnp.int32),
    )


def adam_update(
    params: Mapping[str, jnp.ndarray],
    grads: Mapping[str, jnp.ndarray],
    state: AdamState,
    lrs: Mapping[str, jnp.ndarray],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One Adam step. ``lrs`` maps param-group name -> scalar learning rate."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    new_params, new_mu, new_nu = {}, {}, {}
    for name, p in params.items():
        g = grads[name]
        m = b1 * state.mu[name] + (1.0 - b1) * g
        v = b2 * state.nu[name] + (1.0 - b2) * (g * g)
        update = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
        new_params[name] = p - lrs[name] * update
        new_mu[name] = m
        new_nu[name] = v
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)


def expon_lr(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1000000,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Log-lerp decay with optional reverse-cosine warmup delay.

    Matches the reference scheduler (/root/reference/gs_renderer.py:25-47);
    jnp-traceable so the step can be a traced scalar inside jit.
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_init == lr_final:
            return jnp.full_like(step, lr_init)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(
            math.log(lr_init) * (1.0 - t) + math.log(lr_final) * t
        )
        lr = delay * log_lerp
        return jnp.where(step < 0, 0.0, lr)

    return schedule
