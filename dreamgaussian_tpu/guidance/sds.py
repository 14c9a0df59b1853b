"""Score Distillation Sampling guidance (SD / Zero123 / MVDream / ImageDream).

Re-implements the reference guidance modules' ``train_step``/``refine``
math in traceable jnp so the whole SDS computation fuses into the jitted
train step:

- Stable Diffusion SDS (/root/reference/guidance/sd_utils.py:138-207):
  CFG 100, w = 1 - alpha_t, directional prompt selection by azimuth,
  timestep annealing t = (1-step_ratio)*N clipped to [0.02N, 0.98N],
  loss = 0.5*||latents - sg(latents - w(eps_hat - eps))||^2_sum / B.
- Zero123 (/root/reference/guidance/zero123_utils.py:120-171): CFG 5,
  camera-conditioned tokens through a linear projection, 8-ch UNet input
  (noisy latent ⊕ reference VAE latent), unscaled-sum loss.
- MVDream/ImageDream (/root/reference/guidance/mvdream_utils.py:94-190,
  imagedream_utils.py:129-214): 4(+1)-view joint UNet, shared timestep,
  NO w weighting, camera = normalized flattened c2w (16-dim).

The UNet+VAE evaluations run under ``stop_gradient`` exactly where the
reference uses ``no_grad``; gradients flow to the rendered images only
through the VAE encode of the current render (and for as_latent mode,
directly).

Guidance-fn contract (consumed by train/stage1.py and parallel/dp.py):
``fn(images [B,H,W,3] in [0,1], cond dict, step_ratio, key) -> scalar``,
where the scalar is the mean-over-views loss in the reference's units.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .scheduler import DDIMScheduler


class Backbone(NamedTuple):
    """Frozen diffusion backbone handles.

    The closure-style applies (``unet_apply``/``vae_encode``/
    ``vae_decode``) are for EAGER use (refine loops, one-off calls):
    their params live as device buffers inside the jitted closure.

    For tracing into an OUTER jit (the fused SDS train step), use the
    param-PASSING forms + ``net_params``: JAX inlines closed-over arrays
    into the lowered module as dense literals, which for a real 860M-
    param UNet means a multi-GB StableHLO and a ~half-hour lowering.
    Passing params as arguments keeps them as runtime buffers.
    """

    unet_apply: Callable  # (latents NHWC, t [B], context [B,L,D]) -> eps NHWC
    vae_encode: Callable  # (imgs NHWC in [-1,1]) -> latents (scaled)
    vae_decode: Callable  # (latents) -> imgs NHWC in [-1,1]
    scheduler: DDIMScheduler
    latent_size: int      # latent spatial size for this guidance's res
    unet_apply_p: Callable | None = None  # (params, x, t, ctx, **kw) -> eps
    vae_encode_p: Callable | None = None  # (params, imgs) -> latents
    vae_decode_p: Callable | None = None  # (params, latents) -> imgs
    net_params: dict | None = None        # {"unet": ..., "vae": ...}


def _applies(bk: Backbone, gp):
    """(unet_apply, vae_encode) — param-passing when ``gp`` is a non-empty
    params dict, closure-style otherwise."""
    if gp:
        return (
            lambda x, t, ctx, **kw: bk.unet_apply_p(gp["unet"], x, t, ctx,
                                                    **kw),
            lambda imgs: bk.vae_encode_p(gp["vae"], imgs),
        )
    return bk.unet_apply, bk.vae_encode


def _decode(bk: Backbone, gp):
    """vae_decode — param-passing when ``gp`` is a non-empty dict."""
    if gp:
        return lambda z: bk.vae_decode_p(gp["vae"], z)
    return bk.vae_decode


def _fused_ddim_loop(sch: DDIMScheduler, steps: int, latents, key, strength,
                     denoise):
    """img2img DDIM tail as ONE traced loop (the fused refine core).

    The eager refine loops dispatch one jitted UNet call per DDIM step;
    through a tunneled TPU each dispatch costs a host round-trip, which
    dominates stage 2. Here the whole tail — noise at ts[init_step], then
    denoise ts[init_step:] — is a ``lax.fori_loop`` with DYNAMIC bounds,
    so one compiled program covers every ``strength`` (the reference
    varies strength per iteration: /root/reference/main2.py:240).

    ``denoise(latents, t) -> eps_hat`` builds the CFG'd prediction; ``t``
    is a traced scalar. ``strength`` may be a traced scalar in [0, 1].
    """
    spacing = sch.num_train_timesteps // steps
    # Descending "leading" spacing, matching set_timesteps.
    ts_arr = jnp.arange(steps - 1, -1, -1, dtype=jnp.int32) * spacing
    init_step = jnp.clip(
        jnp.floor(steps * strength).astype(jnp.int32), 0, steps - 1
    )
    t0 = ts_arr[init_step]
    b = latents.shape[0]
    # Same split as the eager loops (k_n, key = split(key); normal(k_n))
    # so fused and eager refine are numerically identical per key.
    k_n, _ = jax.random.split(key)
    noise = jax.random.normal(k_n, latents.shape)
    latents = sch.add_noise(latents, noise, jnp.full((b,), t0, jnp.int32))

    def body(i, lat):
        t = ts_arr[i]
        return sch.step_with_spacing(denoise(lat, t), t, lat, spacing)

    return jax.lax.fori_loop(init_step, steps, body, latents)


def _full_ddim_sample(sch: DDIMScheduler, steps: int, latents, denoise):
    """Full-chain DDIM from PURE-NOISE latents (txt2img sampling).

    The reference's standalone samplers start from x_T ~ N(0, I) and walk
    every timestep of the leading-spaced schedule
    (/root/reference/guidance/sd_utils.py:209-250 produce_latents); here
    the whole chain is one traced ``fori_loop`` so a jitted caller
    dispatches it as a single program.
    """
    spacing = sch.num_train_timesteps // steps
    ts_arr = jnp.arange(steps - 1, -1, -1, dtype=jnp.int32) * spacing

    def body(i, lat):
        t = ts_arr[i]
        return sch.step_with_spacing(denoise(lat, t), t, lat, spacing)

    return jax.lax.fori_loop(0, steps, body, latents)


def _resize(images, size):
    b = images.shape[0]
    return jax.image.resize(
        images, (b, size, size, images.shape[-1]), "bilinear"
    )


def sds_grad_loss(latents, grad, divide_by_batch: bool):
    """loss = 0.5*||latents - sg(latents - grad)||^2_sum (/ B)."""
    target = jax.lax.stop_gradient(latents - grad)
    loss = 0.5 * jnp.sum((latents - target) ** 2)
    if divide_by_batch:
        loss = loss / latents.shape[0]
    return loss


def anneal_t(step_ratio, num_train: int, t_min: int, t_max: int):
    t = jnp.round((1.0 - step_ratio) * num_train)
    return jnp.clip(t, t_min, t_max).astype(jnp.int32)


class StableDiffusionGuidance:
    """SD 2.1 SDS. ``embeddings``: dict of [77, D] arrays with keys
    'pos', 'neg', 'front', 'side', 'back' (precomputed text embeds)."""

    def __init__(
        self,
        backbone: Backbone,
        embeddings: dict,
        guidance_scale: float = 100.0,
        t_range=(0.02, 0.98),
        image_size: int = 512,
        anneal: bool = True,
    ):
        self.backbone = backbone
        self.num_train = backbone.scheduler.num_train_timesteps
        self.t_min = int(self.num_train * t_range[0])
        self.t_max = int(self.num_train * t_range[1])
        self.guidance_scale = guidance_scale
        self.image_size = image_size
        self.anneal = anneal
        self.emb = {k: jnp.asarray(v) for k, v in embeddings.items()}

    def _directional_embeds(self, hors, batch_size):
        """Per-view embedding by azimuth: |h|<60 front, <120 side, else back
        (/root/reference/guidance/sd_utils.py:181-186)."""
        if "front" not in self.emb:
            return jnp.broadcast_to(
                self.emb["pos"][None], (batch_size,) + self.emb["pos"].shape
            )
        stack = jnp.stack([self.emb["front"], self.emb["side"], self.emb["back"]])
        ah = jnp.abs(hors)
        idx = jnp.where(ah < 60, 0, jnp.where(ah < 120, 1, 2))
        return stack[idx]

    def guidance_fn(self):
        bk = self.backbone
        scheduler = bk.scheduler
        alphas = scheduler.alphas_cumprod

        def fn(images, cond, step_ratio, key, gp=None):
            unet_apply, vae_encode = _applies(bk, gp)
            b = images.shape[0]
            imgs = _resize(images, self.image_size) * 2.0 - 1.0
            latents = vae_encode(imgs)

            k_t, k_n = jax.random.split(key)
            if self.anneal:
                t = anneal_t(step_ratio, self.num_train, self.t_min, self.t_max)
            else:
                t = jax.random.randint(k_t, (), self.t_min, self.t_max + 1)
            t_b = jnp.full((b,), t, jnp.int32)
            noise = jax.random.normal(k_n, latents.shape)
            latents_noisy = scheduler.add_noise(
                jax.lax.stop_gradient(latents), noise, t_b
            )

            pos = self._directional_embeds(cond.get("hors", jnp.zeros(b)), b)
            neg = jnp.broadcast_to(
                self.emb["neg"][None], (b,) + self.emb["neg"].shape
            )
            x_in = jnp.concatenate([latents_noisy] * 2)
            t_in = jnp.concatenate([t_b] * 2)
            ctx = jnp.concatenate([pos, neg])
            eps = jax.lax.stop_gradient(unet_apply(x_in, t_in, ctx))
            eps_cond, eps_uncond = jnp.split(eps, 2)
            eps_hat = eps_uncond + self.guidance_scale * (eps_cond - eps_uncond)

            w = (1.0 - alphas[t_b]).reshape(b, 1, 1, 1)
            grad = jnp.nan_to_num(w * (eps_hat - noise))
            return sds_grad_loss(latents, grad, divide_by_batch=True)

        return fn

    def refine(self, images, key, strength=0.8, steps=50,
               guidance_scale=100.0, hors=None):
        """img2img refinement loop (sd_utils.py:107-136). Host-level loop,
        no grad; returns images in [0,1]."""
        bk = self.backbone
        sch = bk.scheduler
        b = images.shape[0]
        ts = sch.set_timesteps(steps)
        init_step = int(steps * strength)
        imgs = _resize(jnp.asarray(images), self.image_size) * 2.0 - 1.0
        k_n, key = jax.random.split(key)
        latents = bk.vae_encode(imgs)
        noise = jax.random.normal(k_n, latents.shape)
        t0 = jnp.full((b,), int(ts[init_step]), jnp.int32)
        latents = sch.add_noise(latents, noise, t0)

        pos = self._directional_embeds(
            jnp.zeros(b) if hors is None else jnp.asarray(hors), b
        )
        neg = jnp.broadcast_to(self.emb["neg"][None], (b,) + self.emb["neg"].shape)
        ctx = jnp.concatenate([pos, neg])
        for t in ts[init_step:]:
            t_b = jnp.full((b,), int(t), jnp.int32)
            x_in = jnp.concatenate([latents] * 2)
            eps = bk.unet_apply(x_in, jnp.concatenate([t_b] * 2), ctx)
            eps_cond, eps_uncond = jnp.split(eps, 2)
            eps_hat = eps_uncond + guidance_scale * (eps_cond - eps_uncond)
            latents = sch.step(eps_hat, int(t), latents)
        return jnp.clip(bk.vae_decode(latents) * 0.5 + 0.5, 0.0, 1.0)

    def refine_fn(self, steps: int = 50, guidance_scale: float = 100.0):
        """Fused ``refine``: the whole img2img DDIM tail in ONE jitted
        call (see _fused_ddim_loop). Returns
        ``fn(images, cond, strength, key, gp=None) -> images in [0,1]``
        — the stage-2 refine contract with the trailing net_params slot
        (strength is traced; one compile covers every strength)."""
        bk = self.backbone
        sch = bk.scheduler

        def fn(images, cond, strength, key, gp=None):
            unet_apply, vae_encode = _applies(bk, gp)
            vae_decode = _decode(bk, gp)
            b = images.shape[0]
            imgs = _resize(images, self.image_size) * 2.0 - 1.0
            latents = vae_encode(imgs)
            hors = cond.get("hors") if cond else None
            pos = self._directional_embeds(
                jnp.zeros(b) if hors is None else jnp.asarray(hors), b
            )
            neg = jnp.broadcast_to(
                self.emb["neg"][None], (b,) + self.emb["neg"].shape
            )
            ctx = jnp.concatenate([pos, neg])

            def denoise(lat, t):
                t_in = jnp.full((2 * b,), t, jnp.int32)
                eps = unet_apply(jnp.concatenate([lat] * 2), t_in, ctx)
                eps_cond, eps_uncond = jnp.split(eps, 2)
                return eps_uncond + guidance_scale * (eps_cond - eps_uncond)

            latents = _fused_ddim_loop(
                sch, steps, latents, key, strength, denoise
            )
            return jnp.clip(vae_decode(latents) * 0.5 + 0.5, 0.0, 1.0)

        return jax.jit(fn)

    def sample_fn(self, steps: int = 50, guidance_scale: float = 7.5,
                  batch: int = 1, latent_channels: int = 4):
        """Text-to-image sampler — the reference's standalone guidance
        demo (/root/reference/guidance/sd_utils.py:269-305 prompt_to_img):
        DDIM from pure noise with CFG (default scale 7.5, not the SDS
        100), fused into ONE jitted call.

        Returns ``fn(key, gp=None) -> images [batch, S, S, 3] in [0,1]``.
        """
        bk = self.backbone
        sch = bk.scheduler

        def fn(key, gp=None):
            unet_apply, _ = _applies(bk, gp)
            vae_decode = _decode(bk, gp)
            latents = jax.random.normal(
                key,
                (batch, bk.latent_size, bk.latent_size, latent_channels),
            )
            pos = jnp.broadcast_to(
                self.emb["pos"][None], (batch,) + self.emb["pos"].shape
            )
            neg = jnp.broadcast_to(
                self.emb["neg"][None], (batch,) + self.emb["neg"].shape
            )
            ctx = jnp.concatenate([pos, neg])

            def denoise(lat, t):
                t_in = jnp.full((2 * batch,), t, jnp.int32)
                eps = unet_apply(jnp.concatenate([lat] * 2), t_in, ctx)
                eps_cond, eps_uncond = jnp.split(eps, 2)
                return eps_uncond + guidance_scale * (eps_cond - eps_uncond)

            latents = _full_ddim_sample(sch, steps, latents, denoise)
            return jnp.clip(vae_decode(latents) * 0.5 + 0.5, 0.0, 1.0)

        return jax.jit(fn)


def zero123_cam_embed(vers, hors, radii, default_elevation=0.0,
                      stable: bool = False):
    """[B,4] camera conditioning (zero123_utils.py:66-73)."""
    d2r = jnp.pi / 180.0
    if stable:
        last = jnp.full_like(vers, d2r * (90.0 + default_elevation))
    else:
        last = radii
    return jnp.stack(
        [d2r * vers, jnp.sin(d2r * hors), jnp.cos(d2r * hors), last], axis=-1
    )


class Zero123Guidance:
    """Image-conditioned novel-view SDS.

    ``clip_emb``: [1, 768] CLIP image embedding of the reference view.
    ``vae_latent``: [1, h, w, 4] UNSCALED posterior mean of the reference
    view. ``cam_proj``: (w [772, 768], b [768]) linear projection params.
    """

    def __init__(
        self,
        backbone: Backbone,
        clip_emb,
        vae_latent,
        cam_proj,
        guidance_scale: float = 5.0,
        t_range=(0.02, 0.98),
        image_size: int = 256,
        stable: bool = False,
        default_elevation: float = 0.0,
        anneal: bool = True,
    ):
        self.backbone = backbone
        self.num_train = backbone.scheduler.num_train_timesteps
        self.t_min = int(self.num_train * t_range[0])
        self.t_max = int(self.num_train * t_range[1])
        self.guidance_scale = guidance_scale
        self.image_size = image_size
        self.anneal = anneal
        self.stable = stable
        self.default_elevation = default_elevation
        self.clip_emb = jnp.asarray(clip_emb)
        self.vae_latent = jnp.asarray(vae_latent)
        self.cam_proj = jax.tree.map(jnp.asarray, cam_proj)

    def _cond_tokens(self, vers, hors, radii, b):
        T = zero123_cam_embed(
            vers, hors, radii, self.default_elevation, self.stable
        )[:, None, :]  # [B,1,4]
        clip = jnp.broadcast_to(self.clip_emb[None], (b, 1, self.clip_emb.shape[-1]))
        cc = jnp.concatenate([clip, T], axis=-1)  # [B,1,772]
        w, bias = self.cam_proj
        return cc @ w + bias  # [B,1,768]

    def guidance_fn(self):
        bk = self.backbone
        sch = bk.scheduler
        alphas = sch.alphas_cumprod

        def fn(images, cond, step_ratio, key, gp=None):
            unet_apply, vae_encode = _applies(bk, gp)
            b = images.shape[0]
            imgs = _resize(images, self.image_size) * 2.0 - 1.0
            latents = vae_encode(imgs)

            k_t, k_n = jax.random.split(key)
            if self.anneal:
                t = anneal_t(step_ratio, self.num_train, self.t_min, self.t_max)
            else:
                t = jax.random.randint(k_t, (), self.t_min, self.t_max + 1)
            t_b = jnp.full((b,), t, jnp.int32)
            noise = jax.random.normal(k_n, latents.shape)
            latents_noisy = sch.add_noise(
                jax.lax.stop_gradient(latents), noise, t_b
            )

            cc = self._cond_tokens(
                cond["vers"], cond["hors"], cond["radii"], b
            )
            ctx = jnp.concatenate([cc, jnp.zeros_like(cc)])
            vae_emb = jnp.broadcast_to(
                self.vae_latent, (b,) + self.vae_latent.shape[1:]
            )
            vae_in = jnp.concatenate([vae_emb, jnp.zeros_like(vae_emb)])
            x_in = jnp.concatenate([latents_noisy] * 2)
            x_in = jnp.concatenate([x_in, vae_in], axis=-1)  # 8-channel
            t_in = jnp.concatenate([t_b] * 2)

            eps = jax.lax.stop_gradient(unet_apply(x_in, t_in, ctx))
            eps_cond, eps_uncond = jnp.split(eps, 2)
            eps_hat = eps_uncond + self.guidance_scale * (eps_cond - eps_uncond)

            w = (1.0 - alphas[t_b]).reshape(b, 1, 1, 1)
            grad = jnp.nan_to_num(w * (eps_hat - noise))
            # Reference zero123 loss is sum WITHOUT /B (B=1 in its use);
            # divide here for the mean-over-views contract and scale back
            # in the trainer weight if exact parity at B>1 is wanted.
            return sds_grad_loss(latents, grad, divide_by_batch=True) * images.shape[0]

        return fn

    def refine(self, images, vers, hors, radii, key, strength=0.8, steps=50,
               guidance_scale=5.0):
        bk = self.backbone
        sch = bk.scheduler
        b = images.shape[0]
        ts = sch.set_timesteps(steps)
        init_step = int(steps * strength)
        imgs = _resize(jnp.asarray(images), self.image_size) * 2.0 - 1.0
        latents = bk.vae_encode(imgs)
        k_n, key = jax.random.split(key)
        t0 = jnp.full((b,), int(ts[init_step]), jnp.int32)
        latents = sch.add_noise(latents, jax.random.normal(k_n, latents.shape), t0)

        cc = self._cond_tokens(
            jnp.asarray(vers, jnp.float32), jnp.asarray(hors, jnp.float32),
            jnp.asarray(radii, jnp.float32), b,
        )
        ctx = jnp.concatenate([cc, jnp.zeros_like(cc)])
        vae_emb = jnp.broadcast_to(self.vae_latent, (b,) + self.vae_latent.shape[1:])
        vae_in = jnp.concatenate([vae_emb, jnp.zeros_like(vae_emb)])
        for t in ts[init_step:]:
            t_b = jnp.full((b,), int(t), jnp.int32)
            x_in = jnp.concatenate([jnp.concatenate([latents] * 2), vae_in],
                                   axis=-1)
            eps = bk.unet_apply(x_in, jnp.concatenate([t_b] * 2), ctx)
            eps_cond, eps_uncond = jnp.split(eps, 2)
            eps_hat = eps_uncond + guidance_scale * (eps_cond - eps_uncond)
            latents = sch.step(eps_hat, int(t), latents)
        return jnp.clip(bk.vae_decode(latents) * 0.5 + 0.5, 0.0, 1.0)

    def refine_fn(self, steps: int = 50, guidance_scale: float = 5.0):
        """Fused ``refine`` (one jitted call; see
        StableDiffusionGuidance.refine_fn). cond needs vers/hors/radii."""
        bk = self.backbone
        sch = bk.scheduler

        def fn(images, cond, strength, key, gp=None):
            unet_apply, vae_encode = _applies(bk, gp)
            vae_decode = _decode(bk, gp)
            b = images.shape[0]
            imgs = _resize(images, self.image_size) * 2.0 - 1.0
            latents = vae_encode(imgs)
            cc = self._cond_tokens(
                jnp.asarray(cond["vers"], jnp.float32),
                jnp.asarray(cond["hors"], jnp.float32),
                jnp.asarray(cond["radii"], jnp.float32), b,
            )
            ctx = jnp.concatenate([cc, jnp.zeros_like(cc)])
            vae_emb = jnp.broadcast_to(
                self.vae_latent, (b,) + self.vae_latent.shape[1:]
            )
            vae_in = jnp.concatenate([vae_emb, jnp.zeros_like(vae_emb)])

            def denoise(lat, t):
                t_in = jnp.full((2 * b,), t, jnp.int32)
                x_in = jnp.concatenate(
                    [jnp.concatenate([lat] * 2), vae_in], axis=-1
                )
                eps = unet_apply(x_in, t_in, ctx)
                eps_cond, eps_uncond = jnp.split(eps, 2)
                return eps_uncond + guidance_scale * (eps_cond - eps_uncond)

            latents = _fused_ddim_loop(
                sch, steps, latents, key, strength, denoise
            )
            return jnp.clip(vae_decode(latents) * 0.5 + 0.5, 0.0, 1.0)

        return jax.jit(fn)


def mvdream_camera(poses):
    """[B,4,4] OpenGL c2w -> normalized 16-dim blender-convention camera
    (/root/reference/guidance/mvdream_utils.py:125-128: swap rows 1 and 2,
    negate the new row 1, then normalize the translation)."""
    cam = jnp.asarray(poses, jnp.float32)
    cam = cam[:, jnp.array([0, 2, 1, 3])]
    cam = cam.at[:, 1].multiply(-1.0)
    t = cam[:, :3, 3]
    cam = cam.at[:, :3, 3].set(
        t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-8)
    )
    return cam.reshape(cam.shape[0], 16)


class MVDreamGuidance:
    """4-view joint SDS (no w(t) weighting).

    The RAW normalized 16-dim camera goes straight into the UNet's
    ``camera`` input — the UNet embeds it internally with its own
    ``camera_embedding`` MLP (matching the mvdream MultiViewUNetModel;
    the embed is applied exactly once)."""

    def __init__(
        self,
        backbone: Backbone,
        embeddings: dict,
        guidance_scale: float = 100.0,
        t_range=(0.02, 0.98),
        image_size: int = 256,
        num_views: int = 4,
        anneal: bool = True,
    ):
        self.backbone = backbone
        self.num_train = backbone.scheduler.num_train_timesteps
        self.t_min = int(self.num_train * t_range[0])
        self.t_max = int(self.num_train * t_range[1])
        self.guidance_scale = guidance_scale
        self.image_size = image_size
        self.anneal = anneal
        self.num_views = num_views
        self.emb = {k: jnp.asarray(v) for k, v in embeddings.items()}

    def guidance_fn(self):
        bk = self.backbone
        sch = bk.scheduler

        def fn(images, cond, step_ratio, key, gp=None):
            unet_apply, vae_encode = _applies(bk, gp)
            b = images.shape[0]  # = num_views * real_batch
            imgs = _resize(images, self.image_size) * 2.0 - 1.0
            latents = vae_encode(imgs)

            k_t, k_n = jax.random.split(key)
            # One shared t per 4-view group (mvdream_utils.py:121).
            if self.anneal:
                t = anneal_t(step_ratio, self.num_train, self.t_min, self.t_max)
            else:
                t = jax.random.randint(k_t, (), self.t_min, self.t_max + 1)
            t_b = jnp.full((b,), t, jnp.int32)
            noise = jax.random.normal(k_n, latents.shape)
            latents_noisy = sch.add_noise(
                jax.lax.stop_gradient(latents), noise, t_b
            )

            cam16 = mvdream_camera(cond["poses"])
            pos = jnp.broadcast_to(self.emb["pos"][None], (b,) + self.emb["pos"].shape)
            neg = jnp.broadcast_to(self.emb["neg"][None], (b,) + self.emb["neg"].shape)
            x_in = jnp.concatenate([latents_noisy] * 2)
            t_in = jnp.concatenate([t_b] * 2)
            ctx = jnp.concatenate([pos, neg])
            cam_in = jnp.concatenate([cam16] * 2)
            eps = jax.lax.stop_gradient(
                unet_apply(x_in, t_in, ctx, camera=cam_in)
            )
            eps_cond, eps_uncond = jnp.split(eps, 2)
            eps_hat = eps_uncond + self.guidance_scale * (eps_cond - eps_uncond)

            grad = jnp.nan_to_num(eps_hat - noise)  # NO w(t)
            return sds_grad_loss(latents, grad, divide_by_batch=True)

        return fn

    def refine(self, images, poses, key, strength=0.8, steps=50,
               guidance_scale=100.0):
        """4-view joint img2img refinement
        (/root/reference/guidance/mvdream_utils.py:55-92). Host loop, no
        grad; images [B=4rb, H, W, 3] in [0,1] -> same shape in [0,1]."""
        bk = self.backbone
        sch = bk.scheduler
        b = images.shape[0]
        ts = sch.set_timesteps(steps)
        init_step = int(steps * strength)
        imgs = _resize(jnp.asarray(images), self.image_size) * 2.0 - 1.0
        latents = bk.vae_encode(imgs)
        k_n, key = jax.random.split(key)
        t0 = jnp.full((b,), int(ts[init_step]), jnp.int32)
        latents = sch.add_noise(
            latents, jax.random.normal(k_n, latents.shape), t0
        )

        cam16 = mvdream_camera(jnp.asarray(poses, jnp.float32))
        cam_in = jnp.concatenate([cam16] * 2)
        pos = jnp.broadcast_to(self.emb["pos"][None], (b,) + self.emb["pos"].shape)
        neg = jnp.broadcast_to(self.emb["neg"][None], (b,) + self.emb["neg"].shape)
        # Reference order: [neg, pos] with uncond chunked first.
        ctx = jnp.concatenate([neg, pos])
        for t in ts[init_step:]:
            t_b = jnp.full((b,), int(t), jnp.int32)
            x_in = jnp.concatenate([latents] * 2)
            eps = bk.unet_apply(
                x_in, jnp.concatenate([t_b] * 2), ctx, camera=cam_in
            )
            eps_uncond, eps_cond = jnp.split(eps, 2)
            eps_hat = eps_uncond + guidance_scale * (eps_cond - eps_uncond)
            latents = sch.step(eps_hat, int(t), latents)
        return jnp.clip(bk.vae_decode(latents) * 0.5 + 0.5, 0.0, 1.0)

    def refine_fn(self, steps: int = 50, guidance_scale: float = 100.0):
        """Fused 4-view ``refine`` (one jitted call; see
        StableDiffusionGuidance.refine_fn). cond needs poses [B,4,4]."""
        bk = self.backbone
        sch = bk.scheduler

        def fn(images, cond, strength, key, gp=None):
            unet_apply, vae_encode = _applies(bk, gp)
            vae_decode = _decode(bk, gp)
            b = images.shape[0]
            imgs = _resize(images, self.image_size) * 2.0 - 1.0
            latents = vae_encode(imgs)
            cam16 = mvdream_camera(jnp.asarray(cond["poses"], jnp.float32))
            cam_in = jnp.concatenate([cam16] * 2)
            pos = jnp.broadcast_to(
                self.emb["pos"][None], (b,) + self.emb["pos"].shape
            )
            neg = jnp.broadcast_to(
                self.emb["neg"][None], (b,) + self.emb["neg"].shape
            )
            ctx = jnp.concatenate([neg, pos])

            def denoise(lat, t):
                t_in = jnp.full((2 * b,), t, jnp.int32)
                eps = unet_apply(
                    jnp.concatenate([lat] * 2), t_in, ctx, camera=cam_in
                )
                eps_uncond, eps_cond = jnp.split(eps, 2)
                return eps_uncond + guidance_scale * (eps_cond - eps_uncond)

            latents = _fused_ddim_loop(
                sch, steps, latents, key, strength, denoise
            )
            return jnp.clip(vae_decode(latents) * 0.5 + 0.5, 0.0, 1.0)

        return jax.jit(fn)

    def sample_fn(self, steps: int = 30, guidance_scale: float = 7.5,
                  latent_channels: int = 4):
        """Text-to-multiview sampler — the reference's standalone demo
        (/root/reference/guidance/mvdream_utils.py:204-277 prompt_to_img):
        4 jointly-denoised views from pure noise, CFG 7.5, as ONE jitted
        call. Returns ``fn(poses [4,4,4], key, gp=None) -> [4, S, S, 3]``.
        """
        bk = self.backbone
        sch = bk.scheduler
        b = self.num_views

        def fn(poses, key, gp=None):
            unet_apply, _ = _applies(bk, gp)
            vae_decode = _decode(bk, gp)
            latents = jax.random.normal(
                key, (b, bk.latent_size, bk.latent_size, latent_channels)
            )
            cam16 = mvdream_camera(jnp.asarray(poses, jnp.float32))
            cam_in = jnp.concatenate([cam16] * 2)
            pos = jnp.broadcast_to(
                self.emb["pos"][None], (b,) + self.emb["pos"].shape
            )
            neg = jnp.broadcast_to(
                self.emb["neg"][None], (b,) + self.emb["neg"].shape
            )
            ctx = jnp.concatenate([neg, pos])

            def denoise(lat, t):
                t_in = jnp.full((2 * b,), t, jnp.int32)
                eps = unet_apply(
                    jnp.concatenate([lat] * 2), t_in, ctx, camera=cam_in
                )
                eps_uncond, eps_cond = jnp.split(eps, 2)
                return eps_uncond + guidance_scale * (eps_cond - eps_uncond)

            latents = _full_ddim_sample(sch, steps, latents, denoise)
            return jnp.clip(vae_decode(latents) * 0.5 + 0.5, 0.0, 1.0)

        return jax.jit(fn)


class ImageDreamGuidance:
    """Image+text 4(+1)-view joint SDS
    (/root/reference/guidance/imagedream_utils.py:129-214).

    A 5th "extra view" slot carries the identity-image conditioning: its
    noisy latent is zero-padded (the UNet itself writes ``ip_img`` into
    that slot), the CLIP image tokens (``ip``) ride in the conditioning
    through the UNet's resampler + ip cross-attention, and the extra view
    is stripped from the prediction before the SDS gradient.
    CFG 5; no w(t) weighting; t shared across the 4 real views and
    REPEATED into the extra view (imagedream_utils.py:184-185).

    ``embeddings``: 'pos'/'neg' text embeds [L, D].
    ``image_embeddings``: 'pos' CLIP image tokens [Li, Di]; 'ip_img'
    latent [h, w, 4] (negatives are zeros, as the reference).
    The RAW 16-dim camera feeds the UNet's internal camera embedding
    (zero camera for the extra view, imagedream_utils.py:162-165).
    """

    def __init__(
        self,
        backbone: Backbone,
        embeddings: dict,
        image_embeddings: dict,
        guidance_scale: float = 5.0,
        t_range=(0.02, 0.98),
        image_size: int = 256,
        num_views: int = 4,
        anneal: bool = True,
    ):
        self.backbone = backbone
        self.num_train = backbone.scheduler.num_train_timesteps
        self.t_min = int(self.num_train * t_range[0])
        self.t_max = int(self.num_train * t_range[1])
        self.guidance_scale = guidance_scale
        self.image_size = image_size
        self.anneal = anneal
        self.num_views = num_views
        self.emb = {k: jnp.asarray(v) for k, v in embeddings.items()}
        self.img_emb = {k: jnp.asarray(v) for k, v in image_embeddings.items()}

    def _pad_views(self, x, mode: str = "zero"):
        """[rB*V, ...] -> [rB*(V+1), ...] with an extra view per group:
        zeros (latents, cameras) or a repeat of the first view (t)."""
        v = self.num_views
        rb = x.shape[0] // v
        x = x.reshape((rb, v) + x.shape[1:])
        pad = x[:, :1] if mode == "repeat" else jnp.zeros_like(x[:, :1])
        return jnp.concatenate([x, pad], axis=1).reshape(
            (rb * (v + 1),) + x.shape[2:]
        )

    def _strip_views(self, x):
        v = self.num_views
        rb = x.shape[0] // (v + 1)
        x = x.reshape((rb, v + 1) + x.shape[1:])
        return x[:, :v].reshape((rb * v,) + x.shape[2:])

    def guidance_fn(self):
        bk = self.backbone
        sch = bk.scheduler

        def fn(images, cond, step_ratio, key, gp=None):
            unet_apply, vae_encode = _applies(bk, gp)
            b = images.shape[0]
            rb = b // self.num_views
            imgs = _resize(images, self.image_size) * 2.0 - 1.0
            latents = vae_encode(imgs)

            k_t, k_n = jax.random.split(key)
            if self.anneal:
                t = anneal_t(step_ratio, self.num_train, self.t_min, self.t_max)
            else:
                t = jax.random.randint(k_t, (), self.t_min, self.t_max + 1)
            t_b = jnp.full((b,), t, jnp.int32)
            noise = jax.random.normal(k_n, latents.shape)
            latents_noisy = sch.add_noise(
                jax.lax.stop_gradient(latents), noise, t_b
            )

            # Pad the extra (identity) view: zero latent + zero camera,
            # REPEATED t (imagedream_utils.py:184-189).
            lat_in = self._pad_views(latents_noisy)
            t_in5 = self._pad_views(t_b.astype(jnp.float32), mode="repeat")
            cam16 = self._pad_views(mvdream_camera(cond["poses"]))

            text_pos = jnp.broadcast_to(
                self.emb["pos"][None], (rb * (self.num_views + 1),)
                + self.emb["pos"].shape
            )
            text_neg = jnp.broadcast_to(
                self.emb["neg"][None], text_pos.shape
            )
            ip_pos = jnp.broadcast_to(
                self.img_emb["pos"][None], (rb * (self.num_views + 1),)
                + self.img_emb["pos"].shape
            )
            ip_neg = jnp.zeros_like(ip_pos)
            ip_img_pos = jnp.broadcast_to(
                self.img_emb["ip_img"][None],
                (rb,) + self.img_emb["ip_img"].shape,
            )
            ip_img_neg = jnp.zeros_like(ip_img_pos)

            x_in = jnp.concatenate([lat_in] * 2)
            t_in = jnp.concatenate([t_in5] * 2)
            ctx = jnp.concatenate([text_neg, text_pos])
            cam_in = jnp.concatenate([cam16] * 2)
            ip = jnp.concatenate([ip_neg, ip_pos])
            ip_img = jnp.concatenate([ip_img_neg, ip_img_pos])

            eps5 = jax.lax.stop_gradient(
                unet_apply(
                    x_in, t_in, ctx, camera=cam_in, ip=ip, ip_img=ip_img
                )
            )
            eps_uncond5, eps_cond5 = jnp.split(eps5, 2)
            eps_uncond = self._strip_views(eps_uncond5)
            eps_cond = self._strip_views(eps_cond5)
            eps_hat = eps_uncond + self.guidance_scale * (
                eps_cond - eps_uncond
            )

            grad = jnp.nan_to_num(eps_hat - noise)  # NO w(t)
            return sds_grad_loss(latents, grad, divide_by_batch=True)

        return fn

    def refine(self, images, poses, key, strength=0.8, steps=50,
               guidance_scale=5.0):
        """4(+1)-view img2img refinement
        (/root/reference/guidance/imagedream_utils.py:67-127). The latents
        stay 4-view; every denoise step pads the extra view in (zeros —
        the UNet substitutes ip_img), strips it from the prediction."""
        bk = self.backbone
        sch = bk.scheduler
        b = images.shape[0]
        rb = b // self.num_views
        ts = sch.set_timesteps(steps)
        init_step = int(steps * strength)
        imgs = _resize(jnp.asarray(images), self.image_size) * 2.0 - 1.0
        latents = bk.vae_encode(imgs)
        k_n, key = jax.random.split(key)
        t0 = jnp.full((b,), int(ts[init_step]), jnp.int32)
        latents = sch.add_noise(
            latents, jax.random.normal(k_n, latents.shape), t0
        )

        n5 = rb * (self.num_views + 1)
        cam16 = self._pad_views(mvdream_camera(jnp.asarray(poses, jnp.float32)))
        cam_in = jnp.concatenate([cam16] * 2)
        text_pos = jnp.broadcast_to(
            self.emb["pos"][None], (n5,) + self.emb["pos"].shape
        )
        text_neg = jnp.broadcast_to(self.emb["neg"][None], text_pos.shape)
        ctx = jnp.concatenate([text_neg, text_pos])
        ip_pos = jnp.broadcast_to(
            self.img_emb["pos"][None], (n5,) + self.img_emb["pos"].shape
        )
        ip = jnp.concatenate([jnp.zeros_like(ip_pos), ip_pos])
        ip_img_pos = jnp.broadcast_to(
            self.img_emb["ip_img"][None], (rb,) + self.img_emb["ip_img"].shape
        )
        ip_img = jnp.concatenate([jnp.zeros_like(ip_img_pos), ip_img_pos])

        for t in ts[init_step:]:
            t5 = self._pad_views(
                jnp.full((b,), int(t), jnp.float32), mode="repeat"
            )
            x_in = jnp.concatenate([self._pad_views(latents)] * 2)
            eps5 = bk.unet_apply(
                x_in, jnp.concatenate([t5] * 2), ctx, camera=cam_in,
                ip=ip, ip_img=ip_img,
            )
            eps_uncond5, eps_cond5 = jnp.split(eps5, 2)
            eps_uncond = self._strip_views(eps_uncond5)
            eps_cond = self._strip_views(eps_cond5)
            eps_hat = eps_uncond + guidance_scale * (eps_cond - eps_uncond)
            latents = sch.step(eps_hat, int(t), latents)
        return jnp.clip(bk.vae_decode(latents) * 0.5 + 0.5, 0.0, 1.0)

    def refine_fn(self, steps: int = 50, guidance_scale: float = 5.0):
        """Fused 4(+1)-view ``refine`` (one jitted call; see
        StableDiffusionGuidance.refine_fn). cond needs poses; the extra
        view is padded in / stripped out per denoise step."""
        bk = self.backbone
        sch = bk.scheduler

        def fn(images, cond, strength, key, gp=None):
            unet_apply, vae_encode = _applies(bk, gp)
            vae_decode = _decode(bk, gp)
            b = images.shape[0]
            rb = b // self.num_views
            imgs = _resize(images, self.image_size) * 2.0 - 1.0
            latents = vae_encode(imgs)
            n5 = rb * (self.num_views + 1)
            cam16 = self._pad_views(
                mvdream_camera(jnp.asarray(cond["poses"], jnp.float32))
            )
            cam_in = jnp.concatenate([cam16] * 2)
            text_pos = jnp.broadcast_to(
                self.emb["pos"][None], (n5,) + self.emb["pos"].shape
            )
            text_neg = jnp.broadcast_to(self.emb["neg"][None], text_pos.shape)
            ctx = jnp.concatenate([text_neg, text_pos])
            ip_pos = jnp.broadcast_to(
                self.img_emb["pos"][None], (n5,) + self.img_emb["pos"].shape
            )
            ip = jnp.concatenate([jnp.zeros_like(ip_pos), ip_pos])
            ip_img_pos = jnp.broadcast_to(
                self.img_emb["ip_img"][None],
                (rb,) + self.img_emb["ip_img"].shape,
            )
            ip_img = jnp.concatenate([jnp.zeros_like(ip_img_pos), ip_img_pos])

            def denoise(lat, t):
                t5 = self._pad_views(
                    jnp.full((b,), t, jnp.float32), mode="repeat"
                )
                x_in = jnp.concatenate([self._pad_views(lat)] * 2)
                eps5 = unet_apply(
                    x_in, jnp.concatenate([t5] * 2), ctx, camera=cam_in,
                    ip=ip, ip_img=ip_img,
                )
                eps_uncond5, eps_cond5 = jnp.split(eps5, 2)
                eps_uncond = self._strip_views(eps_uncond5)
                eps_cond = self._strip_views(eps_cond5)
                return eps_uncond + guidance_scale * (eps_cond - eps_uncond)

            latents = _fused_ddim_loop(
                sch, steps, latents, key, strength, denoise
            )
            return jnp.clip(vae_decode(latents) * 0.5 + 0.5, 0.0, 1.0)

        return jax.jit(fn)

    def sample_fn(self, steps: int = 30, guidance_scale: float = 5.0,
                  latent_channels: int = 4):
        """Image+text-to-multiview sampler — the reference's standalone
        demo (/root/reference/guidance/imagedream_utils.py:228-324
        prompt_to_img): 4 views from pure noise, the 5th (identity) view
        padded per step exactly as the refine path. One jitted call.
        Returns ``fn(poses [4,4,4], key, gp=None) -> [4, S, S, 3]``.
        """
        bk = self.backbone
        sch = bk.scheduler
        b = self.num_views
        rb = 1

        def fn(poses, key, gp=None):
            unet_apply, _ = _applies(bk, gp)
            vae_decode = _decode(bk, gp)
            latents = jax.random.normal(
                key, (b, bk.latent_size, bk.latent_size, latent_channels)
            )
            n5 = rb * (self.num_views + 1)
            cam16 = self._pad_views(
                mvdream_camera(jnp.asarray(poses, jnp.float32))
            )
            cam_in = jnp.concatenate([cam16] * 2)
            text_pos = jnp.broadcast_to(
                self.emb["pos"][None], (n5,) + self.emb["pos"].shape
            )
            text_neg = jnp.broadcast_to(self.emb["neg"][None], text_pos.shape)
            ctx = jnp.concatenate([text_neg, text_pos])
            ip_pos = jnp.broadcast_to(
                self.img_emb["pos"][None], (n5,) + self.img_emb["pos"].shape
            )
            ip = jnp.concatenate([jnp.zeros_like(ip_pos), ip_pos])
            ip_img_pos = jnp.broadcast_to(
                self.img_emb["ip_img"][None],
                (rb,) + self.img_emb["ip_img"].shape,
            )
            ip_img = jnp.concatenate([jnp.zeros_like(ip_img_pos), ip_img_pos])

            def denoise(lat, t):
                t5 = self._pad_views(
                    jnp.full((b,), t, jnp.float32), mode="repeat"
                )
                x_in = jnp.concatenate([self._pad_views(lat)] * 2)
                eps5 = unet_apply(
                    x_in, jnp.concatenate([t5] * 2), ctx, camera=cam_in,
                    ip=ip, ip_img=ip_img,
                )
                eps_uncond5, eps_cond5 = jnp.split(eps5, 2)
                eps_uncond = self._strip_views(eps_uncond5)
                eps_cond = self._strip_views(eps_cond5)
                return eps_uncond + guidance_scale * (eps_cond - eps_uncond)

            latents = _full_ddim_sample(sch, steps, latents, denoise)
            return jnp.clip(vae_decode(latents) * 0.5 + 0.5, 0.0, 1.0)

        return jax.jit(fn)


def _guidance_args(self):
    """(fn, net_params) for PARAM-PASSING use inside an outer jit.

    Trainers register the pair as ``(weight, fn, net_params)`` and call
    ``fn(images, cond, step_ratio, key, net_params)`` with net_params fed
    through the jit boundary as an argument — closed-over real-size
    UNet/VAE params would be inlined into the lowered module as dense
    literals (see Backbone docstring). Falls back to the closure style
    ({} params) for backbones that carry no param handles (fakes).
    """
    return self.guidance_fn(), (self.backbone.net_params or {})


def _refine_args(self, **kw):
    """(fused_refine_fn, net_params) — the stage-2 analogue of
    ``guidance_args``: trainers register ``(weight, fn, net_params)`` and
    call ``fn(images, cond, strength, key, net_params)``. The fn is one
    jitted program per guidance covering every strength."""
    return self.refine_fn(**kw), (self.backbone.net_params or {})


StableDiffusionGuidance.guidance_args = _guidance_args
Zero123Guidance.guidance_args = _guidance_args
MVDreamGuidance.guidance_args = _guidance_args
ImageDreamGuidance.guidance_args = _guidance_args
StableDiffusionGuidance.refine_args = _refine_args
Zero123Guidance.refine_args = _refine_args
MVDreamGuidance.refine_args = _refine_args
ImageDreamGuidance.refine_args = _refine_args
