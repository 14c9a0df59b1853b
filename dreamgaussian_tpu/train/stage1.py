"""Stage-1 trainer: Gaussian-splat optimization with SDS guidance.

TPU-native re-architecture of the reference training loop
(/root/reference/main.py:182-307). Semantics replicated:

- known-view loss = 10000*w*mse(image, ref_rgb) + 1000*w*mse(alpha, ref_mask)
  with w = step_ratio when ``warmup_rgb_loss`` else 1;
- novel-view resolution ladder 128/256/512 at step_ratio 0.3/0.6 breakpoints;
- orbit sampling ver ~ U[min_ver, max_ver), hor ~ U[-180, 180), radius offset
  0, elevation-shifted and clamped to +-80 absolute;
- random white/black background per iteration (invert_bg_prob);
- densification stats are taken from the LAST novel view rendered in the
  iteration (the reference reads ``out`` after its batch loop,
  /root/reference/main.py:279-281), with the mean2D gradient scaled by
  (W/2, H/2) to match what the CUDA rasterizer reports;
- densify/prune every ``densification_interval`` inside
  [density_start_iter, density_end_iter], opacity reset every
  ``opacity_reset_interval``;
- xyz LR follows the exponential schedule with spatial_lr_scale=10 for
  random init (/root/reference/gs_renderer.py:356-382, main :694-703).

TPU-first differences: the whole iteration — renders, losses, gradient,
Adam update, stat accumulation — is ONE jitted function per novel-view
resolution (3 compiles for the ladder); densify/prune is a second jitted
function at fixed capacity; the host loop only samples cameras (numpy RNG,
like the reference) and sequences jit calls.
"""

from __future__ import annotations

import functools
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rasterize import render_gaussians
from ..scene import (
    accumulate_stats,
    adam_init,
    adam_update,
    densify_and_prune,
    expon_lr,
    init_random,
    load_ply,
    num_alive,
    prune_only,
    reset_opacity,
    save_ply,
)
from ..utils.camera import Camera, orbit_camera, stack_cameras

# Guidance interface: callable (images [B,H,W,3] f32 in [0,1], cond dict,
# step_ratio scalar, key) -> scalar loss, differentiable w.r.t. images.
GuidanceFn = Callable[..., jnp.ndarray]


def _render_one(params, cam_arrays, bg, width, height, sh_degree, alive,
                tap=None, max_tiles=12, chunk=128, tile=32):
    act_scale = jnp.exp(params["scaling"])
    act_op = jax.nn.sigmoid(params["opacity"][:, 0])
    shs = jnp.concatenate([params["f_dc"], params["f_rest"]], axis=1)
    return render_gaussians(
        params["xyz"], act_scale, params["rotation"], act_op, shs,
        cam_arrays["view"], cam_arrays["full_proj"], cam_arrays["campos"],
        cam_arrays["tanfov"], width, height, bg,
        sh_degree=sh_degree, alive=alive, mean2d_tap=tap,
        max_tiles=max_tiles, chunk=chunk, tile=tile,
    )


def make_train_step(
    *,
    novel_size: int,
    n_novel: int,
    ref_size: int,
    sh_degree: int,
    use_known_view: bool,
    warmup_rgb_loss: bool,
    lr_schedules: dict,
    guidance_fns: tuple = (),
    max_tiles: int = 12,
    chunk: int = 128,
):
    """Build the jitted train step for one novel-view resolution.

    guidance_fns: tuple of (weight, fn) or (weight, fn, net_params)
    entries; each fn is traced into the step. 3-tuples use the param-
    PASSING guidance contract (fn(images, cond, step_ratio, key, gp)
    with gp fed through the jit boundary — real-size UNet/VAE params
    must NOT be closed over, see guidance/sds.py Backbone). Returns
    step_fn(params, adam, aux, step, known_cams, novel_cams, bg,
    ref_rgb, ref_mask, key, cond, accum_stats, gparams)
    -> (params, adam, aux, metrics), where gparams is the tuple of
    net_params (() placeholders for 2-tuples).
    """

    def loss_fn(params, tap, step, known_cams, novel_cams, bg, ref_rgb,
                ref_mask, key, cond, alive, gparams):
        step_ratio = jnp.minimum(1.0, step / lr_schedules["total_iters"])
        w = step_ratio if warmup_rgb_loss else 1.0
        loss = 0.0
        if use_known_view:
            out = _render_one(
                params, known_cams, jnp.ones(3), ref_size, ref_size,
                sh_degree, alive, max_tiles=max_tiles, chunk=chunk,
            )
            loss += 10000.0 * w * jnp.mean((out.image - ref_rgb) ** 2)
            loss += 1000.0 * w * jnp.mean((out.alpha - ref_mask) ** 2)

        images = []
        last = None
        overflow = jnp.int32(0)
        for b in range(n_novel):
            cam_b = {k: v[b] for k, v in novel_cams.items()}
            t = tap if b == n_novel - 1 else None
            last = _render_one(
                params, cam_b, bg, novel_size, novel_size, sh_degree, alive,
                tap=t, max_tiles=max_tiles, chunk=chunk,
            )
            images.append(last.image)
            overflow = overflow + last.overflow
        images = jnp.stack(images) if images else jnp.zeros((0,))

        for i, entry in enumerate(guidance_fns):
            if len(entry) > 2:
                loss += entry[0] * entry[1](images, cond, step_ratio, key,
                                            gparams[i])
            else:
                loss += entry[0] * entry[1](images, cond, step_ratio, key)
        return loss, (last.radii if last is not None else None, overflow)

    @jax.jit
    def step_fn(params, adam, aux, step, known_cams, novel_cams, bg,
                ref_rgb, ref_mask, key, cond, accum_stats, gparams=()):
        tap = jnp.zeros((params["xyz"].shape[0], 2), jnp.float32)
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (loss, (radii, overflow)), (grads, tap_grad) = grad_fn(
            params, tap, step, known_cams, novel_cams, bg, ref_rgb,
            ref_mask, key, cond, aux.alive, gparams,
        )
        grads = {k: jnp.nan_to_num(v) for k, v in grads.items()}

        lrs = {
            "xyz": lr_schedules["xyz"](step),
            "f_dc": lr_schedules["f_dc"],
            "f_rest": lr_schedules["f_rest"],
            "opacity": lr_schedules["opacity"],
            "scaling": lr_schedules["scaling"],
            "rotation": lr_schedules["rotation"],
        }
        params, adam = adam_update(params, grads, adam, lrs)

        if radii is not None:
            # Stats only accumulate inside the densification window
            # (/root/reference/main.py:277-281). CUDA reports dL/dmean2D in
            # half-image units.
            scaled = jnp.nan_to_num(tap_grad) * (novel_size / 2.0)
            new_aux = accumulate_stats(aux, scaled, radii)
            aux = jax.tree.map(
                lambda a, b: jnp.where(accum_stats, b, a), aux, new_aux
            )
        return params, adam, aux, {"loss": loss, "overflow": overflow}

    return step_fn


def make_train_scan(
    *,
    novel_size: int,
    n_novel: int,
    ref_size: int,
    sh_degree: int,
    use_known_view: bool,
    warmup_rgb_loss: bool,
    lr_schedules: dict,
    densify_fn,
    reset_fn,
    guidance_fns: tuple = (),
    max_tiles: int = 12,
    chunk: int = 128,
):
    """Fused multi-step trainer: ONE device dispatch per K-step segment.

    Per-step host dispatch costs dominate tunneled/remote TPU setups (a
    sync per step measured 0.5 s/iter; async-but-per-step still ~0.23).
    Here K steps run as a single ``lax.scan`` whose body is the whole
    iteration; densify/prune and opacity reset fire INSIDE the scan via
    ``lax.cond`` on per-step flags (both are shape-static, so the cond
    branches compile once). The host only samples K cameras up front.

    ``densify_fn=None`` omits the in-scan densify/reset conds entirely
    (the flag/key xs become inert): on the real TPU backend, a scan of
    length >= ~5 whose body contains BOTH the densify cond branches and
    a real-size guidance net deterministically faults the device at
    larger capacities (bisected 2026-08-19: k=1 ok, k=5 faults, k=5
    without the conds ok, same shapes with a tiny fake guidance ok —
    a backend miscompile, not our math). Stage1Trainer therefore splits
    segments at densify boundaries and applies densify/reset between
    scans by default; the in-scan path remains for the DP trainer and
    CPU tests.
    """
    step_fn = make_train_step(
        novel_size=novel_size, n_novel=n_novel, ref_size=ref_size,
        sh_degree=sh_degree, use_known_view=use_known_view,
        warmup_rgb_loss=warmup_rgb_loss, lr_schedules=lr_schedules,
        guidance_fns=guidance_fns, max_tiles=max_tiles, chunk=chunk,
    )

    @jax.jit
    def scan_fn(params, adam, aux, known_cams, ref_rgb, ref_mask,
                steps, novel_cams_seq, bgs, keys, conds_seq, accums,
                densify_flags, reset_flags, densify_keys, gparams=()):
        def body(carry, xs):
            params, adam, aux = carry
            (step, ncams, bg, key, cond, accum, do_d, do_r, dkey) = xs
            params, adam, aux, metrics = step_fn(
                params, adam, aux, step, known_cams, ncams, bg,
                ref_rgb, ref_mask, key, cond, accum, gparams,
            )
            if densify_fn is not None:
                def densify_branch(t):
                    p, a, x, dropped = densify_fn(t[0], t[1], t[2], dkey)
                    return (p, a, x), dropped

                (params, adam, aux), metrics["densify_dropped"] = (
                    jax.lax.cond(
                        do_d,
                        densify_branch,
                        lambda t: (t, jnp.int32(0)),
                        (params, adam, aux),
                    )
                )
                params, adam = jax.lax.cond(
                    do_r,
                    lambda t: reset_fn(t[0], t[1]),
                    lambda t: t,
                    (params, adam),
                )
            return (params, adam, aux), metrics

        xs = (steps, novel_cams_seq, bgs, keys, conds_seq, accums,
              densify_flags, reset_flags, densify_keys)
        (params, adam, aux), metrics = jax.lax.scan(
            body, (params, adam, aux), xs
        )
        return params, adam, aux, metrics

    return scan_fn


class Stage1Trainer:
    """Headless stage-1 optimization (GUI-free equivalent of main.py GUI)."""

    def __init__(
        self,
        opt: Any,
        ref_rgb: np.ndarray | None = None,
        ref_mask: np.ndarray | None = None,
        guidance_fns: tuple = (),
        cond: dict | None = None,
        capacity: int = 16384,
        seed: int = 0,
        mesh=None,
    ):
        """opt: config namespace with the reference's image.yaml keys.

        ``mesh``: optional jax.sharding.Mesh with a 'data' axis (novel
        SDS views shard over it) and optionally a 'tile' axis (each
        render's tile grid shards over it — the SP/CP analogue). With a
        mesh, every train path (train_step / train_segment / train) runs
        the shard_map'd scan from parallel/dp.py; params, Adam state and
        the density controller stay replicated (psum'd grads/stats), so
        checkpoints/exports are mesh-independent."""
        self.opt = opt
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.step = 0
        self.capacity = capacity
        self.guidance_fns = guidance_fns
        # Param-passing guidance entries carry net_params as a 3rd item;
        # those flow through the jit boundary as arguments (() for
        # closure-style entries keeps the pytree structure static).
        self.gparams = tuple(
            e[2] if len(e) > 2 else () for e in guidance_fns
        )
        self.cond = cond or {}
        # Binning duplicate-slot cap. Overflow (a gaussian spanning more
        # tiles than this) is detected per step and escalates the cap
        # (one retrace) — never silently wrong for more than the segment
        # that first detected it.
        self.max_tiles = int(opt.get("max_tiles", 12))
        # In-scan densify (lax.cond inside the fused scan) is kept for the
        # DP path and CPU tests; single-device TPU runs apply densify
        # between sub-scans (see train_segment / make_train_scan).
        # In-scan densify (lax.cond inside the fused scan) faults the
        # real TPU backend at scale (see make_train_scan); default to
        # host-side segment splitting there. CPU (tests, virtual-device
        # meshes) keeps the all-on-device mesh variant.
        self.in_scan_densify = bool(opt.get(
            "in_scan_densify",
            mesh is not None and jax.default_backend() != "tpu",
        ))
        self.overflow = None  # device value of the last step/segment
        # Densify candidates dropped for lack of free capacity slots (the
        # reference grows unboundedly); nonzero triggers capacity growth.
        self.densify_dropped = None

        load = opt.get("load", None)
        if load:
            self.params, self.aux, self.sh_degree = load_ply(load, capacity)
            self.spatial_lr_scale = 1.0
        else:
            self.key, k = jax.random.split(self.key)
            self.params, self.aux = init_random(
                k, num_pts=opt.get("num_pts", 5000), capacity=capacity,
                radius=0.5, sh_degree=opt.get("sh_degree", 0),
            )
            self.sh_degree = opt.get("sh_degree", 0)
            self.spatial_lr_scale = 10.0
        self.adam = adam_init(self.params)

        self.ref_size = opt.get("ref_size", 256)
        self.ref_rgb = (
            jnp.asarray(ref_rgb, jnp.float32) if ref_rgb is not None else None
        )
        self.ref_mask = (
            jnp.asarray(ref_mask, jnp.float32) if ref_mask is not None else None
        )
        self.use_known_view = ref_rgb is not None and not opt.get("imagedream", False)

        fovy = np.radians(opt.get("fovy", 49.1))
        self.fovy = fovy
        self.fovx = fovy  # square renders; reference uses fovx=fovy here
        self.radius = opt.get("radius", 2.0)
        self.elevation = opt.get("elevation", 0.0)
        pose = orbit_camera(self.elevation, 0.0, self.radius)
        self.fixed_cam = Camera.from_pose(
            pose, self.ref_size, self.ref_size, fovy, fovy
        )

        self.n_views = 4 if (opt.get("mvdream", False) or opt.get("imagedream", False)) else 1
        self.batch_size = opt.get("batch_size", 1)

        self.mesh = mesh
        self.tile_axis = None
        self.data_size = 1
        if mesh is not None:
            axes = dict(zip(mesh.axis_names, mesh.devices.shape))
            assert "data" in axes, "trainer mesh needs a 'data' axis"
            self.data_size = axes["data"]
            self.tile_axis = "tile" if axes.get("tile", 1) > 1 else None
            total_views = self.batch_size * self.n_views
            assert total_views % self.data_size == 0, (
                f"{total_views} views cannot shard over data={self.data_size}"
            )
            assert (total_views // self.data_size) % self.n_views == 0, (
                "multi-view groups must stay on one device "
                f"(views/device={total_views // self.data_size}, "
                f"group={self.n_views})"
            )

        self.lr_schedules = {
            "total_iters": float(opt.get("iters", 500)),
            "xyz": expon_lr(
                opt.get("position_lr_init", 1e-3) * self.spatial_lr_scale,
                opt.get("position_lr_final", 2e-5) * self.spatial_lr_scale,
                lr_delay_mult=opt.get("position_lr_delay_mult", 0.02),
                max_steps=opt.get("position_lr_max_steps", 500),
            ),
            "f_dc": opt.get("feature_lr", 0.01),
            "f_rest": opt.get("feature_lr", 0.01) / 20.0,
            "opacity": opt.get("opacity_lr", 0.05),
            "scaling": opt.get("scaling_lr", 5e-3),
            "rotation": opt.get("rotation_lr", 5e-3),
        }

        self._step_fns: dict[int, Callable] = {}
        self._densify_pure = functools.partial(
            densify_and_prune,
            grad_threshold=opt.get("densify_grad_threshold", 0.01),
            min_opacity=0.01,
            extent=4.0,
            percent_dense=opt.get("percent_dense", 0.01),
        )
        self._densify = jax.jit(self._densify_pure)
        self._reset_opacity = jax.jit(reset_opacity)
        self._prune_final = jax.jit(
            functools.partial(
                prune_only, min_opacity=0.01, extent=1.0, max_screen_size=1.0
            )
        )

    # -- camera sampling (host-side numpy, mirroring the reference RNG use) --

    def _sample_novel_cameras(self, size: int):
        opt = self.opt
        min_ver = max(
            min(opt.get("min_ver", -30), opt.get("min_ver", -30) - self.elevation),
            -80 - self.elevation,
        )
        max_ver = min(
            max(opt.get("max_ver", 30), opt.get("max_ver", 30) - self.elevation),
            80 - self.elevation,
        )
        cams, vers, hors, poses = [], [], [], []
        for _ in range(self.batch_size):
            ver = int(self.rng.integers(min_ver, max_ver))
            hor = int(self.rng.integers(-180, 180))
            vers.append(ver)
            hors.append(hor)
            pose = orbit_camera(self.elevation + ver, hor, self.radius)
            poses.append(pose)
            cams.append(Camera.from_pose(pose, size, size, self.fovy, self.fovx))
            if self.n_views == 4:
                for i in range(1, 4):
                    pose_i = orbit_camera(
                        self.elevation + ver, hor + 90 * i, self.radius
                    )
                    poses.append(pose_i)
                    cams.append(
                        Camera.from_pose(pose_i, size, size, self.fovy, self.fovx)
                    )
        return (cams, np.array(vers, np.float32), np.array(hors, np.float32),
                np.stack(poses).astype(np.float32))

    def _get_step_fn(self, size: int):
        if size not in self._step_fns:
            self._step_fns[size] = make_train_step(
                novel_size=size,
                n_novel=self.batch_size * self.n_views,
                ref_size=self.ref_size,
                sh_degree=self.sh_degree,
                use_known_view=self.use_known_view,
                warmup_rgb_loss=self.opt.get("warmup_rgb_loss", True),
                lr_schedules=self.lr_schedules,
                guidance_fns=self.guidance_fns,
                max_tiles=self.max_tiles,
            )
        return self._step_fns[size]

    def _check_overflow(self) -> None:
        """Detect binning truncation and escalate ``max_tiles``.

        Called at host-sync points (log boundaries). Escalation clears
        the compiled-step cache — one retrace at the new capacity; the
        steps already taken at the old capacity rendered slightly wrong
        for the overflowing gaussians (the reference CUDA binning is
        unbounded, so this is our only approximation), which the log
        makes visible.
        """
        if self.overflow is not None:
            ov = int(np.max(np.asarray(self.overflow)))
            if ov > 0:
                # Scale the response to the shortfall: every max_tiles
                # increment costs the whole run (the dup_map scatter and
                # backward reduce are slot-count-bound), and a 3-duplicate
                # overflow used to DOUBLE the budget (bench r5: +2 ms/iter
                # at the 512 rung for the rest of training). Small
                # overflows get +50% (the per-gaussian shortfall is
                # bounded by the big-class budget's shape); big ones
                # still double.
                if ov >= self.capacity // 16:
                    new = self.max_tiles * 2
                else:
                    new = max(self.max_tiles + 4, self.max_tiles * 3 // 2)
                new = min(new, 256)
                print(
                    f"[stage1] WARNING: binning overflow ({ov} duplicates "
                    f"dropped); escalating max_tiles {self.max_tiles} -> {new}"
                )
                self.max_tiles = new
                self._step_fns.clear()
            self.overflow = None
        if self.densify_dropped is not None:
            dropped = int(np.max(np.asarray(self.densify_dropped)))
            if dropped > 0:
                self._grow_capacity(self.capacity * 2, dropped)
            self.densify_dropped = None

    def _grow_capacity(self, new_capacity: int, dropped: int) -> None:
        """Double the padded-slot capacity after densify ran out of free
        slots (the reference's arrays grow unboundedly,
        /root/reference/gs_renderer.py:581-595; ours are fixed-capacity,
        so growth is an explicit repad + one retrace per growth, exactly
        like the binning ``max_tiles`` escalation). The ``dropped``
        candidates themselves are lost — growth prevents the NEXT pass
        from truncating, never silently stalling densification."""
        from ..scene.optim import AdamState

        old = self.capacity
        print(
            f"[stage1] WARNING: densify dropped {dropped} candidates at "
            f"capacity {old}; growing capacity {old} -> {new_capacity}"
        )
        pad = new_capacity - old

        def pad_rows(v, fill=0.0):
            return jnp.concatenate(
                [v, jnp.full((pad,) + v.shape[1:], fill, v.dtype)]
            )

        fills = {"scaling": -10.0}
        self.params = {
            k: pad_rows(v, fills.get(k, 0.0)) for k, v in self.params.items()
        }
        # Dead rotation rows get the identity quat (normalize_quat(0) in
        # the densify candidate math would produce NaNs otherwise).
        self.params["rotation"] = self.params["rotation"].at[old:, 0].set(1.0)
        self.adam = AdamState(
            mu={k: pad_rows(v) for k, v in self.adam.mu.items()},
            nu={k: pad_rows(v) for k, v in self.adam.nu.items()},
            count=self.adam.count,
        )
        self.aux = self.aux._replace(
            alive=jnp.concatenate(
                [self.aux.alive, jnp.zeros((pad,), bool)]
            ),
            max_radii2d=pad_rows(self.aux.max_radii2d),
            grad_accum=pad_rows(self.aux.grad_accum),
            denom=pad_rows(self.aux.denom),
        )
        self.capacity = new_capacity
        self._step_fns.clear()

    def train_step(self) -> float:
        opt = self.opt
        if self.mesh is not None:
            # With a mesh every path goes through the shard_map'd scan
            # (k=1 degenerates to one sharded step; densify/reset flags
            # fire inside it on the same schedule).
            return self.train_segment(1, opt.get("iters", 500))[-1]
        self.step += 1
        step_ratio = min(1.0, self.step / opt.get("iters", 500))
        # Resolution ladder (/root/reference/main.py:211); configurable so
        # tests can run tiny. Must be 16-aligned for the tile rasterizer.
        ladder = opt.get("novel_resolutions", [128, 256, 512])
        size = ladder[0] if step_ratio < 0.3 else (
            ladder[1] if step_ratio < 0.6 else ladder[2]
        )

        cams, vers, hors, poses = self._sample_novel_cameras(size)
        novel = {k: jnp.asarray(v) for k, v in stack_cameras(cams).items()}
        known = {k: jnp.asarray(v) for k, v in self.fixed_cam.arrays().items()}
        bg = jnp.asarray(
            [1.0, 1.0, 1.0]
            if self.rng.random() > opt.get("invert_bg_prob", 0.5)
            else [0.0, 0.0, 0.0],
            jnp.float32,
        )
        self.key, k_step = jax.random.split(self.key)

        cond = dict(self.cond)
        cond["vers"] = jnp.asarray(vers)
        cond["hors"] = jnp.asarray(hors)
        cond["radii"] = jnp.zeros_like(jnp.asarray(vers))
        cond["poses"] = jnp.asarray(poses)

        ref_rgb = (
            self.ref_rgb if self.ref_rgb is not None
            else jnp.zeros((self.ref_size, self.ref_size, 3))
        )
        ref_mask = (
            self.ref_mask if self.ref_mask is not None
            else jnp.zeros((self.ref_size, self.ref_size))
        )

        in_window = (
            opt.get("density_start_iter", 100)
            <= self.step
            <= opt.get("density_end_iter", 3000)
        )
        step_fn = self._get_step_fn(size)
        self.params, self.adam, self.aux, metrics = step_fn(
            self.params, self.adam, self.aux, jnp.float32(self.step),
            known, novel, bg, ref_rgb, ref_mask, k_step, cond,
            jnp.asarray(in_window), self.gparams,
        )
        loss = metrics["loss"]
        self.overflow = metrics["overflow"]

        if in_window:
            if self.step % opt.get("densification_interval", 100) == 0:
                self.key, k_d = jax.random.split(self.key)
                self.params, self.adam, self.aux, dropped = self._densify(
                    self.params, self.adam, self.aux, k_d
                )
                self._note_dropped(dropped)
            if self.step % opt.get("opacity_reset_interval", 700) == 0:
                self.params, self.adam = self._reset_opacity(
                    self.params, self.adam
                )
        # Return the DEVICE value: a float() here would force a host sync
        # (a full RPC round-trip on tunneled TPUs) every step. Callers
        # convert only when they actually want to look at it.
        return loss

    # -- fused multi-step path ------------------------------------------

    def _get_scan_fn(self, size: int, k: int):
        key = ("scan", size, k, self.in_scan_densify)
        if key not in self._step_fns:
            from ..utils.aotcache import AotCached
            from .stage1 import make_train_scan

            if self.mesh is not None:
                from ..parallel.dp import make_dp_train_scan

                in_scan = self.in_scan_densify
                self._step_fns[key] = make_dp_train_scan(
                    self.mesh,
                    novel_size=size,
                    ref_size=self.ref_size,
                    sh_degree=self.sh_degree,
                    views_per_device=(
                        self.batch_size * self.n_views // self.data_size
                    ),
                    use_known_view=self.use_known_view,
                    warmup_rgb_loss=self.opt.get("warmup_rgb_loss", True),
                    lr_schedules=self.lr_schedules,
                    densify_fn=self._densify_pure if in_scan else None,
                    reset_fn=reset_opacity if in_scan else None,
                    guidance_fns=self.guidance_fns,
                    max_tiles=self.max_tiles,
                    tile_axis=self.tile_axis,
                )
                return self._step_fns[key]

            in_scan = self.in_scan_densify
            self._step_fns[key] = AotCached(make_train_scan(
                novel_size=size,
                n_novel=self.batch_size * self.n_views,
                ref_size=self.ref_size,
                sh_degree=self.sh_degree,
                use_known_view=self.use_known_view,
                warmup_rgb_loss=self.opt.get("warmup_rgb_loss", True),
                lr_schedules=self.lr_schedules,
                densify_fn=self._densify_pure if in_scan else None,
                reset_fn=reset_opacity if in_scan else None,
                guidance_fns=self.guidance_fns,
                max_tiles=self.max_tiles,
            ), tag=f"s1scan_{size}_{k}_mt{self.max_tiles}"
                   + ("" if in_scan else "_hostd"),
               verbose=True)
        return self._step_fns[key]

    def _novel_size_for(self, step: int, iters: int) -> int:
        ratio = min(1.0, step / iters)
        ladder = self.opt.get("novel_resolutions", [128, 256, 512])
        return ladder[0] if ratio < 0.3 else (
            ladder[1] if ratio < 0.6 else ladder[2]
        )

    def _flag_step(self, s: int) -> tuple[bool, bool]:
        """(densify_fires, reset_fires) after step ``s``."""
        opt = self.opt
        in_win = (
            opt.get("density_start_iter", 100)
            <= s
            <= opt.get("density_end_iter", 3000)
        )
        do_d = in_win and s % opt.get("densification_interval", 100) == 0
        do_r = in_win and s % opt.get("opacity_reset_interval", 700) == 0
        return do_d, do_r

    def train_segment(self, k: int, iters: int):
        """Run k steps (uniform novel resolution) as fused scan dispatches.

        Default mode (single-device AND mesh-on-TPU) splits the segment
        at densify/opacity-reset steps and applies those BETWEEN scans
        (host-side): the in-scan ``lax.cond`` variant deterministically
        faults the TPU backend at scale (see make_train_scan). Flag
        steps land on interval multiples, so default configs still run
        one dispatch per segment. ``in_scan_densify=True`` (opt key, the
        default for meshes on non-TPU backends) keeps the all-on-device
        scan.
        """
        if self.in_scan_densify:
            return self._scan_segment(k, iters)
        end = self.step + k
        losses = []
        while self.step < end:
            nxt = self.step + 1
            while nxt < end and not any(self._flag_step(nxt)):
                nxt += 1
            losses.append(jnp.atleast_1d(
                self._scan_segment(nxt - self.step, iters)
            ))
            do_d, do_r = self._flag_step(self.step)
            if do_d:
                self.key, k_d = jax.random.split(self.key)
                self.params, self.adam, self.aux, dropped = self._densify(
                    self.params, self.adam, self.aux, k_d
                )
                self._note_dropped(dropped)
            if do_r:
                self.params, self.adam = self._reset_opacity(
                    self.params, self.adam
                )
        return jnp.concatenate(losses)

    def _note_dropped(self, dropped) -> None:
        """Fold a densify drop count into the pending metric (device
        values; max avoids a host sync until _check_overflow)."""
        if self.densify_dropped is None:
            self.densify_dropped = dropped
        else:
            self.densify_dropped = jnp.maximum(
                jnp.max(jnp.asarray(self.densify_dropped)),
                jnp.max(jnp.asarray(dropped)),
            )

    def _scan_segment(self, k: int, iters: int):
        """k steps as ONE scan dispatch (flags traced when in-scan)."""
        opt = self.opt
        size = self._novel_size_for(self.step + 1, iters)
        steps = np.arange(self.step + 1, self.step + k + 1)

        cams_seq = []
        conds = {"vers": [], "hors": [], "radii": [], "poses": []}
        bgs = []
        for _ in range(k):
            cams, vers, hors, poses = self._sample_novel_cameras(size)
            cams_seq.append(stack_cameras(cams))
            conds["vers"].append(vers)
            conds["hors"].append(hors)
            conds["radii"].append(np.zeros_like(vers))
            conds["poses"].append(poses)
            bgs.append(
                [1.0, 1.0, 1.0]
                if self.rng.random() > opt.get("invert_bg_prob", 0.5)
                else [0.0, 0.0, 0.0]
            )
        novel_seq = {
            kk: jnp.asarray(np.stack([c[kk] for c in cams_seq]))
            for kk in cams_seq[0]
        }
        # Every cond leaf must carry the scan axis; static entries (e.g.
        # user-supplied embeddings) broadcast across the K steps.
        static_seq = {
            kk: jnp.broadcast_to(
                jnp.asarray(v)[None], (k,) + jnp.asarray(v).shape
            )
            for kk, v in self.cond.items()
        }
        views_seq = {kk: jnp.asarray(np.stack(v)) for kk, v in conds.items()}
        conds_seq = {**static_seq, **views_seq}
        self.key, sub = jax.random.split(self.key)
        keys = jax.random.split(sub, k)
        self.key, sub = jax.random.split(self.key)
        dkeys = jax.random.split(sub, k)

        start = opt.get("density_start_iter", 100)
        end = opt.get("density_end_iter", 3000)
        interval = opt.get("densification_interval", 100)
        reset_iv = opt.get("opacity_reset_interval", 700)
        in_window = (steps >= start) & (steps <= end)
        densify_flags = in_window & (steps % interval == 0)
        reset_flags = in_window & (steps % reset_iv == 0)

        known = {k2: jnp.asarray(v) for k2, v in self.fixed_cam.arrays().items()}
        ref_rgb = (
            self.ref_rgb if self.ref_rgb is not None
            else jnp.zeros((self.ref_size, self.ref_size, 3))
        )
        ref_mask = (
            self.ref_mask if self.ref_mask is not None
            else jnp.zeros((self.ref_size, self.ref_size))
        )
        scan_fn = self._get_scan_fn(size, k)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(self.mesh, P(None, "data"))
            novel_seq = {
                kk: jax.device_put(v, shard) for kk, v in novel_seq.items()
            }
            views_seq = {
                kk: jax.device_put(v, shard) for kk, v in views_seq.items()
            }
            self.params, self.adam, self.aux, metrics = scan_fn(
                self.params, self.adam, self.aux, known, ref_rgb, ref_mask,
                jnp.asarray(steps, jnp.float32), novel_seq,
                jnp.asarray(bgs, jnp.float32), keys, static_seq, views_seq,
                jnp.asarray(in_window), jnp.asarray(densify_flags),
                jnp.asarray(reset_flags), dkeys, self.gparams,
            )
        else:
            self.params, self.adam, self.aux, metrics = scan_fn(
                self.params, self.adam, self.aux, known, ref_rgb, ref_mask,
                jnp.asarray(steps, jnp.float32),
                novel_seq, jnp.asarray(bgs, jnp.float32), keys, conds_seq,
                jnp.asarray(in_window), jnp.asarray(densify_flags),
                jnp.asarray(reset_flags), dkeys, self.gparams,
            )
        self.step += k
        self.overflow = metrics["overflow"]
        if "densify_dropped" in metrics:
            self._note_dropped(metrics["densify_dropped"])
        return metrics["loss"]

    def train(self, iters: int | None = None, log_every: int = 100,
              checkpoint_every: int = 0, checkpoint_dir: str | None = None,
              scan_chunk: int = 50, profile_dir: str | None = None) -> dict:
        """Run the training loop.

        ``profile_dir`` (or opt key ``profile_dir``): capture ONE
        steady-state segment as a jax.profiler trace (op-level timing of
        bin/sort/composite/guidance inside the fused step — SURVEY §5
        tracing row). View with xprof/tensorboard or perfetto.
        """
        iters = iters if iters is not None else self.opt.get("iters", 500)
        profile_dir = profile_dir or self.opt.get("profile_dir", None)
        profiled = False
        t0 = time.perf_counter()
        loss = float("nan")
        total = self.step + iters
        if scan_chunk and scan_chunk > 1:
            while self.step < total:
                size_now = self._novel_size_for(self.step + 1, total)
                k = 1
                while (
                    k < scan_chunk
                    and self.step + k < total
                    and self._novel_size_for(self.step + k + 1, total)
                    == size_now
                    and not (checkpoint_every
                             and (self.step + k) % checkpoint_every == 0)
                ):
                    k += 1
                # Profile the SECOND segment (first pays compiles).
                do_profile = (
                    profile_dir is not None and not profiled
                    and self.step > 0
                )
                if do_profile:
                    jax.profiler.start_trace(profile_dir)
                t_seg = time.perf_counter()
                losses = self.train_segment(k, total)
                loss = losses[-1]
                self._check_overflow()  # also syncs the segment
                seg_dt = time.perf_counter() - t_seg
                if do_profile:
                    jax.profiler.stop_trace()
                    profiled = True
                    print(f"[stage1] profiler trace -> {profile_dir}")
                if log_every:
                    n_views = self.batch_size * self.n_views
                    rays = size_now * size_now * n_views * k / seg_dt
                    print(
                        f"[stage1] step {self.step} loss {float(loss):.4f} "
                        f"alive {int(num_alive(self.aux))} "
                        f"{seg_dt / k * 1e3:.1f} ms/iter "
                        f"{rays / 1e6:.1f} Mrays/s"
                    )
                if (checkpoint_every and checkpoint_dir
                        and self.step % checkpoint_every == 0):
                    self.save_checkpoint(checkpoint_dir)
            if self.opt.get("final_prune", True):
                self.params, self.adam, self.aux = self._prune_final(
                    self.params, self.adam, self.aux
                )
            loss = float(loss)
            wall = time.perf_counter() - t0
            return {"loss": loss, "wall_s": wall,
                    "alive": int(num_alive(self.aux))}
        for _ in range(iters):
            loss = self.train_step()
            if log_every and self.step % log_every == 0:
                print(
                    f"[stage1] step {self.step} loss {float(loss):.4f} "
                    f"alive {int(num_alive(self.aux))}"
                )
                self._check_overflow()
            if (checkpoint_every and checkpoint_dir
                    and self.step % checkpoint_every == 0):
                self.save_checkpoint(checkpoint_dir)
        # Final prune (reference main.py train() tail). final_prune=False
        # skips it: short runs (few steps at low resolution) can lose
        # EVERY gaussian to the reference-faithful live-stats prune
        # before any signal accumulates.
        if self.opt.get("final_prune", True):
            self.params, self.adam, self.aux = self._prune_final(
                self.params, self.adam, self.aux
            )
        loss = float(loss)  # final sync
        wall = time.perf_counter() - t0
        return {"loss": loss, "wall_s": wall, "alive": int(num_alive(self.aux))}

    def save_checkpoint(self, path: str) -> None:
        from ..utils.checkpoint import save_stage1

        save_stage1(path, self)

    def load_checkpoint(self, path: str) -> None:
        from ..utils.checkpoint import restore_stage1

        restore_stage1(path, self)

    def render_view(self, cam: Camera, bg=None, size: int | None = None):
        """No-grad render of one camera (test_step analogue)."""
        arrays = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
        bg = jnp.ones(3) if bg is None else jnp.asarray(bg, jnp.float32)
        fn = get_cached_render(
            cam.width, cam.height, self.sh_degree, self.capacity
        )
        return fn(self.params, arrays, bg, self.aux.alive)

    def save_ply(self, path: str) -> int:
        return save_ply(path, self.params, self.aux)


_RENDER_CACHE: dict = {}


def get_cached_render(width: int, height: int, sh_degree: int, capacity: int):
    """Shared jitted+AOT-cached no-grad render (viewer / render CLI /
    texture bake all hit this; the first call per shape loads from the
    executable cache instead of paying a remote compile)."""
    key = (width, height, sh_degree, capacity)
    if key not in _RENDER_CACHE:
        from ..utils.aotcache import AotCached

        @jax.jit
        def fn(params, cam_arrays, bg, alive):
            return _render_one(
                params, cam_arrays, bg, width, height, sh_degree, alive
            )

        _RENDER_CACHE[key] = AotCached(
            fn, tag=f"render_{width}x{height}_d{sh_degree}_c{capacity}"
        )
    return _RENDER_CACHE[key]
