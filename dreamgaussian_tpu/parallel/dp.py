"""Data-parallel stage-1 training over a ``jax.sharding.Mesh``.

The reference trains on exactly one GPU (no distributed code exists
anywhere in it — /root/reference/scripts/run.sh:1 pins a single device).
This module is the TPU-native scaling layer mandated by the design
(SURVEY.md §2.3): SDS **views** are sharded along a ``data`` mesh axis —
each chip renders its own novel-view cameras and evaluates the guidance
loss for them — and the Gaussian-parameter gradients are combined with a
single ``psum`` over ICI. Parameters, Adam moments, and the density
controller are replicated: every device computes identical updates, so no
parameter gather is ever needed and densify decisions stay deterministic
across the mesh (the psum'd densification stats are identical everywhere).

Division of labor vs the reference semantics:

- known-view loss: computed on every device, divided by the device count,
  so the psum reproduces the single-device gradient exactly;
- densification stats: from the GLOBALLY-LAST novel view only — the
  mean2d gradient tap and the radii are masked to view
  ``views_per_device-1`` of the last ``data``-axis device, exactly
  reproducing the reference's last-view quirk
  (/root/reference/main.py:279-281 reads the grad of the LAST render's
  screenspace points; gs_renderer.py:625-627) and the single-device
  trainer (train/stage1.py taps only ``b == n_novel-1``). An
  all-views psum variant ("strictly more signal") was used through r4,
  but it made DP densify decisions diverge from single-device ones, so
  the bitwise DP==single-device parity test had to disable densify
  (VERDICT r4 next-#6); matching the quirk keeps the mesh trainers
  bit-identical to the reference-faithful path with density control
  active.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.rasterize import render_gaussians
from ..scene import accumulate_stats, adam_update


def make_data_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("data",))


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


def _make_step_body(
    mesh: Mesh,
    *,
    novel_size: int,
    ref_size: int,
    sh_degree: int,
    views_per_device: int,
    use_known_view: bool,
    warmup_rgb_loss: bool,
    lr_schedules: dict,
    guidance_fns: tuple = (),
    max_tiles: int = 12,
    chunk: int = 128,
    tile_axis: str | None = None,
) -> Callable:
    """Per-device SPMD body of one train iteration (called INSIDE
    shard_map): local render+loss -> psum(grads/loss/stats) over 'data'
    -> replicated Adam update + gated stat accumulation. Shared by
    make_dp_train_step (one dispatch per step) and make_dp_train_scan
    (K steps fused into one lax.scan dispatch)."""
    n_dev = dict(zip(mesh.axis_names, mesh.devices.shape))["data"]

    if tile_axis is not None:
        from .tile_shard import render_gaussians_tile_sharded

        def render_one(params, cam, bg, w, h, deg, alive, tap=None):
            act_scale = jnp.exp(params["scaling"])
            act_op = jax.nn.sigmoid(params["opacity"][:, 0])
            shs = jnp.concatenate([params["f_dc"], params["f_rest"]], axis=1)
            return render_gaussians_tile_sharded(
                params["xyz"], act_scale, params["rotation"], act_op, shs,
                cam["view"], cam["full_proj"], cam["campos"], cam["tanfov"],
                w, h, bg, sh_degree=deg, alive=alive, mean2d_tap=tap,
                axis_name=tile_axis, max_tiles=max_tiles, chunk=chunk,
            )
    else:
        def render_one(params, cam, bg, w, h, deg, alive, tap=None):
            return _render_one(
                params, cam, bg, w, h, deg, alive, tap=tap,
                max_tiles=max_tiles, chunk=chunk,
            )

    def local_loss_fn(params, tap, step, known_cams, novel_cams, bg,
                      ref_rgb, ref_mask, key, cond, alive, gparams=()):
        step_ratio = jnp.minimum(1.0, step / lr_schedules["total_iters"])
        w = step_ratio if warmup_rgb_loss else 1.0
        loss = 0.0
        if use_known_view:
            out = render_one(
                params, known_cams, jnp.ones(3), ref_size, ref_size,
                sh_degree, alive,
            )
            known = (
                10000.0 * w * jnp.mean((out.image - ref_rgb) ** 2)
                + 1000.0 * w * jnp.mean((out.alpha - ref_mask) ** 2)
            )
            loss += known / n_dev
        # Densify stats come from the GLOBALLY-LAST view only (the
        # reference's last-view quirk — module docstring): the tap is
        # zero-masked off every device but the last, and only the last
        # local view renders with it; radii likewise.
        last_dev = (
            jax.lax.axis_index("data") == n_dev - 1
        )
        images = []
        radii_last = jnp.zeros((params["xyz"].shape[0],), jnp.int32)
        overflow = jnp.int32(0)
        for b in range(views_per_device):
            cam_b = {k: v[b] for k, v in novel_cams.items()}
            is_g_last = b == views_per_device - 1
            t = (tap * last_dev.astype(tap.dtype)) if is_g_last else None
            out = render_one(
                params, cam_b, bg, novel_size, novel_size, sh_degree, alive,
                tap=t,
            )
            images.append(out.image)
            if is_g_last:
                radii_last = jnp.where(last_dev, out.radii, 0)
            overflow = overflow + out.overflow
        images = jnp.stack(images)
        # Guidance contract: fn returns the MEAN loss over the views given.
        # psum of per-device means / n_dev == the global mean a single
        # device would compute over all views. 3-tuple entries use the
        # param-passing contract (params replicated over the mesh; see
        # guidance/sds.py Backbone).
        for i, entry in enumerate(guidance_fns):
            if len(entry) > 2:
                g = entry[1](images, cond, step_ratio, key, gparams[i])
            else:
                g = entry[1](images, cond, step_ratio, key)
            loss += entry[0] * g / n_dev
        return loss, (radii_last, overflow)

    def step_body(params, adam, aux, step, known_cams, novel_cams, bg,
                  ref_rgb, ref_mask, key, cond, accum, gparams):
        tap = jnp.zeros((params["xyz"].shape[0], 2), jnp.float32)
        grad_fn = jax.value_and_grad(local_loss_fn, argnums=(0, 1), has_aux=True)
        (loss, (radii, overflow)), (grads, tap_grad) = grad_fn(
            params, tap, step, known_cams, novel_cams, bg, ref_rgb, ref_mask,
            key, cond, aux.alive, gparams,
        )
        # One collective for everything: grads, loss, densify stats.
        grads = {k: jnp.nan_to_num(v) for k, v in grads.items()}
        grads = jax.lax.psum(grads, "data")
        loss = jax.lax.psum(loss, "data")
        overflow = jax.lax.psum(overflow, "data")
        tap_grad = jax.lax.psum(jnp.nan_to_num(tap_grad), "data")
        radii = jax.lax.pmax(radii, "data")

        lrs = {
            "xyz": lr_schedules["xyz"](step),
            "f_dc": lr_schedules["f_dc"],
            "f_rest": lr_schedules["f_rest"],
            "opacity": lr_schedules["opacity"],
            "scaling": lr_schedules["scaling"],
            "rotation": lr_schedules["rotation"],
        }
        params, adam = adam_update(params, grads, adam, lrs)
        new_aux = accumulate_stats(aux, tap_grad * (novel_size / 2.0), radii)
        aux = jax.tree.map(lambda a, b: jnp.where(accum, b, a), aux, new_aux)
        return params, adam, aux, {"loss": loss, "overflow": overflow}

    return step_body


def make_dp_train_step(
    mesh: Mesh,
    *,
    novel_size: int,
    ref_size: int,
    sh_degree: int,
    views_per_device: int,
    use_known_view: bool,
    warmup_rgb_loss: bool,
    lr_schedules: dict,
    guidance_fns: tuple = (),
    max_tiles: int = 12,
    chunk: int = 128,
    tile_axis: str | None = None,
) -> Callable:
    """Jitted multi-chip train step.

    Expects novel cameras stacked as [data_size * views_per_device, ...]
    (sharded over 'data'); params/adam/aux replicated. With ``tile_axis``
    set (2D data x tile mesh), each render additionally shards its tile
    grid over that axis — DP x SP composition. Returns (params, adam,
    aux, {loss, overflow}) with identical replicated values (overflow =
    psum of dropped binning duplicates across all views; see binning.py).
    """
    step_body = _make_step_body(
        mesh, novel_size=novel_size, ref_size=ref_size, sh_degree=sh_degree,
        views_per_device=views_per_device, use_known_view=use_known_view,
        warmup_rgb_loss=warmup_rgb_loss, lr_schedules=lr_schedules,
        guidance_fns=guidance_fns, max_tiles=max_tiles, chunk=chunk,
        tile_axis=tile_axis,
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P("data"), P(), P(), P(), P(),
                  P("data"), P(), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def sharded_step(params, adam, aux, step, known_cams, novel_cams, bg,
                     ref_rgb, ref_mask, key, cond_views, cond_static,
                     gparams):
        cond = {**cond_static, **cond_views}
        return step_body(params, adam, aux, step, known_cams, novel_cams,
                         bg, ref_rgb, ref_mask, key, cond,
                         jnp.asarray(True), gparams)

    jitted = jax.jit(sharded_step)

    def step(params, adam, aux, step_, known_cams, novel_cams, bg,
             ref_rgb, ref_mask, key, cond, gparams=(), cond_views=None):
        """``cond`` entries are replicated; per-view conditioning whose
        leading axis matches the sharded view axis goes in ``cond_views``
        (each device's guidance sees only its views' entries)."""
        if not gparams:
            gparams = tuple(
                e[2] if len(e) > 2 else () for e in guidance_fns
            )
        return jitted(params, adam, aux, step_, known_cams, novel_cams,
                      bg, ref_rgb, ref_mask, key, cond_views or {}, cond,
                      gparams)

    return step


def make_dp_train_scan(
    mesh: Mesh,
    *,
    novel_size: int,
    ref_size: int,
    sh_degree: int,
    views_per_device: int,
    use_known_view: bool,
    warmup_rgb_loss: bool,
    lr_schedules: dict,
    densify_fn,
    reset_fn,
    guidance_fns: tuple = (),
    max_tiles: int = 12,
    chunk: int = 128,
    tile_axis: str | None = None,
) -> Callable:
    """Fused multi-chip trainer: K steps as ONE sharded ``lax.scan``
    dispatch — the DP/SP counterpart of train.stage1.make_train_scan.

    Per-step host dispatch is the dominant cost on tunneled/remote TPUs
    (PROGRESS.md: 0.52 s/iter unfused vs 20 ms fused); this runs the
    whole K-step segment, including in-scan densify/prune and opacity
    reset via ``lax.cond``, inside one shard_map'd scan. Densify/reset
    consume only replicated values (psum'd stats + a shared key), so all
    devices take identical branches and params stay replicated.

    Call signature (all leading-K axes are scan steps):
      scan_fn(params, adam, aux, known_cams, ref_rgb, ref_mask,
              steps [K], novel_cams_seq {[K, V, ...]} (V sharded on
              'data'), bgs [K,3], keys [K], cond_static {[K, ...]},
              cond_views {[K, V, ...]} (sharded), accums [K],
              densify_flags [K], reset_flags [K], densify_keys [K],
              gparams) -> (params, adam, aux, metrics {[K]})
    """
    step_body = _make_step_body(
        mesh, novel_size=novel_size, ref_size=ref_size, sh_degree=sh_degree,
        views_per_device=views_per_device, use_known_view=use_known_view,
        warmup_rgb_loss=warmup_rgb_loss, lr_schedules=lr_schedules,
        guidance_fns=guidance_fns, max_tiles=max_tiles, chunk=chunk,
        tile_axis=tile_axis,
    )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(),      # state + known refs
                  P(), P(None, "data"), P(), P(),    # steps, novel, bgs, keys
                  P(), P(None, "data"),              # cond_static, cond_views
                  P(), P(), P(), P(), P()),          # flags, dkeys, gparams
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def sharded_scan(params, adam, aux, known_cams, ref_rgb, ref_mask,
                     steps, novel_cams_seq, bgs, keys, cond_static,
                     cond_views, accums, densify_flags, reset_flags,
                     densify_keys, gparams):
        def body(carry, xs):
            params, adam, aux = carry
            (step, ncams, bg, key, cs, cv, accum, do_d, do_r, dkey) = xs
            cond = {**cs, **cv}
            params, adam, aux, metrics = step_body(
                params, adam, aux, step, known_cams, ncams, bg,
                ref_rgb, ref_mask, key, cond, accum, gparams,
            )
            # densify_fn=None omits the in-scan conds (same contract as
            # make_train_scan): on the real TPU backend the cond
            # branches + real-size guidance in one scan body fault the
            # device (bisect note at train/stage1.py make_train_scan),
            # so Stage1Trainer splits mesh segments host-side on TPU and
            # only CPU tests keep the all-on-device variant.
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
            if reset_fn is not None:
                params, adam = jax.lax.cond(
                    do_r,
                    lambda t: reset_fn(t[0], t[1]),
                    lambda t: t,
                    (params, adam),
                )
            return (params, adam, aux), metrics

        xs = (steps, novel_cams_seq, bgs, keys, cond_static, cond_views,
              accums, densify_flags, reset_flags, densify_keys)
        (params, adam, aux), metrics = jax.lax.scan(
            body, (params, adam, aux), xs
        )
        return params, adam, aux, metrics

    return jax.jit(sharded_scan)


def shard_cameras(mesh: Mesh, cams: dict) -> dict:
    """Device-put stacked camera arrays with the leading axis on 'data'."""
    sharding = NamedSharding(mesh, P("data"))
    return {k: jax.device_put(jnp.asarray(v), sharding) for k, v in cams.items()}
