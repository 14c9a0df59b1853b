"""Stage-1 CLI: image/text -> 3D gaussians (+ mesh export).

Equivalent of the reference ``python main.py --config configs/image.yaml
input=... save_path=...`` (/root/reference/main.py:901-917). Accepts the
same YAML keys and dotlist overrides.

Guidance selection mirrors the reference (main.py:122-160): zero123 when
an input image is given (lambda_zero123 > 0), SD/MVDream for text prompts
(lambda_sd > 0). Real pretrained backbones load from ``sd_ckpt`` /
``zero123_ckpt`` directories (torch checkpoints converted on the fly);
with no checkpoint available, ``fake_guidance=True`` runs the full
pipeline with a tiny random denoiser (exercises every code path; no
semantic prior), and the default is RGB-only optimization.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_guidances(opt, ref_rgb):
    """Returns (guidance_fns tuple for the trainer, refine_fns for export)."""
    guidance_fns = []
    lam_sd = opt.get("lambda_sd", 0)
    lam_123 = opt.get("lambda_zero123", 0)
    prompt = opt.get("prompt", "")
    use_fake = opt.get("fake_guidance", False)

    if lam_123 > 0 and ref_rgb is not None:
        ckpt = opt.get("zero123_ckpt", None)
        if ckpt:
            from ..guidance.loader import load_zero123

            # ref_image is REQUIRED (the conditioning view — the
            # reference sets it via get_img_embeds); omitting it here
            # crashed the real-checkpoint path at startup (caught by
            # tests/test_weights_day.py).
            g = load_zero123(
                ckpt, ref_image=ref_rgb,
                stable=opt.get("stable_zero123", False),
                default_elevation=opt.get("elevation", 0),
            )
            guidance_fns.append((lam_123,) + g.guidance_args())
        elif use_fake:
            from ..guidance.fake import fake_zero123_guidance

            g = fake_zero123_guidance(
                stable=opt.get("stable_zero123", False),
                default_elevation=opt.get("elevation", 0),
            )
            guidance_fns.append((lam_123,) + g.guidance_args())
        else:
            print("[WARN] lambda_zero123 > 0 but no zero123_ckpt given and "
                  "fake_guidance=False; skipping zero123 guidance")
    if lam_sd > 0 and (prompt or opt.get("imagedream", False)):
        ckpt = opt.get("sd_ckpt", None)
        if opt.get("imagedream", False):
            if ckpt:
                from ..guidance.loader import load_imagedream

                g = load_imagedream(
                    ckpt, ref_image=ref_rgb, prompt=prompt or "",
                    negative_prompt=opt.get("negative_prompt", "") or "",
                )
            elif use_fake:
                from ..guidance.fake import fake_imagedream_guidance

                g = fake_imagedream_guidance()
            else:
                print("[WARN] imagedream needs sd_ckpt or fake_guidance")
                return tuple(guidance_fns)
            guidance_fns.append((lam_sd,) + g.guidance_args())
        elif opt.get("mvdream", False):
            if ckpt:
                from ..guidance.loader import load_stable_diffusion

                g = load_stable_diffusion(
                    ckpt, prompt=prompt,
                    negative_prompt=opt.get("negative_prompt", "") or "",
                    mvdream=True,
                )
            elif use_fake:
                from ..guidance.fake import fake_mvdream_guidance

                g = fake_mvdream_guidance()
            else:
                print("[WARN] mvdream needs sd_ckpt or fake_guidance")
                return tuple(guidance_fns)
            guidance_fns.append((lam_sd,) + g.guidance_args())
        elif ckpt:
            from ..guidance.loader import load_stable_diffusion

            g = load_stable_diffusion(
                ckpt, prompt=prompt,
                negative_prompt=opt.get("negative_prompt", "") or "",
            )
            guidance_fns.append((lam_sd,) + g.guidance_args())
        elif use_fake:
            from ..guidance.fake import fake_sd_guidance

            g = fake_sd_guidance()
            guidance_fns.append((lam_sd,) + g.guidance_args())
        else:
            print("[WARN] lambda_sd > 0 but no sd_ckpt given and "
                  "fake_guidance=False; skipping SD guidance")
    return tuple(guidance_fns)


def build_mesh(opt):
    """Build a jax.sharding.Mesh from the ``mesh`` config key.

    The reference pins one GPU (/root/reference/scripts/run.sh:1); the
    TPU framework trains multi-chip. Accepted values:
      mesh: 8              -> 1D data mesh over 8 devices
      mesh: "data8"        -> same
      mesh: "data4xtile2"  -> 2D mesh: views shard over 'data' (DP),
                              each render's tile grid over 'tile' (SP)
    Returns None when the key is absent (single-device training).
    """
    spec = opt.get("mesh", None)
    if spec in (None, "", 0, False):
        return None
    import re

    import jax
    from jax.sharding import Mesh

    if isinstance(spec, int) or (isinstance(spec, str) and spec.isdigit()):
        axes = [("data", int(spec))]
    else:
        axes = []
        for part in str(spec).split("x"):
            m = re.fullmatch(r"(data|tile)(\d+)", part.strip())
            if not m:
                raise ValueError(
                    f"bad mesh spec {spec!r}: use e.g. 8, 'data8', "
                    "'data4xtile2'"
                )
            axes.append((m.group(1), int(m.group(2))))
    names = [a for a, _ in axes]
    sizes = [s for _, s in axes]
    total = int(np.prod(sizes))
    if jax.device_count() < total:
        raise ValueError(
            f"mesh {spec!r} needs {total} devices, have "
            f"{jax.device_count()}"
        )
    devs = np.array(jax.devices()[:total]).reshape(sizes)
    return Mesh(devs, tuple(names))


def run(opt) -> dict:
    import jax

    if opt.get("jax_cache", True):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/jax_comp_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ..train import Stage1Trainer
    from .process import load_rgba

    ref_rgb = ref_mask = None
    if opt.get("input", None):
        rgba = load_rgba(opt.input, size=opt.get("ref_size", 256))
        ref_mask = rgba[..., 3]
        ref_rgb = rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:])

    guidance_fns = build_guidances(opt, ref_rgb)

    mesh = build_mesh(opt)
    if mesh is not None:
        axes = "x".join(f"{k}={v}" for k, v in
                        zip(mesh.axis_names, mesh.devices.shape))
        print(f"[INFO] training on a {axes} device mesh")
    trainer = Stage1Trainer(
        opt,
        ref_rgb=ref_rgb,
        ref_mask=ref_mask,
        guidance_fns=guidance_fns,
        capacity=opt.get("capacity", 16384),
        seed=opt.get("seed", 0),
        mesh=mesh,
    )
    ckpt_dir = opt.get("checkpoint_dir", None)
    if opt.get("resume", False) and ckpt_dir and os.path.exists(ckpt_dir):
        trainer.load_checkpoint(ckpt_dir)
        print(f"[INFO] resumed from {ckpt_dir} at step {trainer.step}")
    remaining = max(0, opt.get("iters", 500) - trainer.step)
    stats = trainer.train(
        remaining,
        checkpoint_every=opt.get("checkpoint_every", 0),
        checkpoint_dir=ckpt_dir,
    )
    print(f"[INFO] stage 1 done: {stats}")

    outdir = opt.get("outdir", "logs")
    os.makedirs(outdir, exist_ok=True)
    save_path = opt.save_path

    ply_path = os.path.join(outdir, f"{save_path}_model.ply")
    n = trainer.save_ply(ply_path)
    print(f"[INFO] saved {n} gaussians to {ply_path}")

    if opt.get("save_mesh", True):
        from ..meshing.export import export_textured_mesh

        mesh_path = os.path.join(
            outdir, f"{save_path}_mesh.{opt.get('mesh_format', 'obj')}"
        )

        def render_fn(cam):
            out = trainer.render_view(cam)
            return np.asarray(out.image)

        export_textured_mesh(
            trainer.params, trainer.aux.alive, render_fn, mesh_path,
            fovy=trainer.fovy, radius=trainer.radius,
            density_thresh=opt.get("density_thresh", 1.0),
            texture_size=opt.get("texture_size", 1024),
            bake_resolution=opt.get("bake_resolution", 512),
            mc_resolution=opt.get("mc_resolution", 128),
            decimate_target=opt.get("decimate_target", 100_000),
            uv_cache_path=mesh_path,
        )
        print(f"[INFO] saved textured mesh to {mesh_path}")
        stats["mesh_path"] = mesh_path
    stats["ply_path"] = ply_path
    return stats


def main(argv=None) -> None:
    from ..utils.config import load_with_cli

    ap = argparse.ArgumentParser(
        description="dreamgaussian_tpu stage 1 (gaussian optimization)"
    )
    ap.add_argument("--config", required=True)
    args, extras = ap.parse_known_args(argv)
    opt = load_with_cli(args.config, extras)
    run(opt)


if __name__ == "__main__":
    main(sys.argv[1:])
