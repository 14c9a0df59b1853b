"""Stage-2 CLI: mesh texture refinement.

Equivalent of ``python main2.py --config configs/image.yaml ...``
(/root/reference/main2.py:686-710), including the auto-discovery of the
stage-1 mesh when ``mesh`` is unset.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_refiners(opt, ref_rgb):
    """((weight, fn, net_params) refine entries, max refine image_size).

    Every guidance uses its FUSED jitted refine loop (guidance/sds.py
    ``refine_args``: one compiled program per guidance, strength
    traced). The second return value is the largest ``image_size`` the
    enabled guidances resize the refine input to (None when no guidance
    is enabled) — Stage2Trainer derives its target-render SSAA from it,
    so e.g. SD's 512^2 refine input is rendered at full resolution while
    zero123's 256^2 one is not over-rendered.
    """
    refine_fns = []
    sizes = []
    use_fake = opt.get("fake_guidance", False)
    lam_sd = opt.get("lambda_sd", 0)
    lam_123 = opt.get("lambda_zero123", 0)
    steps = opt.get("refine_steps", 50)

    def done():
        return tuple(refine_fns), (max(sizes) if sizes else None)

    if lam_123 > 0 and ref_rgb is not None:
        if opt.get("zero123_ckpt", None):
            from ..guidance.loader import load_zero123

            # ref_image is REQUIRED (same crash as cli.main's zero123
            # path — caught by tests/test_weights_day.py).
            g = load_zero123(
                opt.zero123_ckpt, ref_image=ref_rgb,
                stable=opt.get("stable_zero123", False),
                default_elevation=opt.get("elevation", 0),
            )
        elif use_fake:
            from ..guidance.fake import fake_zero123_guidance

            g = fake_zero123_guidance(
                stable=opt.get("stable_zero123", False),
                default_elevation=opt.get("elevation", 0),
            )
        else:
            return done()
        refine_fns.append((lam_123,) + g.refine_args(steps=steps))
        sizes.append(g.image_size)
    if lam_sd > 0 and (opt.get("prompt", "") or opt.get("imagedream", False)):
        if opt.get("imagedream", False):
            if opt.get("sd_ckpt", None):
                from ..guidance.loader import load_imagedream

                g = load_imagedream(
                    opt.sd_ckpt, ref_image=ref_rgb,
                    prompt=opt.get("prompt", "") or "",
                    negative_prompt=opt.get("negative_prompt", "") or "",
                )
            elif use_fake:
                from ..guidance.fake import fake_imagedream_guidance

                g = fake_imagedream_guidance()
            else:
                return done()
        elif opt.get("mvdream", False):
            if opt.get("sd_ckpt", None):
                from ..guidance.loader import load_mvdream

                g = load_mvdream(
                    opt.sd_ckpt, prompt=opt.prompt,
                    negative_prompt=opt.get("negative_prompt", "") or "",
                )
            elif use_fake:
                from ..guidance.fake import fake_mvdream_guidance

                g = fake_mvdream_guidance()
            else:
                return done()
        else:
            if opt.get("sd_ckpt", None):
                from ..guidance.loader import load_stable_diffusion

                g = load_stable_diffusion(
                    opt.sd_ckpt, prompt=opt.prompt,
                    negative_prompt=opt.get("negative_prompt", ""),
                )
            elif use_fake:
                from ..guidance.fake import fake_sd_guidance

                g = fake_sd_guidance()
            else:
                return done()
        refine_fns.append((lam_sd,) + g.refine_args(steps=steps))
        sizes.append(g.image_size)
    return done()


def run(opt) -> dict:
    import jax

    if opt.get("jax_cache", True):
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/jax_comp_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ..meshing.mesh import Mesh
    from ..train import Stage2Trainer
    from .process import load_rgba

    # Auto-discover the stage-1 mesh (/root/reference/main2.py:698-703).
    mesh_path = opt.get("mesh", None)
    if not mesh_path:
        default = os.path.join(
            opt.get("outdir", "logs"),
            f"{opt.save_path}_mesh.{opt.get('mesh_format', 'obj')}",
        )
        if os.path.exists(default):
            mesh_path = default
        else:
            raise FileNotFoundError(
                f"cannot find stage-1 mesh at {default}; pass mesh=<path>"
            )
    mesh = Mesh.load(mesh_path, resize=False)
    if mesh.vt is None:
        mesh.auto_uv()
        mesh.auto_normal()
    if mesh.albedo is None:
        mesh.albedo = np.full(
            (opt.get("texture_size", 1024),) * 2 + (3,), 0.5, np.float32
        )

    ref_rgb = ref_mask = None
    if opt.get("input", None):
        rgba = load_rgba(opt.input, size=opt.get("ref_size", 256))
        ref_mask = rgba[..., 3]
        ref_rgb = rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:])

    refine_fns, refine_image_size = build_refiners(opt, ref_rgb)
    trainer = Stage2Trainer(
        opt, mesh, ref_rgb=ref_rgb, ref_mask=ref_mask,
        refine_fns=refine_fns, refine_image_size=refine_image_size,
        seed=opt.get("seed", 0),
    )
    stats = trainer.train(opt.get("iters_refine", 50))
    print(f"[INFO] stage 2 done: {stats}")

    outdir = opt.get("outdir", "logs")
    os.makedirs(outdir, exist_ok=True)
    out_path = os.path.join(
        outdir, f"{opt.save_path}.{opt.get('mesh_format', 'obj')}"
    )
    trainer.export_mesh(out_path)
    print(f"[INFO] saved refined mesh to {out_path}")
    stats["mesh_path"] = out_path
    return stats


def main(argv=None) -> None:
    from ..utils.config import load_with_cli

    ap = argparse.ArgumentParser(
        description="dreamgaussian_tpu stage 2 (texture refinement)"
    )
    ap.add_argument("--config", required=True)
    args, extras = ap.parse_known_args(argv)
    opt = load_with_cli(args.config, extras)
    run(opt)


if __name__ == "__main__":
    main(sys.argv[1:])
