"""Zero123 novel-view synthesis demo (guidance parity harness).

Equivalent of the reference's standalone guidance CLI
(/root/reference/guidance/zero123_utils.py:197-236): given one RGBA input
view, sample novel views at requested (delta-elevation, delta-azimuth)
offsets with the zero123 diffusion model.

Requires a local checkpoint (``--ckpt``); with ``--fake`` it runs the
tiny random denoiser (pipeline smoke only, output is noise-shaped).

  python -m dreamgaussian_tpu.cli.novel_view data/name_rgba.png \\
      --ckpt /path/to/zero123-xl-diffusers --hors -30 30 90
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--fake", action="store_true")
    ap.add_argument("--vers", type=float, nargs="*", default=[0.0])
    ap.add_argument("--hors", type=float, nargs="*", default=[30.0])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from .process import load_rgba

    rgba = load_rgba(args.input, size=256)
    rgb = rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:])

    if args.ckpt:
        from ..guidance.loader import load_zero123

        g = load_zero123(args.ckpt, ref_image=rgb)
    elif args.fake:
        from ..guidance.fake import fake_zero123_guidance

        g = fake_zero123_guidance(image_size=256)
    else:
        raise SystemExit("need --ckpt <dir> (or --fake for a smoke run)")

    vers = args.vers if len(args.vers) == len(args.hors) else (
        args.vers * len(args.hors)
    )
    images = jnp.broadcast_to(jnp.asarray(rgb)[None], (len(args.hors),) + rgb.shape)
    # strength 0 => start from (almost) pure noise: full generation.
    # Fused refine: the whole DDIM loop is ONE jitted dispatch (the eager
    # loop costs a host round-trip per denoise step on tunneled TPUs).
    fn, gp = g.refine_args(steps=args.steps)
    cond = {
        "vers": jnp.asarray(vers, jnp.float32),
        "hors": jnp.asarray(args.hors, jnp.float32),
        "radii": jnp.zeros(len(args.hors)),
    }
    out = np.asarray(fn(images, cond, 0.0, jax.random.PRNGKey(0), gp))

    import imageio

    base = args.out or os.path.splitext(args.input)[0]
    for i, (v, h) in enumerate(zip(vers, args.hors)):
        p = f"{base}_nv_v{v:g}_h{h:g}.png"
        imageio.imwrite(p, (np.clip(out[i], 0, 1) * 255).astype(np.uint8))
        print(f"[INFO] wrote {p}")


if __name__ == "__main__":
    main()
