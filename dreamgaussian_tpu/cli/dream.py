"""Standalone diffusion sampler demos (guidance parity harnesses).

TPU equivalents of the reference's guidance ``__main__`` blocks:

- ``--mode sd``: text-to-image, one 512^2 image
  (/root/reference/guidance/sd_utils.py:308-348).
- ``--mode mvdream``: text-to-multiview, a 2x2 grid of 4 joint views
  (/root/reference/guidance/mvdream_utils.py:253-277).
- ``--mode imagedream``: image+text-to-multiview 2x2 grid
  (/root/reference/guidance/imagedream_utils.py:295-324).

Each sampler is the fused single-dispatch DDIM chain (sample_fn). With
``--fake`` the tiny random denoiser runs instead of real weights — the
output is noise-shaped but the full pipeline (embeds, CFG, scheduler,
VAE decode, grid assembly) is exercised; that is this environment's
smoke path since no pretrained checkpoints ship in the image.

  python -m dreamgaussian_tpu.cli.dream "a photo of an icecream" \\
      --mode sd --ckpt /path/to/sd-2.1-base
  python -m dreamgaussian_tpu.cli.dream "an astronaut" --mode mvdream \\
      --ckpt /path/to/sd-v2.1-base-4view.pt
  python -m dreamgaussian_tpu.cli.dream "a plush toy" --mode imagedream \\
      --image data/anya_rgba.png --ckpt /path/to/ipmv.pt
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _grid2x2(imgs: np.ndarray) -> np.ndarray:
    """[4, H, W, 3] -> [2H, 2W, 3] (the reference demos' plot grid)."""
    return np.concatenate(
        [
            np.concatenate([imgs[0], imgs[1]], axis=1),
            np.concatenate([imgs[2], imgs[3]], axis=1),
        ],
        axis=0,
    )


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prompt")
    ap.add_argument("--negative", default="")
    ap.add_argument("--mode", default="sd",
                    choices=("sd", "mvdream", "imagedream"))
    ap.add_argument("--image", default=None,
                    help="identity image (imagedream only)")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--fake", action="store_true")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--scale", type=float, default=None,
                    help="CFG scale (defaults: sd/mvdream 7.5, imagedream 5)")
    ap.add_argument("--elevation", type=float, default=0.0)
    ap.add_argument("--azimuth-start", type=float, default=0.0)
    ap.add_argument("--radius", type=float, default=2.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    steps = args.steps if args.steps is not None else (50 if args.mode == "sd" else 30)
    scale = args.scale if args.scale is not None else (5.0 if args.mode == "imagedream" else 7.5)

    ref_rgb = None
    if args.mode == "imagedream":
        if not args.image:
            raise SystemExit("--mode imagedream needs --image")
        from .process import load_rgba

        rgba = load_rgba(args.image, size=256)
        ref_rgb = rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:])

    if args.ckpt:
        from ..guidance import loader

        if args.mode == "sd":
            g = loader.load_stable_diffusion(
                args.ckpt, args.prompt, negative_prompt=args.negative
            )
        elif args.mode == "mvdream":
            g = loader.load_mvdream(
                args.ckpt, args.prompt, negative_prompt=args.negative
            )
        else:
            g = loader.load_imagedream(
                args.ckpt, ref_rgb, args.prompt,
                negative_prompt=args.negative,
            )
    elif args.fake:
        from ..guidance import fake

        if args.mode == "sd":
            g = fake.fake_sd_guidance(image_size=64)
        elif args.mode == "mvdream":
            g = fake.fake_mvdream_guidance(image_size=64)
        else:
            g = fake.fake_imagedream_guidance(image_size=64)
    else:
        raise SystemExit("need --ckpt <path> (or --fake for a smoke run)")

    fn = g.sample_fn(steps=steps, guidance_scale=scale)
    gp = g.backbone.net_params or {}
    key = jax.random.PRNGKey(args.seed)

    if args.mode == "sd":
        out = np.asarray(fn(key, gp) if gp else fn(key))
        img = out[0]
    else:
        from ..utils.camera import orbit_camera

        poses = np.stack([
            orbit_camera(args.elevation, args.azimuth_start + 90.0 * i,
                         args.radius)
            for i in range(4)
        ]).astype(np.float32)
        poses = jnp.asarray(poses)
        out = np.asarray(fn(poses, key, gp) if gp else fn(poses, key))
        img = _grid2x2(out)

    import imageio

    path = args.out or f"dream_{args.mode}.png"
    imageio.imwrite(path, (np.clip(img, 0, 1) * 255).astype(np.uint8))
    print(f"[INFO] wrote {path}")


if __name__ == "__main__":
    main()
