"""Evaluation CLI: image metrics between a result and the input view.

The reference's quantitative protocol is CLIP similarity between the
input image and rendered views of the result mesh
(``python -m kiui.cli.clip_sim``, /root/reference/readme.md:107-108).
This CLI reports:

- PSNR / MAE of the front view against the reference image (always);
- CLIP similarity (mean cosine over 8 orbit views vs the input) when a
  CLIP checkpoint directory is given (no weights ship in this image);
- LPIPS of the front view vs the input when --vgg_ckpt points at a
  torchvision vgg16 state dict (utils/lpips.py; --lpips_ckpt adds the
  lpips linear calibration) — the BASELINE quality-gate metric.

Usage:
  python -m dreamgaussian_tpu.cli.eval data/name_rgba.png logs/name.obj \\
      [--clip_ckpt <dir with CLIP vision model>]
"""

from __future__ import annotations

import argparse
import math

import numpy as np


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse == 0 else -10.0 * math.log10(mse)


def clip_similarity(ckpt_dir: str, image: np.ndarray,
                    views: list[np.ndarray]) -> float:
    """Mean cosine similarity between the input image's and each view's
    CLIP embedding. Torch CLIP on the host (the installed transformers
    ships no Flax CLIP classes); the metric model is tiny next to the
    renders."""
    import jax
    import jax.numpy as jnp
    import torch
    from transformers import CLIPVisionModelWithProjection

    from ..guidance.loader import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    enc = CLIPVisionModelWithProjection.from_pretrained(ckpt_dir)
    size = getattr(enc.config, "image_size", 224)

    def embed(img):
        x = jax.image.resize(jnp.asarray(img), (size, size, 3), "bilinear")
        x = (np.asarray(x) - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
        with torch.no_grad():
            e = enc(pixel_values=torch.from_numpy(
                x.transpose(2, 0, 1)[None]
            )).image_embeds[0].numpy()
        return e / (np.linalg.norm(e) + 1e-8)

    ref = embed(image)
    sims = [float(ref @ embed(v)) for v in views]
    return float(np.mean(sims))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="reference RGBA image")
    ap.add_argument("result", help=".ply gaussians or .obj/.glb mesh")
    ap.add_argument("--clip_ckpt", default=None)
    ap.add_argument("--vgg_ckpt", default=None,
                    help="torchvision vgg16 .pth for LPIPS")
    ap.add_argument("--lpips_ckpt", default=None,
                    help="lpips vgg.pth linear weights")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--elevation", type=float, default=0.0)
    ap.add_argument("--radius", type=float, default=2.0)
    ap.add_argument("--fovy", type=float, default=49.1)
    args = ap.parse_args(argv)

    import os

    from .process import load_rgba
    from .render import render_gaussian_frames, render_mesh_frames

    rgba = load_rgba(args.input, size=args.size)
    ref = rgba[..., :3] * rgba[..., 3:] + (1 - rgba[..., 3:])

    fovy = math.radians(args.fovy)
    ext = os.path.splitext(args.result)[1].lower()
    fn = render_gaussian_frames if ext == ".ply" else render_mesh_frames
    views = fn(args.result, 8, args.size, args.elevation, args.radius, fovy)

    front = views[4] if len(views) >= 8 else views[0]  # hor=0 at index n/2
    print(f"front_psnr: {psnr(ref, front):.3f} dB")
    print(f"front_mae: {float(np.mean(np.abs(ref - front))):.5f}")
    if args.clip_ckpt:
        sim = clip_similarity(args.clip_ckpt, ref, views)
        print(f"clip_sim: {sim:.4f}")
    if args.vgg_ckpt:
        from ..utils.lpips import LPIPS

        metric = LPIPS(args.vgg_ckpt, args.lpips_ckpt)
        d = float(metric(ref[None], front[None])[0])
        print(f"front_lpips: {d:.4f}")


if __name__ == "__main__":
    main()
