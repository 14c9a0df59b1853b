"""Input preprocessing: background removal + recenter (process.py analogue).

The reference uses rembg's U2Net for salient-object matting
(/root/reference/process.py:44-65). This module supports:

- RGBA inputs (already matted — the reference's own data/ fixtures are
  RGBA): alpha channel used directly;
- RGB inputs with a local U2Net checkpoint (``--u2net`` / env
  ``DG_U2NET_CKPT`` pointing at the official ``u2net.pth`` or
  ``u2netp.pth``): rembg-quality matting via
  dreamgaussian_tpu.preprocess.u2net (torch CPU);
- RGB inputs without weights: a GrabCut-based fallback matte (cv2 ships
  in-image), seeded by border statistics;
- the same bbox recenter into a square canvas with border_ratio
  (/root/reference/process.py:68-86).

Usage: python -m dreamgaussian_tpu.cli.process input.png [--size 256]
       [--u2net /path/u2net.pth]
"""

from __future__ import annotations

import argparse
import os

import cv2
import numpy as np


def remove_background(img: np.ndarray,
                      u2net_ckpt: str | None = None) -> np.ndarray:
    """RGB [H,W,3] uint8 -> RGBA. U2Net matte when a checkpoint is given
    (or DG_U2NET_CKPT is set), GrabCut estimate otherwise."""
    u2net_ckpt = u2net_ckpt or os.environ.get("DG_U2NET_CKPT")
    if u2net_ckpt and os.path.exists(u2net_ckpt):
        from ..preprocess.u2net import u2net_alpha

        alpha = (u2net_alpha(img, u2net_ckpt) * 255).astype(np.uint8)
        return np.dstack([img, alpha])
    h, w = img.shape[:2]
    mask = np.zeros((h, w), np.uint8)
    # Assume the object is roughly centered; border is background.
    margin = max(4, min(h, w) // 20)
    rect = (margin, margin, w - 2 * margin, h - 2 * margin)
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    cv2.grabCut(img, mask, rect, bgd, fgd, 5, cv2.GC_INIT_WITH_RECT)
    alpha = np.where((mask == 2) | (mask == 0), 0, 255).astype(np.uint8)
    alpha = cv2.GaussianBlur(alpha, (5, 5), 0)
    return np.dstack([img, alpha])


def recenter(rgba: np.ndarray, size: int, border_ratio: float = 0.2) -> np.ndarray:
    """Crop to the alpha bbox and paste centered into a size^2 canvas
    (/root/reference/process.py:68-86)."""
    mask = rgba[..., 3] > 0
    if not mask.any():
        return cv2.resize(rgba, (size, size), interpolation=cv2.INTER_AREA)
    coords = np.argwhere(mask)
    y0, x0 = coords.min(axis=0)
    y1, x1 = coords.max(axis=0) + 1
    crop = rgba[y0:y1, x0:x1]
    ch, cw = crop.shape[:2]
    desired = int(size * (1 - border_ratio))
    scale = desired / max(ch, cw)
    nh, nw = int(ch * scale), int(cw * scale)
    crop = cv2.resize(crop, (nw, nh), interpolation=cv2.INTER_AREA)
    out = np.zeros((size, size, 4), dtype=rgba.dtype)
    oy = (size - nh) // 2
    ox = (size - nw) // 2
    out[oy : oy + nh, ox : ox + nw] = crop
    return out


def load_rgba(path: str, size: int | None = None,
              border_ratio: float = 0.2,
              u2net_ckpt: str | None = None) -> np.ndarray:
    """Load an image as float RGBA in [0, 1], matting + recentring if
    needed. RGBA inputs keep their alpha."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
    if img.shape[-1] == 4:
        rgba = cv2.cvtColor(img, cv2.COLOR_BGRA2RGBA)
    else:
        rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        rgba = remove_background(rgb, u2net_ckpt)
        rgba = recenter(rgba, size or max(rgba.shape[:2]), border_ratio)
    if size is not None and rgba.shape[0] != size:
        rgba = cv2.resize(rgba, (size, size), interpolation=cv2.INTER_AREA)
    return rgba.astype(np.float32) / 255.0


def caption_image(rgb: np.ndarray, blip_ckpt: str) -> str:
    """BLIP2 captioning from a local checkpoint directory (the reference's
    optional captioner, /root/reference/process.py:16-31). Torch-CPU
    inference; only invoked when a checkpoint is provided."""
    import torch
    from transformers import AutoProcessor, Blip2ForConditionalGeneration

    processor = AutoProcessor.from_pretrained(blip_ckpt)
    model = Blip2ForConditionalGeneration.from_pretrained(
        blip_ckpt, torch_dtype=torch.float32
    )
    inputs = processor(
        images=(rgb * 255).astype(np.uint8), return_tensors="pt"
    )
    out = model.generate(**inputs, max_new_tokens=30)
    return processor.decode(out[0], skip_special_tokens=True).strip()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--border_ratio", type=float, default=0.2)
    ap.add_argument("--u2net", default=None,
                    help="local u2net(.p).pth for rembg-quality matting")
    ap.add_argument("--caption", action="store_true")
    ap.add_argument("--blip_ckpt", default=None,
                    help="local BLIP2 checkpoint dir for --caption")
    args = ap.parse_args()

    rgba = load_rgba(args.path, size=args.size,
                     border_ratio=args.border_ratio, u2net_ckpt=args.u2net)
    out_path = os.path.splitext(args.path)[0] + "_rgba.png"
    cv2.imwrite(
        out_path,
        cv2.cvtColor((rgba * 255).astype(np.uint8), cv2.COLOR_RGBA2BGRA),
    )
    print(f"[INFO] wrote {out_path}")
    if args.caption:
        if not args.blip_ckpt:
            raise SystemExit("--caption needs --blip_ckpt <local dir> "
                             "(no model weights ship in this environment)")
        text = caption_image(rgba[..., :3], args.blip_ckpt)
        cap_path = os.path.splitext(args.path)[0] + "_caption.txt"
        open(cap_path, "w").write(text + "\n")
        print(f"[INFO] caption: {text}")


if __name__ == "__main__":
    main()
