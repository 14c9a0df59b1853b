#!/usr/bin/env python
"""Record CUDA-reference rasterizer outputs as parity fixtures.

Run this in an environment with torch-CUDA and the
``diff_gaussian_rasterization`` extension installed (the reference's
setup, /root/reference/readme.md:30-32). It renders deterministic random
scenes through the same call surface the reference uses
(/root/reference/gs_renderer.py:745-822), records the forward image /
depth / alpha / radii and the gradients of a fixed random-weighted loss
w.r.t. every input, and writes ``tests/fixtures/cuda_parity/*.npz``.

``tests/test_cuda_parity.py`` then asserts allclose between those dumps
and the TPU rasterizer in parity mode (tile=16) — the BASELINE.json
"forward image and per-Gaussian grads allclose" gate.

This environment has no CUDA, so the script only runs elsewhere; it is
self-contained on purpose.
"""

from __future__ import annotations

import math
import os

import numpy as np


def make_scene(n, seed):
    rng = np.random.default_rng(seed)
    return dict(
        xyz=(rng.normal(size=(n, 3)) * 0.35).astype(np.float32),
        scale=np.exp(rng.uniform(-4.2, -2.5, size=(n, 3))).astype(np.float32),
        quat=rng.normal(size=(n, 4)).astype(np.float32),
        opacity=(1 / (1 + np.exp(-rng.normal(size=(n,))))).astype(np.float32),
        shs=(rng.normal(size=(n, 1, 3)) * 0.3).astype(np.float32),
    )


def main() -> None:
    import torch
    from diff_gaussian_rasterization import (
        GaussianRasterizationSettings,
        GaussianRasterizer,
    )

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dreamgaussian_tpu.utils.camera import Camera, orbit_camera

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "fixtures", "cuda_parity",
    )
    os.makedirs(out_dir, exist_ok=True)

    fov = math.radians(49.1)
    for case, (n, seed, elev, azim, size) in {
        "small_front": (200, 0, 15.0, 30.0, 64),
        "medium_side": (1000, 1, -20.0, 120.0, 128),
        "large_back": (5000, 2, 0.0, 180.0, 256),
    }.items():
        sc = make_scene(n, seed)
        cam = Camera.from_pose(orbit_camera(elev, azim, 2.0), size, size,
                               fov, fov)

        dev = "cuda"
        xyz = torch.tensor(sc["xyz"], device=dev, requires_grad=True)
        scale = torch.tensor(sc["scale"], device=dev, requires_grad=True)
        quat = torch.tensor(sc["quat"], device=dev, requires_grad=True)
        opacity = torch.tensor(
            sc["opacity"][:, None], device=dev, requires_grad=True
        )
        shs = torch.tensor(sc["shs"], device=dev, requires_grad=True)
        means2d = torch.zeros_like(xyz, requires_grad=True)

        settings = GaussianRasterizationSettings(
            image_height=size,
            image_width=size,
            tanfovx=math.tan(fov / 2),
            tanfovy=math.tan(fov / 2),
            bg=torch.ones(3, device=dev),
            scale_modifier=1.0,
            viewmatrix=torch.tensor(cam.view.T, device=dev),
            projmatrix=torch.tensor((cam.full_proj).T, device=dev),
            sh_degree=0,
            campos=torch.tensor(cam.campos, device=dev),
            prefiltered=False,
            debug=False,
        )
        rasterizer = GaussianRasterizer(raster_settings=settings)
        image, radii, depth, alpha = rasterizer(
            means3D=xyz, means2D=means2d, shs=shs, colors_precomp=None,
            opacities=opacity, scales=scale, rotations=quat,
            cov3D_precomp=None,
        )

        rng = np.random.default_rng(seed + 100)
        w_img = torch.tensor(
            rng.normal(size=image.shape).astype(np.float32), device=dev
        )
        w_alpha = torch.tensor(
            rng.normal(size=alpha.shape).astype(np.float32), device=dev
        )
        loss = (image * w_img).sum() + (alpha * w_alpha).sum()
        loss.backward()

        np.savez(
            os.path.join(out_dir, f"{case}.npz"),
            **sc,
            elev=elev, azim=azim, size=size, radius=2.0, fovy=fov,
            image=image.detach().cpu().numpy(),
            depth=depth.detach().cpu().numpy(),
            alpha=alpha.detach().cpu().numpy(),
            radii=radii.detach().cpu().numpy(),
            w_img=w_img.cpu().numpy(),
            w_alpha=w_alpha.cpu().numpy(),
            g_xyz=xyz.grad.cpu().numpy(),
            g_scale=scale.grad.cpu().numpy(),
            g_quat=quat.grad.cpu().numpy(),
            g_opacity=opacity.grad.cpu().numpy(),
            g_shs=shs.grad.cpu().numpy(),
            g_means2d=means2d.grad.cpu().numpy(),
        )
        print(f"wrote {case}.npz")


if __name__ == "__main__":
    main()
