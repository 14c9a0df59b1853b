"""End-to-end golden regression: stage1 -> export -> stage2 at fixed seed.

The unit oracles (dense rasterizer reference, hash-pinned kernel goldens)
catch kernel drift; this catches SEMANTIC drift across the whole pipeline
— trainer loss wiring, densify schedule, export bake, refine loop — by
gating renders of the trained outputs against committed goldens at
PSNR >= 40 (the e2e analogue of /root/reference/scripts/run_test.sh).

Regenerate after an INTENTIONAL semantic change with:
    DG_REGEN_GOLDENS=1 python -m pytest tests/test_golden_e2e.py -q
and commit the updated fixtures with a note on what changed.
"""

import math
import os

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from dreamgaussian_tpu.utils.config import load_with_cli

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "golden_e2e"
)
REGEN = os.environ.get("DG_REGEN_GOLDENS", "") == "1"


def psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)) ** 2))
    return 10.0 * math.log10(1.0 / max(mse, 1e-12))


def _check_golden(name, img):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.npy")
    img = np.asarray(img, np.float16)
    if REGEN or not os.path.exists(path):
        np.save(path, img)
        assert REGEN, (
            f"golden {name} was missing — wrote {path}; rerun to use it"
        )
        return
    golden = np.load(path)
    p = psnr(img, golden)
    assert p >= 40.0, f"golden {name} drifted: PSNR {p:.1f} < 40"


@pytest.fixture(scope="module")
def pipeline_outputs(tmp_path_factory):
    """One fixed-seed tiny two-stage run shared by the golden checks."""
    tmp = tmp_path_factory.mktemp("golden")
    # Deterministic input: colored disc with an off-center highlight (so
    # renders are orientation-sensitive).
    size = 64
    yy, xx = np.mgrid[0:size, 0:size]
    c = (size - 1) / 2
    disc = ((xx - c) ** 2 + (yy - c) ** 2) < (size * 0.3) ** 2
    spot = ((xx - c - 7) ** 2 + (yy - c + 5) ** 2) < (size * 0.08) ** 2
    rgba = np.zeros((size, size, 4), np.uint8)
    rgba[disc] = [230, 60, 40, 255]
    rgba[spot & disc] = [40, 80, 220, 255]
    input_path = str(tmp / "golden_rgba.png")
    Image.fromarray(rgba).save(input_path)

    overrides = [
        f"input={input_path}", "save_path=golden", f"outdir={tmp}",
        "iters=16", "ref_size=32", "num_pts=256", "capacity=512",
        "novel_resolutions=[32,32,32]", "density_start_iter=4",
        "density_end_iter=12", "densification_interval=4",
        "opacity_reset_interval=10000", "fake_guidance=True",
        "texture_size=64", "bake_resolution=32", "mc_resolution=32",
        "decimate_target=2000", "iters_refine=3", "novel_resolution=64",
        "refine_steps=3", "jax_cache=False", "density_thresh=0.2",
    ]
    from dreamgaussian_tpu.cli import main as cli1
    from dreamgaussian_tpu.cli import main2 as cli2

    opt = load_with_cli("configs/image.yaml", overrides)
    stats1 = cli1.run(opt)
    stats2 = cli2.run(opt)
    return opt, stats1, stats2


def _orbit_cam(size=64, elev=10.0, azim=35.0):
    from dreamgaussian_tpu.utils.camera import Camera, orbit_camera

    fov = math.radians(49.1)
    return Camera.from_pose(
        orbit_camera(elev, azim, 2.0), size, size, fov, fov
    )


class TestGoldenE2E:
    def test_stage1_gaussian_render(self, pipeline_outputs):
        from dreamgaussian_tpu.ops.rasterize import render_gaussians
        from dreamgaussian_tpu.scene import load_ply

        _, stats1, _ = pipeline_outputs
        params, aux, sh_degree = load_ply(stats1["ply_path"], capacity=1024)
        cam = _orbit_cam()
        a = {k: jnp.asarray(v) for k, v in cam.arrays().items()}
        import jax

        out = render_gaussians(
            params["xyz"], jnp.exp(params["scaling"]), params["rotation"],
            jax.nn.sigmoid(params["opacity"][:, 0]),
            jnp.concatenate([params["f_dc"], params["f_rest"]], axis=1),
            a["view"], a["full_proj"], a["campos"], a["tanfov"],
            64, 64, jnp.ones(3), sh_degree=sh_degree, alive=aux.alive,
        )
        img = np.asarray(out.image)
        assert np.isfinite(img).all()
        _check_golden("stage1_render", img)

    def test_stage2_mesh_render(self, pipeline_outputs):
        from dreamgaussian_tpu.meshing.mesh import Mesh
        from dreamgaussian_tpu.train import Stage2Trainer

        opt, _, stats2 = pipeline_outputs
        mesh = Mesh.load(stats2["mesh_path"], resize=False)
        tr = Stage2Trainer(opt, mesh, seed=0)
        out = tr.render_view(_orbit_cam())
        img = np.asarray(out["image"])
        assert np.isfinite(img).all()
        _check_golden("stage2_render", img)
