"""End-to-end CLI tests: both stages on a tiny workload (CPU)."""

import os

import numpy as np
import pytest
from PIL import Image

from dreamgaussian_tpu.utils.config import load_with_cli


@pytest.fixture(scope="module")
def tiny_input(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    # a centered colored disc as RGBA
    size = 64
    yy, xx = np.mgrid[0:size, 0:size]
    c = (size - 1) / 2
    disc = ((xx - c) ** 2 + (yy - c) ** 2) < (size * 0.3) ** 2
    rgba = np.zeros((size, size, 4), np.uint8)
    rgba[disc] = [230, 60, 40, 255]
    p = str(d / "disc_rgba.png")
    Image.fromarray(rgba).save(p)
    return p


def tiny_overrides(tmp_path, input_path):
    return [
        f"input={input_path}",
        "save_path=tiny",
        f"outdir={tmp_path}",
        "iters=12",
        "ref_size=32",
        "num_pts=256",
        "capacity=512",
        "novel_resolutions=[32,32,32]",
        "density_start_iter=4",
        "density_end_iter=8",
        "densification_interval=4",
        "opacity_reset_interval=10000",
        "fake_guidance=True",
        "texture_size=64",
        "bake_resolution=32",
        "mc_resolution=32",
        "decimate_target=2000",
        "iters_refine=3",
        "novel_resolution=64",
        "refine_steps=3",
        "jax_cache=False",
        "density_thresh=0.2",
    ]


class TestTwoStagePipeline:
    def test_stage1_then_stage2(self, tiny_input, tmp_path):
        from dreamgaussian_tpu.cli import main as cli1
        from dreamgaussian_tpu.cli import main2 as cli2

        opt = load_with_cli(
            "configs/image.yaml", tiny_overrides(tmp_path, tiny_input)
        )
        stats1 = cli1.run(opt)
        assert os.path.exists(stats1["ply_path"])
        assert os.path.exists(stats1["mesh_path"])
        assert stats1["alive"] > 0

        stats2 = cli2.run(opt)
        assert os.path.exists(stats2["mesh_path"])
        assert np.isfinite(stats2["loss"])
        # refined mesh has a texture + mtl next to it
        mtl = stats2["mesh_path"].replace(".obj", ".mtl")
        assert os.path.exists(mtl)


class TestProcess:
    def test_load_rgba_passthrough(self, tiny_input):
        from dreamgaussian_tpu.cli.process import load_rgba

        rgba = load_rgba(tiny_input, size=32)
        assert rgba.shape == (32, 32, 4)
        assert rgba.max() <= 1.0
        assert rgba[..., 3].max() == 1.0

    def test_recenter(self):
        from dreamgaussian_tpu.cli.process import recenter

        rgba = np.zeros((64, 64, 4), np.uint8)
        rgba[5:15, 40:60] = 255
        out = recenter(rgba, 32, border_ratio=0.2)
        assert out.shape == (32, 32, 4)
        m = out[..., 3] > 0
        ys, xs = np.nonzero(m)
        # object centered-ish
        assert abs(ys.mean() - 15.5) < 3 and abs(xs.mean() - 15.5) < 3
