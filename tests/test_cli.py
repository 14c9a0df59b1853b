"""End-to-end CLI tests: both stages on a tiny workload (CPU)."""

import os

import jax.numpy as jnp
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


class TestGuidanceModes:
    """Each preset's guidance flavor runs end-to-end with fake priors."""

    def _run(self, tmp_path, config, extra, with_input=True, tiny_input=None):
        from dreamgaussian_tpu.cli import main as cli1

        over = [
            "save_path=mode", f"outdir={tmp_path}", "iters=4",
            "ref_size=32", "num_pts=64", "capacity=128",
            "novel_resolutions=[32,32,32]", "density_start_iter=100",
            "density_end_iter=100", "densification_interval=100",
            "opacity_reset_interval=10000", "fake_guidance=True",
            "save_mesh=False", "jax_cache=False", *extra,
        ]
        if with_input:
            over.append(f"input={tiny_input}")
        opt = load_with_cli(config, over)
        return cli1.run(opt)

    def test_text_mode_sd(self, tmp_path):
        stats = self._run(
            tmp_path, "configs/text.yaml",
            ["prompt=a photo of a hamburger"], with_input=False,
        )
        assert np.isfinite(stats["loss"])

    def test_text_mv_mode(self, tmp_path):
        stats = self._run(
            tmp_path, "configs/text_mv.yaml",
            ["prompt=a photo of a hamburger"], with_input=False,
        )
        assert np.isfinite(stats["loss"])

    def test_imagedream_mode(self, tmp_path, tiny_input):
        stats = self._run(
            tmp_path, "configs/imagedream.yaml",
            ["prompt=a cartoon disc"], tiny_input=tiny_input,
        )
        assert np.isfinite(stats["loss"])

    def test_image_sai_mode(self, tmp_path, tiny_input):
        stats = self._run(
            tmp_path, "configs/image_sai.yaml", [], tiny_input=tiny_input,
        )
        assert np.isfinite(stats["loss"])


class TestSHDegree:
    def test_sh1_train_save_load_render(self, tmp_path):
        from dreamgaussian_tpu.scene import load_ply
        from dreamgaussian_tpu.train import Stage1Trainer
        from dreamgaussian_tpu.utils.config import Config

        rgb = np.full((32, 32, 3), 0.4, np.float32)
        opt = Config(dict(
            iters=6, ref_size=32, num_pts=64, sh_degree=1, batch_size=1,
            novel_resolutions=[32, 32, 32], warmup_rgb_loss=False,
            density_start_iter=100, density_end_iter=100,
            densification_interval=100, opacity_reset_interval=10000,
            elevation=0, radius=2.0, fovy=49.1, min_ver=-30, max_ver=30,
            invert_bg_prob=0.5,
        ))
        tr = Stage1Trainer(opt, ref_rgb=rgb,
                           ref_mask=np.ones((32, 32), np.float32),
                           capacity=128, seed=0)
        assert tr.params["f_rest"].shape == (128, 3, 3)
        for _ in range(6):
            tr.train_step()
        # f_rest actually received gradient signal
        assert float(jnp.abs(tr.params["f_rest"]).max()) > 0
        p = str(tmp_path / "sh1.ply")
        tr.save_ply(p)
        params, aux, deg = load_ply(p)
        assert deg == 1
        out = tr.render_view(tr.fixed_cam)
        assert np.isfinite(np.asarray(out.image)).all()


class TestDreamCLI:
    """Standalone sampler demos (cli/dream.py) in --fake smoke mode."""

    def test_sd_txt2img(self, tmp_path):
        from dreamgaussian_tpu.cli import dream

        out = str(tmp_path / "sd.png")
        dream.main(["a photo of a hamburger", "--fake", "--steps", "4",
                    "--out", out])
        img = np.asarray(Image.open(out))
        assert img.shape == (64, 64, 3)

    def test_mvdream_grid(self, tmp_path):
        from dreamgaussian_tpu.cli import dream

        out = str(tmp_path / "mv.png")
        dream.main(["an astronaut", "--mode", "mvdream", "--fake",
                    "--steps", "4", "--out", out])
        img = np.asarray(Image.open(out))
        assert img.shape == (128, 128, 3)

    def test_imagedream_grid(self, tmp_path, tiny_input):
        from dreamgaussian_tpu.cli import dream

        out = str(tmp_path / "id.png")
        dream.main(["a cartoon disc", "--mode", "imagedream", "--image",
                    tiny_input, "--fake", "--steps", "4", "--out", out])
        img = np.asarray(Image.open(out))
        assert img.shape == (128, 128, 3)


class TestMeshCLI:
    """The ``mesh`` config key builds a device mesh and trains the
    sharded Stage1Trainer from the user-facing CLI (VERDICT r3 #3)."""

    def test_build_mesh_specs(self):
        from dreamgaussian_tpu.cli.main import build_mesh
        from dreamgaussian_tpu.utils.config import Config

        assert build_mesh(Config({})) is None
        m = build_mesh(Config({"mesh": 8}))
        assert m.axis_names == ("data",) and m.devices.shape == (8,)
        m = build_mesh(Config({"mesh": "data4xtile2"}))
        assert m.axis_names == ("data", "tile")
        assert m.devices.shape == (4, 2)
        with pytest.raises(ValueError):
            build_mesh(Config({"mesh": "foo3"}))
        with pytest.raises(ValueError):
            build_mesh(Config({"mesh": 64}))

    def test_stage1_cli_on_mesh(self, tiny_input, tmp_path):
        from dreamgaussian_tpu.cli import main as cli1

        opt = load_with_cli(
            "configs/image.yaml",
            tiny_overrides(tmp_path, tiny_input) + [
                "mesh=data4xtile2",
                "batch_size=4",
                "ref_size=64",
                "novel_resolutions=[64,64,64]",  # tile axis needs >=2 tile rows
                "save_mesh=False",
                # TPU-production semantics from the CLI: host-split densify
                "in_scan_densify=False",
            ],
        )
        stats = cli1.run(opt)
        assert np.isfinite(stats["loss"])
        assert os.path.exists(stats["ply_path"])
