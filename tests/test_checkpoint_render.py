"""Checkpoint/resume round-trip + render/eval CLI tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dreamgaussian_tpu.train import Stage1Trainer
from dreamgaussian_tpu.utils.config import Config


def tiny_opt(**over):
    base = dict(
        iters=20, ref_size=32, num_pts=128, sh_degree=0, batch_size=1,
        novel_resolutions=[32, 32, 32], warmup_rgb_loss=False,
        density_start_iter=5, density_end_iter=15,
        densification_interval=5, opacity_reset_interval=10000,
        elevation=0, radius=2.0, fovy=49.1, min_ver=-30, max_ver=30,
        invert_bg_prob=0.5,
    )
    base.update(over)
    return Config(base)


def target():
    yy, xx = np.mgrid[0:32, 0:32]
    disc = ((xx - 15.5) ** 2 + (yy - 15.5) ** 2) < 100
    rgb = np.ones((32, 32, 3), np.float32)
    rgb[disc] = [0.9, 0.2, 0.1]
    return rgb, disc.astype(np.float32)


class TestCheckpoint:
    def test_resume_is_bit_exact(self, tmp_path):
        rgb, mask = target()
        ck = str(tmp_path / "ck")

        # Run A: 6 steps, checkpoint, 4 more steps.
        a = Stage1Trainer(tiny_opt(), ref_rgb=rgb, ref_mask=mask,
                          capacity=256, seed=3)
        for _ in range(6):
            a.train_step()
        a.save_checkpoint(ck)
        for _ in range(4):
            a.train_step()

        # Run B: fresh trainer, restore at step 6, 4 more steps.
        b = Stage1Trainer(tiny_opt(), ref_rgb=rgb, ref_mask=mask,
                          capacity=256, seed=999)  # different seed on purpose
        b.load_checkpoint(ck)
        assert b.step == 6
        for _ in range(4):
            b.train_step()

        for k in a.params:
            np.testing.assert_array_equal(
                np.asarray(a.params[k]), np.asarray(b.params[k]), err_msg=k
            )
        np.testing.assert_array_equal(
            np.asarray(a.aux.alive), np.asarray(b.aux.alive)
        )

    def test_checkpoint_every_in_train(self, tmp_path):
        rgb, mask = target()
        ck = str(tmp_path / "ck2")
        tr = Stage1Trainer(tiny_opt(iters=6), ref_rgb=rgb, ref_mask=mask,
                           capacity=256, seed=0)
        tr.train(6, checkpoint_every=3, checkpoint_dir=ck)
        assert os.path.exists(os.path.join(ck, "host_state.pkl"))


class TestRenderCLI:
    @pytest.fixture()
    def trained_ply(self, tmp_path):
        rgb, mask = target()
        tr = Stage1Trainer(tiny_opt(iters=5), ref_rgb=rgb, ref_mask=mask,
                           capacity=256, seed=0)
        for _ in range(5):
            tr.train_step()
        p = str(tmp_path / "gs.ply")
        tr.save_ply(p)
        return p

    def test_orbit_gif_from_ply(self, trained_ply, tmp_path):
        from dreamgaussian_tpu.cli import render as cli_render

        out = str(tmp_path / "orbit.gif")
        cli_render.main([trained_ply, "--out", out, "--num_frames", "4",
                         "--size", "32"])
        assert os.path.getsize(out) > 100

    def test_frame_grid_png(self, trained_ply, tmp_path):
        from dreamgaussian_tpu.cli import render as cli_render

        out = str(tmp_path / "grid.png")
        cli_render.main([trained_ply, "--out", out, "--num_frames", "4",
                         "--size", "32"])
        import imageio

        grid = imageio.imread(out)
        assert grid.shape[0] == 64 and grid.shape[1] == 64  # 2x2 of 32px


class TestEvalCLI:
    def test_psnr_reporting(self, tmp_path, capsys):
        from dreamgaussian_tpu.cli import eval as cli_eval
        from PIL import Image

        rgb, mask = target()
        rgba = np.dstack([rgb, mask]).astype(np.float32)
        ip = str(tmp_path / "in_rgba.png")
        Image.fromarray((rgba * 255).astype(np.uint8)).save(ip)

        tr = Stage1Trainer(tiny_opt(iters=5), ref_rgb=rgb, ref_mask=mask,
                           capacity=256, seed=0)
        for _ in range(5):
            tr.train_step()
        pp = str(tmp_path / "gs.ply")
        tr.save_ply(pp)

        cli_eval.main([ip, pp, "--size", "32"])
        out = capsys.readouterr().out
        assert "front_psnr" in out and "front_mae" in out
