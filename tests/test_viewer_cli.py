"""Viewer state + novel-view CLI smoke tests (no HTTP server needed)."""

import numpy as np
import pytest

from dreamgaussian_tpu.train import Stage1Trainer
from dreamgaussian_tpu.utils.config import Config


@pytest.fixture(scope="module")
def trained_ply(tmp_path_factory):
    d = tmp_path_factory.mktemp("viewer")
    opt = Config(dict(
        iters=4, ref_size=32, num_pts=128, sh_degree=0, batch_size=1,
        novel_resolutions=[32, 32, 32], warmup_rgb_loss=False,
        density_start_iter=100, density_end_iter=100,
        densification_interval=100, opacity_reset_interval=10000,
        elevation=0, radius=2.0, fovy=49.1, min_ver=-30, max_ver=30,
        invert_bg_prob=0.5,
    ))
    rgb = np.full((32, 32, 3), 0.5, np.float32)
    tr = Stage1Trainer(opt, ref_rgb=rgb, ref_mask=np.ones((32, 32), np.float32),
                       capacity=256, seed=0)
    for _ in range(4):
        tr.train_step()
    p = str(d / "v.ply")
    tr.save_ply(p)
    return p


class TestViewerState:
    def test_render_modes(self, trained_ply):
        from dreamgaussian_tpu.cli.serve import ViewerState

        st = ViewerState(trained_ply, size=64)
        for mode in ("image", "depth", "alpha"):
            img = st.render(10.0, 30.0, 2.0, mode)
            assert img.shape == (64, 64, 3)
            assert img.dtype == np.uint8

    def test_http_handler_serves_page_and_png(self, trained_ply):
        import threading
        import urllib.request
        from http.server import ThreadingHTTPServer

        from dreamgaussian_tpu.cli.serve import ViewerState, make_handler

        st = ViewerState(trained_ply, size=32)
        server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(st))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            page = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=30
            ).read()
            assert b"viewer" in page
            png = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/render?elev=0&azim=0&radius=2",
                timeout=60,
            ).read()
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
        finally:
            server.shutdown()


class TestNovelViewCLI:
    def test_fake_mode_writes_images(self, trained_ply, tmp_path):
        from PIL import Image

        from dreamgaussian_tpu.cli import novel_view

        rgba = np.zeros((64, 64, 4), np.uint8)
        rgba[16:48, 16:48] = [200, 60, 50, 255]
        ip = str(tmp_path / "in_rgba.png")
        Image.fromarray(rgba).save(ip)
        novel_view.main([ip, "--fake", "--hors", "30", "--steps", "3",
                         "--out", str(tmp_path / "nv")])
        import glob

        outs = glob.glob(str(tmp_path / "nv_nv_*.png"))
        assert len(outs) == 1

    def test_requires_ckpt_or_fake(self, tmp_path):
        from PIL import Image

        from dreamgaussian_tpu.cli import novel_view

        rgba = np.zeros((32, 32, 4), np.uint8)
        ip = str(tmp_path / "x_rgba.png")
        Image.fromarray(rgba).save(ip)
        with pytest.raises(SystemExit):
            novel_view.main([ip])
