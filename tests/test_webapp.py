"""Webapp (gradio equivalent) smoke test: page + full stage-1 job via HTTP."""

import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest
from PIL import Image

from dreamgaussian_tpu.cli.webapp import AppState, make_handler


@pytest.fixture()
def app(tmp_path):
    # tiny rgba input
    data = tmp_path / "data"
    data.mkdir()
    rgba = np.zeros((64, 64, 4), np.uint8)
    rgba[16:48, 16:48] = [200, 60, 50, 255]
    Image.fromarray(rgba).save(str(data / "disc_rgba.png"))
    out = tmp_path / "logs"
    out.mkdir()
    extra = [
        "iters=6", "ref_size=32", "num_pts=64", "capacity=128",
        "novel_resolutions=[32,32,32]", "density_start_iter=100",
        "density_end_iter=100", "densification_interval=100",
        "opacity_reset_interval=10000", "fake_guidance=True",
        "texture_size=64", "bake_resolution=32", "mc_resolution=32",
        "decimate_target=500", "jax_cache=False", "density_thresh=0.1",
    ]
    state = AppState(str(data), str(out), extra)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", str(data)
    server.shutdown()


class TestWebapp:
    def test_page_and_stage1_job(self, app):
        base, data = app
        page = urllib.request.urlopen(base + "/", timeout=30).read()
        assert b"disc_rgba.png" in page

        inp = data + "/disc_rgba.png"
        r = json.loads(
            urllib.request.urlopen(
                base + f"/run?stage=1&input={inp}", timeout=30
            ).read()
        )
        assert r["error"] is None

        deadline = time.time() + 600
        status = {}
        while time.time() < deadline:
            status = json.loads(
                urllib.request.urlopen(base + "/status", timeout=30).read()
            )
            if not status["running"] and status["log"]:
                break
            time.sleep(2)
        assert "done" in status["log"], status["log"][-2000:]
        assert status["artifact"] and status["artifact"].endswith(".gif")

        # artifact served over http
        gif = urllib.request.urlopen(
            base + "/artifact?path=" + status["artifact"], timeout=30
        ).read()
        assert gif[:3] == b"GIF"

        # path traversal blocked
        req = urllib.request.Request(base + "/artifact?path=/etc/passwd")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 403
