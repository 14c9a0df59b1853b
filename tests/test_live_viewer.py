"""Live-training viewer: background optimization + HTTP control.

The reference trains INSIDE its dearpygui loop (train toggle,
/root/reference/main.py:879-886); our web viewer's --train mode is the
equivalent. This drives it end-to-end over HTTP: status reports live
mode, the train toggle advances steps, renders reflect the live state.
"""

import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest


@pytest.fixture()
def live_server():
    from dreamgaussian_tpu.cli.serve import ViewerState, make_handler
    from dreamgaussian_tpu.train import Stage1Trainer
    from dreamgaussian_tpu.utils.config import Config

    opt = Config(dict(
        iters=40, ref_size=32, num_pts=64, sh_degree=0, batch_size=1,
        novel_resolutions=[32, 32, 32], density_start_iter=1000,
        density_end_iter=2000, warmup_rgb_loss=False, elevation=0,
        radius=2.0, fovy=49.1,
    ))
    rng = np.random.default_rng(0)
    trainer = Stage1Trainer(
        opt, ref_rgb=rng.random((32, 32, 3)).astype(np.float32),
        ref_mask=np.ones((32, 32), np.float32), capacity=128, seed=0,
    )
    state = ViewerState(None, size=32, trainer=trainer)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", state
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.read()


def test_live_training_over_http(live_server):
    url, state = live_server

    st = json.loads(_get(url + "/status"))
    assert st["live"] is True and st["training"] is False
    assert st["step"] == 0

    # Page advertises the train toggle; render works before training.
    assert b"train" in _get(url + "/")
    png = _get(url + "/render?elev=0&azim=0&radius=2&mode=image")
    assert png[:4] == b"\x89PNG"

    _get(url + "/train?on=1")
    deadline = time.time() + 60
    while time.time() < deadline:
        st = json.loads(_get(url + "/status"))
        if st["step"] >= 3:
            break
        time.sleep(0.2)
    assert st["training"] is True
    assert st["step"] >= 3, st
    assert st["loss"] is None or np.isfinite(st["loss"])

    _get(url + "/train?on=0")
    time.sleep(0.3)
    s1 = json.loads(_get(url + "/status"))["step"]
    time.sleep(0.5)
    s2 = json.loads(_get(url + "/status"))["step"]
    assert s2 - s1 <= 1  # paused (at most one in-flight step finishes)

    # Render mid-training still serves a valid frame.
    png = _get(url + "/render?elev=10&azim=30&radius=2&mode=alpha")
    assert png[:4] == b"\x89PNG"
