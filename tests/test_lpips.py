"""LPIPS: jax VGG16 trunk vs an inline torch oracle, metric sanity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _tiny_vgg_state(seed=0):
    """Random torchvision-layout vgg16.features state dict (full-size
    channel plan — tiny spatial inputs keep it fast)."""
    import torch.nn as nn

    plan = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
            (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
            (512, 512), (512, 512), (512, 512)]
    idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    torch.manual_seed(seed)
    sd = {}
    for i, (cin, cout) in zip(idx, plan):
        sd[f"features.{i}.weight"] = torch.randn(cout, cin, 3, 3) * 0.05
        sd[f"features.{i}.bias"] = torch.randn(cout) * 0.05
    return sd


def _torch_lpips(sd, img0, img1):
    """Independent torch implementation of the same LPIPS forward."""
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    pools = {5, 10, 17, 24}
    taps_at = {2, 7, 14, 21, 28}

    def feats(img):
        x = (torch.from_numpy(img).permute(0, 3, 1, 2) * 2 - 1 - shift) / scale
        out = []
        for i in idx:
            if i in pools:
                x = F.max_pool2d(x, 2)
            x = F.relu(F.conv2d(x, sd[f"features.{i}.weight"],
                                sd[f"features.{i}.bias"], padding=1))
            if i in taps_at:
                out.append(x)
        return out

    total = 0.0
    with torch.no_grad():
        for a, b in zip(feats(img0), feats(img1)):
            na = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
            nb = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
            d = ((na - nb) ** 2).mean(dim=(2, 3)).mean(1)  # 1/C weights
            total = total + d
    return total.numpy()


def test_matches_torch_oracle(tmp_path):
    from dreamgaussian_tpu.utils.lpips import LPIPS

    sd = _tiny_vgg_state()
    path = str(tmp_path / "vgg16.pth")
    torch.save(sd, path)
    rng = np.random.default_rng(0)
    img0 = rng.random((2, 64, 64, 3)).astype(np.float32)
    img1 = rng.random((2, 64, 64, 3)).astype(np.float32)
    ours = np.asarray(LPIPS(path)(img0, img1))
    ref = _torch_lpips(sd, img0, img1)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


def test_metric_sanity(tmp_path):
    from dreamgaussian_tpu.utils.lpips import LPIPS

    path = str(tmp_path / "vgg16.pth")
    torch.save(_tiny_vgg_state(), path)
    m = LPIPS(path)
    rng = np.random.default_rng(1)
    a = rng.random((1, 64, 64, 3)).astype(np.float32)
    b = rng.random((1, 64, 64, 3)).astype(np.float32)
    assert float(m(a, a)[0]) < 1e-6
    assert float(m(a, b)[0]) > 1e-4
    # Small perturbations score below unrelated images.
    eps = (a + 0.02 * rng.standard_normal(a.shape).astype(np.float32))
    assert float(m(a, np.clip(eps, 0, 1))[0]) < float(m(a, b)[0])
