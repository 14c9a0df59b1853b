"""U2Net matting: architecture matches the official state-dict layout."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _roundtrip(cfg_name, tmp_path):
    from dreamgaussian_tpu.preprocess.u2net import (
        FULL_CFG, SMALL_CFG, _build_modules, load_u2net, u2net_alpha,
    )

    cfg = FULL_CFG if cfg_name == "full" else SMALL_CFG
    U2NET = _build_modules()
    torch.manual_seed(0)
    model = U2NET(cfg)
    path = str(tmp_path / f"u2net_{cfg_name}.pth")
    torch.save(model.state_dict(), path)
    # load_u2net must detect the variant and load strictly (any key or
    # shape mismatch vs the official layout raises here).
    loaded = load_u2net(path)
    rgb = (np.random.default_rng(0).random((48, 40, 3)) * 255).astype(
        np.uint8
    )
    alpha = u2net_alpha(rgb, path, size=64)
    assert alpha.shape == (48, 40)
    assert np.isfinite(alpha).all()
    assert 0.0 <= alpha.min() and alpha.max() <= 1.0
    return loaded


@pytest.mark.parametrize("variant", ["full", "small"])
def test_state_dict_roundtrip_and_matting(variant, tmp_path):
    _roundtrip(variant, tmp_path)


def test_official_key_spot_checks(tmp_path):
    """Key names/shapes that pin the official u2net.pth layout."""
    from dreamgaussian_tpu.preprocess.u2net import FULL_CFG, _build_modules

    U2NET = _build_modules()
    sd = U2NET(FULL_CFG).state_dict()
    # Encoder: RSU7(3,32,64) .. RSU4F(512,256,512).
    assert sd["stage1.rebnconvin.conv_s1.weight"].shape == (64, 3, 3, 3)
    assert sd["stage1.rebnconv7.conv_s1.weight"].shape == (32, 32, 3, 3)
    assert sd["stage2.rebnconvin.conv_s1.weight"].shape == (128, 64, 3, 3)
    assert sd["stage6.rebnconv4.conv_s1.weight"].shape == (256, 256, 3, 3)
    # Decoder: RSU4F(1024,256,512) .. RSU7(128,16,64).
    assert sd["stage5d.rebnconvin.conv_s1.weight"].shape == (512, 1024, 3, 3)
    assert sd["stage1d.rebnconvin.conv_s1.weight"].shape == (64, 128, 3, 3)
    assert sd["stage1d.rebnconv1.conv_s1.weight"].shape == (16, 64, 3, 3)
    # Sides + fuse.
    assert sd["side6.weight"].shape == (1, 512, 3, 3)
    assert sd["outconv.weight"].shape == (1, 6, 1, 1)
    # BatchNorm buffers present (inference uses running stats).
    assert "stage1.rebnconvin.bn_s1.running_mean" in sd
