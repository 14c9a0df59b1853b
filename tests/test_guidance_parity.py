"""Weight-level allclose gate: converted Flax guidance nets vs torch dumps.

Fixtures come from ``scripts/dump_guidance_fixtures.py`` run in the
reference's torch environment with real pretrained checkpoints. Each test
needs BOTH the fixture npz (committed or dropped into
``tests/fixtures/guidance_parity/``) and the matching checkpoint locally,
pointed to by ``DG_PARITY_CKPT_<KIND>`` (e.g. ``DG_PARITY_CKPT_SD21=~/
ckpts/stable-diffusion-2-1-base``). Without either, the tests SKIP —
mirroring the CUDA-rasterizer gate (test_cuda_parity.py).

All comparisons run the Flax modules in float32. Tolerances allow for
op-reordering between cuDNN/torch and XLA: 2e-3 absolute on UNet eps
(values O(1)), 1e-2 on decoded images, 1e-4 on text embeddings.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "guidance_parity"
)


def _fixture_and_ckpt(kind):
    path = os.path.join(FIXTURE_DIR, f"{kind}.npz")
    ckpt = os.environ.get(f"DG_PARITY_CKPT_{kind.upper()}")
    if not os.path.exists(path):
        pytest.skip(f"no {kind} fixture (scripts/dump_guidance_fixtures.py)")
    if not ckpt or not os.path.exists(ckpt):
        pytest.skip(f"DG_PARITY_CKPT_{kind.upper()} not set")
    return np.load(path, allow_pickle=True), ckpt


def _nchw(x):
    return jnp.asarray(x).transpose(0, 2, 3, 1)


def _to_nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


def _check_vae(backbone, d):
    lat = backbone.vae_encode(_nchw(d["vae_image"]))
    np.testing.assert_allclose(
        _to_nchw(lat), d["vae_latent_mean"], atol=2e-3, rtol=1e-3
    )
    dec = backbone.vae_decode(_nchw(d["vae_decode_in"]))
    np.testing.assert_allclose(
        _to_nchw(dec), d["vae_decode_out"], atol=1e-2, rtol=1e-2
    )


def _check_unet(backbone, d, **kw):
    eps = backbone.unet_apply(
        _nchw(d["unet_x"]), jnp.asarray(d["unet_t"]),
        jnp.asarray(d["unet_ctx"]), **kw
    )
    np.testing.assert_allclose(
        _to_nchw(eps), d["unet_eps"], atol=2e-3, rtol=1e-2
    )


class TestSD21:
    def test_parity(self):
        d, ckpt = _fixture_and_ckpt("sd21")
        from dreamgaussian_tpu.guidance.loader import (
            _build_backbone, _encode_text,
        )
        from dreamgaussian_tpu.guidance.unet import SD21_CONFIG

        bk = _build_backbone(ckpt, SD21_CONFIG, 512, dtype=jnp.float32)
        emb = _encode_text(ckpt, [str(p) for p in d["prompts"]])
        np.testing.assert_allclose(emb, d["text_emb"], atol=1e-4, rtol=1e-3)
        _check_vae(bk, d)
        _check_unet(bk, d)


class TestZero123:
    def test_parity(self):
        d, ckpt = _fixture_and_ckpt("zero123")
        from dreamgaussian_tpu.guidance.loader import _build_backbone
        from dreamgaussian_tpu.guidance.convert import load_torch_state_dict
        from dreamgaussian_tpu.guidance.unet import ZERO123_CONFIG

        bk = _build_backbone(ckpt, ZERO123_CONFIG, 256, dtype=jnp.float32)
        # clip_camera_projection parity.
        sd = load_torch_state_dict(ckpt, "clip_camera_projection")
        (wk,) = [k for k in sd if k.endswith("weight")]
        (bias_k,) = [k for k in sd if k.endswith("bias")]
        cc = np.concatenate([d["clip_emb"], d["cam_T"]], axis=-1)
        ours = cc @ np.asarray(sd[wk]).T + np.asarray(sd[bias_k])
        np.testing.assert_allclose(ours, d["cam_tokens"], atol=1e-5)
        _check_vae(bk, d)
        _check_unet(bk, d)


class TestMVDream:
    def test_parity(self):
        d, ckpt = _fixture_and_ckpt("mvdream")
        from dreamgaussian_tpu.guidance.convert import load_torch_state_dict
        from dreamgaussian_tpu.guidance.loader import (
            _build_backbone_ldm, _encode_text_open_clip,
        )
        from dreamgaussian_tpu.guidance.unet import MVDREAM_CONFIG

        sd = load_torch_state_dict(ckpt)
        bk = _build_backbone_ldm(sd, MVDREAM_CONFIG, 256, dtype=jnp.float32)
        tok_dir = os.environ.get(
            "DG_PARITY_TOKENIZER", os.path.join(os.path.dirname(ckpt),
                                                "tokenizer")
        )
        if os.path.exists(tok_dir):
            emb = _encode_text_open_clip(sd, tok_dir,
                                         [str(p) for p in d["prompts"]])
            np.testing.assert_allclose(
                emb, d["text_emb"], atol=1e-4, rtol=1e-3
            )
        _check_vae(bk, d)
        _check_unet(bk, d, camera=jnp.asarray(d["camera"]))


class TestImageDream:
    def test_parity(self):
        d, ckpt = _fixture_and_ckpt("imagedream")
        from dreamgaussian_tpu.guidance.convert import load_torch_state_dict
        from dreamgaussian_tpu.guidance.loader import _build_backbone_ldm
        from dreamgaussian_tpu.guidance.unet import IMAGEDREAM_CONFIG

        sd = load_torch_state_dict(ckpt)
        bk = _build_backbone_ldm(
            sd, IMAGEDREAM_CONFIG, 256, dtype=jnp.float32
        )
        _check_vae(bk, d)
        _check_unet(
            bk, d, camera=jnp.asarray(d["camera"]),
            ip=jnp.asarray(d["ip"]), ip_img=_nchw(d["ip_img"]),
        )
