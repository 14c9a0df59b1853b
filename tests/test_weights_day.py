"""Weights-day rehearsal: the ENTIRE real-checkpoint path end-to-end.

No pretrained checkpoint ships in this environment (zero egress), so the
one capability that has never run is "produce an asset from a real
zero123 snapshot" (/root/reference/main.py:122-160, readme.md:107-108).
This rehearses every step of that day on a SYNTHETIC tiny
diffusers-format snapshot — the same directory layout, file formats, and
code path a real `ashawkey/zero123-xl-diffusers` download would take:

    torch .bin state dicts -> loader config.json parsing -> weight
    conversion -> CLIP image embed (real transformers CLIP) -> camera
    projection -> param-passing jit -> stage-1 training -> geo+tex
    export -> stage-2 refine (fused DDIM img2img) -> CLIP-sim eval.

When a real snapshot appears, the ONLY change is the directory passed as
``zero123_ckpt`` (VERDICT r4 next-#5). The tiny model sizes come from
the snapshot's own config.json — no test-only code paths in the package.
"""

import json
import os
import sys

import numpy as np
import pytest

from dreamgaussian_tpu.guidance.unet import UNetConfig
from dreamgaussian_tpu.guidance.vae import VAEConfig
from dreamgaussian_tpu.utils.config import Config

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from test_convert import make_unet_sd, make_vae_sd  # noqa: E402

CTX = 16  # tiny cross-attention dim == tiny CLIP projection_dim


def _torch_save(sd: dict, path: str):
    import torch

    os.makedirs(os.path.dirname(path), exist_ok=True)
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    """Tiny synthetic zero123 diffusers snapshot directory."""
    root = str(tmp_path_factory.mktemp("zero123_tiny_snapshot"))

    # unet/ — 8-channel input (latent + conditioning latent), tiny blocks.
    ucfg = UNetConfig(
        in_channels=8, out_channels=4,
        block_out_channels=(8, 16), layers_per_block=1,
        cross_attention_dim=CTX, attention_head_dim=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        use_linear_projection=False,
    )
    _torch_save(make_unet_sd(ucfg),
                os.path.join(root, "unet", "diffusion_pytorch_model.bin"))
    with open(os.path.join(root, "unet", "config.json"), "w") as f:
        json.dump({
            "in_channels": 8, "out_channels": 4,
            "block_out_channels": [8, 16], "layers_per_block": 1,
            "cross_attention_dim": CTX, "attention_head_dim": 4,
            "down_block_types": ["CrossAttnDownBlock2D", "DownBlock2D"],
            "up_block_types": ["UpBlock2D", "CrossAttnUpBlock2D"],
            "use_linear_projection": False,
        }, f)

    # vae/
    vcfg = VAEConfig(block_out_channels=(8, 16), layers_per_block=1)
    _torch_save(make_vae_sd(vcfg),
                os.path.join(root, "vae", "diffusion_pytorch_model.bin"))
    with open(os.path.join(root, "vae", "config.json"), "w") as f:
        json.dump({
            "in_channels": 3, "latent_channels": 4,
            "block_out_channels": [8, 16], "layers_per_block": 1,
            "scaling_factor": 0.18215,
        }, f)

    # image_encoder/ — REAL transformers CLIP vision tower (tiny config),
    # saved as a torch checkpoint exactly like the snapshot ships it.
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    ccfg = CLIPVisionConfig(
        hidden_size=16, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=16,
        projection_dim=CTX,
    )
    enc = CLIPVisionModelWithProjection(ccfg)
    enc.save_pretrained(os.path.join(root, "image_encoder"),
                        safe_serialization=False)
    del torch

    # clip_camera_projection/ — Linear(ctx+4 -> ctx), torch (out, in).
    rng = np.random.default_rng(0)
    _torch_save(
        {"proj.weight": rng.normal(size=(CTX, CTX + 4)).astype(np.float32)
         * 0.05,
         "proj.bias": np.zeros(CTX, np.float32)},
        os.path.join(root, "clip_camera_projection",
                     "diffusion_pytorch_model.bin"),
    )
    return root


def _base_opt(snapshot, outdir, save_path):
    return Config(dict(
        input="/root/reference/data/anya_rgba.png",
        zero123_ckpt=snapshot,
        lambda_zero123=1.0,
        lambda_sd=0,
        iters=4,
        iters_refine=3,
        ref_size=32,
        num_pts=300,
        capacity=512,
        sh_degree=0,
        batch_size=1,
        elevation=0,
        radius=2.0,
        fovy=49.1,
        min_ver=-30,
        max_ver=30,
        density_start_iter=100,
        density_end_iter=3000,
        densification_interval=100,
        opacity_reset_interval=700,
        warmup_rgb_loss=True,
        invert_bg_prob=0.5,
        mc_resolution=24,
        density_thresh=0.1,  # 4 toy iters don't reach the default 1.0
        decimate_target=2000,
        texture_size=64,
        bake_resolution=64,
        novel_resolution=64,
        texture_lr=0.2,
        geom_lr=1e-4,
        train_geo=False,
        outdir=outdir,
        save_path=save_path,
        mesh_format="obj",
        gui=False,
        jax_cache=False,
    ))


def test_full_real_checkpoint_path(snapshot, tmp_path):
    """stage 1 (real loader + SDS) -> export -> stage 2 (real fused DDIM
    refine) -> CLIP-sim eval, exactly as a real-weights run would go."""
    from dreamgaussian_tpu.cli import eval as eval_cli
    from dreamgaussian_tpu.cli import main as main_cli
    from dreamgaussian_tpu.cli import main2 as main2_cli

    outdir = str(tmp_path)
    stats1 = main_cli.run(_base_opt(snapshot, outdir, "wday"))
    assert os.path.exists(stats1["ply_path"])
    assert os.path.exists(stats1["mesh_path"])
    assert np.isfinite(stats1["loss"])

    opt2 = _base_opt(snapshot, outdir, "wday")
    stats2 = main2_cli.run(opt2)
    assert os.path.exists(stats2["mesh_path"])
    assert np.isfinite(stats2["loss"])

    # CLIP-sim protocol (readme.md:107-108 analogue) with the snapshot's
    # own (tiny) CLIP vision tower as the metric model. In-process (a
    # subprocess would be a second JAX client — the axon tunnel serves
    # one at a time even for CPU-forced runs).
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eval_cli.main([
            "/root/reference/data/anya_rgba.png", stats2["mesh_path"],
            "--clip_ckpt", os.path.join(snapshot, "image_encoder"),
            "--size", "64",
        ])
    out = buf.getvalue()
    assert "clip_sim:" in out, out
    sim = float(out.split("clip_sim:")[1].split()[0])
    assert -1.0 <= sim <= 1.0
