#!/usr/bin/env python
"""Record torch-reference guidance-network outputs as parity fixtures.

Run this on a machine with the reference's environment (torch + diffusers
for SD/zero123, the mvdream/imagedream packages for the 4-view models)
and the pretrained checkpoints downloaded. It feeds FIXED deterministic
inputs through each frozen network exactly the way the reference guidance
modules do (/root/reference/guidance/*.py) and writes
``tests/fixtures/guidance_parity/<kind>.npz``.

``tests/test_guidance_parity.py`` then converts the SAME checkpoint with
our convert.py into the Flax modules and asserts allclose on every
recorded output — the weight-level gate VERDICT r1 asked for (the
CUDA-rasterizer analogue for the guidance stack). Set the environment
variable ``DG_PARITY_CKPT_<KIND>`` (e.g. DG_PARITY_CKPT_SD21) to the
checkpoint path when running the tests.

Fixture schema (all float32, torch NCHW layouts preserved):
  kind                        "sd21" | "zero123" | "mvdream" | "imagedream"
  prompts                     the prompts used for the text dump
  text_emb [N, 77, D]         text-encoder output (penultimate+ln_final
                              for ldm kinds; CLIPTextModel final states
                              for diffusers kinds)
  vae_image [1, 3, H, W]      input image in [-1, 1]
  vae_latent_mean [1, 4, h, w] posterior mean * scaling_factor
  vae_decode_in [1, 4, h, w]  fixed latent fed to the decoder
  vae_decode_out [1, 3, H, W] decoder output
  unet_x [B, C, h, w]         UNet input latents
  unet_t [B]                  timesteps
  unet_ctx [B, L, D]          cross-attention context
  unet_eps [B, 4, h, w]       UNet prediction
  (zero123)  cam_tokens [B, 1, 768]  post-projection conditioning tokens
  (mvdream+) camera [B, 16]   raw normalized cameras
  (imagedream) ip [B, 257, 1280], ip_img [rB, 4, h, w]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "guidance_parity",
)
PROMPTS = ["a photo of an astronaut riding a horse", ""]


def _rng(seed):
    return np.random.default_rng(seed)


def _fixed_image(seed, size):
    return (_rng(seed).random((1, 3, size, size)).astype(np.float32) * 2 - 1)


def dump_sd21(ckpt: str) -> dict:
    import torch
    from diffusers import AutoencoderKL, UNet2DConditionModel
    from transformers import CLIPTextModel, CLIPTokenizer

    unet = UNet2DConditionModel.from_pretrained(ckpt, subfolder="unet").eval()
    vae = AutoencoderKL.from_pretrained(ckpt, subfolder="vae").eval()
    tok = CLIPTokenizer.from_pretrained(ckpt, subfolder="tokenizer")
    te = CLIPTextModel.from_pretrained(ckpt, subfolder="text_encoder").eval()

    with torch.no_grad():
        ids = tok(PROMPTS, padding="max_length",
                  max_length=tok.model_max_length, truncation=True,
                  return_tensors="pt").input_ids
        text_emb = te(ids)[0].numpy()

        img = torch.from_numpy(_fixed_image(1, 256))
        post = vae.encode(img).latent_dist
        lat_mean = (post.mean * vae.config.scaling_factor).numpy()
        dec_in = torch.from_numpy(
            _rng(2).normal(size=lat_mean.shape).astype(np.float32)
        )
        dec_out = vae.decode(dec_in / vae.config.scaling_factor).sample.numpy()

        x = torch.from_numpy(
            _rng(3).normal(size=(2, 4, 32, 32)).astype(np.float32)
        )
        t = torch.tensor([17, 901])
        eps = unet(x, t, encoder_hidden_states=torch.from_numpy(text_emb)
                   ).sample.numpy()
    return dict(
        kind="sd21", prompts=np.array(PROMPTS), text_emb=text_emb,
        vae_image=img.numpy(), vae_latent_mean=lat_mean,
        vae_decode_in=dec_in.numpy(), vae_decode_out=dec_out,
        unet_x=x.numpy(), unet_t=t.numpy().astype(np.float32),
        unet_ctx=text_emb, unet_eps=eps,
    )


def dump_zero123(ckpt: str) -> dict:
    import torch
    from diffusers import AutoencoderKL, UNet2DConditionModel

    unet = UNet2DConditionModel.from_pretrained(ckpt, subfolder="unet").eval()
    vae = AutoencoderKL.from_pretrained(ckpt, subfolder="vae").eval()

    # Camera-conditioned tokens through clip_camera_projection
    # (/root/reference/zero123.py:41-78): [clip_embed(768) ++ T(4)] @ W.
    import safetensors.torch as st
    proj_dir = os.path.join(ckpt, "clip_camera_projection")
    cand = [f for f in os.listdir(proj_dir)
            if f.endswith((".safetensors", ".bin"))]
    p = os.path.join(proj_dir, cand[0])
    sd = (st.load_file(p) if p.endswith(".safetensors")
          else torch.load(p, map_location="cpu"))
    (wk,) = [k for k in sd if k.endswith("weight")]
    (bk,) = [k for k in sd if k.endswith("bias")]
    clip_emb = _rng(4).normal(size=(2, 1, 768)).astype(np.float32)
    T = _rng(5).normal(size=(2, 1, 4)).astype(np.float32)
    cc = np.concatenate([clip_emb, T], axis=-1)
    cam_tokens = cc @ sd[wk].numpy().T + sd[bk].numpy()

    with torch.no_grad():
        img = torch.from_numpy(_fixed_image(6, 256))
        post = vae.encode(img).latent_dist
        lat_mean = (post.mean * vae.config.scaling_factor).numpy()
        dec_in = torch.from_numpy(
            _rng(7).normal(size=lat_mean.shape).astype(np.float32)
        )
        dec_out = vae.decode(dec_in / vae.config.scaling_factor).sample.numpy()

        x = torch.from_numpy(
            _rng(8).normal(size=(2, 8, 32, 32)).astype(np.float32)
        )
        t = torch.tensor([17, 901])
        eps = unet(x, t, encoder_hidden_states=torch.from_numpy(
            cam_tokens.astype(np.float32))).sample.numpy()
    return dict(
        kind="zero123", prompts=np.array([]), text_emb=np.zeros((0,)),
        cam_tokens=cam_tokens, clip_emb=clip_emb, cam_T=T,
        vae_image=img.numpy(), vae_latent_mean=lat_mean,
        vae_decode_in=dec_in.numpy(), vae_decode_out=dec_out,
        unet_x=x.numpy(), unet_t=t.numpy().astype(np.float32),
        unet_ctx=cam_tokens.astype(np.float32), unet_eps=eps,
    )


def _dump_ldm_4view(ckpt: str, kind: str, with_ip: bool) -> dict:
    """MVDream / ImageDream via their own packages (the reference path)."""
    import torch

    if with_ip:
        from imagedream.model_zoo import build_model
        model = build_model("sd-v2.1-base-4view-ipmv", ckpt_path=ckpt).eval()
    else:
        from mvdream.model_zoo import build_model
        model = build_model("sd-v2.1-base-4view", ckpt_path=ckpt).eval()

    with torch.no_grad():
        text_emb = np.stack([
            model.get_learned_conditioning([p])[0].numpy() for p in PROMPTS
        ])

        img = torch.from_numpy(_fixed_image(10, 256))
        lat = model.get_first_stage_encoding(
            model.encode_first_stage(img)).numpy()
        dec_in = torch.from_numpy(
            _rng(11).normal(size=lat.shape).astype(np.float32)
        )
        dec_out = model.decode_first_stage(dec_in).numpy()

        # Views per joint-attention group: 4 for MVDream, 4+1 (extra
        # identity view) for ImageDream — matching the num_frames each
        # reference guidance passes (mvdream_utils.py:161,
        # imagedream_utils.py:177).
        b = 5 if with_ip else 4
        x = torch.from_numpy(
            _rng(12).normal(size=(b, 4, 32, 32)).astype(np.float32)
        )
        t = torch.full((b,), 501, dtype=torch.long)
        camera = torch.from_numpy(
            _rng(13).normal(size=(b, 16)).astype(np.float32)
        )
        ctx = torch.from_numpy(
            np.repeat(text_emb[:1], b, axis=0).astype(np.float32)
        )
        context = {"context": ctx, "camera": camera, "num_frames": b}
        extra = {}
        if with_ip:
            ip = torch.from_numpy(
                _rng(14).normal(size=(b, 257, 1280)).astype(np.float32)
            )
            ip_img = torch.from_numpy(
                _rng(15).normal(size=(1, 4, 32, 32)).astype(np.float32)
            )
            context.update({"ip": ip, "ip_img": ip_img})
            extra = {"ip": ip.numpy(), "ip_img": ip_img.numpy()}
        eps = model.apply_model(x, t, context).numpy()
    return dict(
        kind=kind, prompts=np.array(PROMPTS), text_emb=text_emb,
        vae_image=img.numpy(), vae_latent_mean=lat,
        vae_decode_in=dec_in.numpy(), vae_decode_out=dec_out,
        unet_x=x.numpy(), unet_t=t.numpy().astype(np.float32),
        unet_ctx=ctx.numpy(), unet_eps=eps, camera=camera.numpy(), **extra,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--kind", required=True,
                    choices=["sd21", "zero123", "mvdream", "imagedream"])
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", default=OUT_DIR)
    args = ap.parse_args()

    fn = {
        "sd21": dump_sd21,
        "zero123": dump_zero123,
        "mvdream": lambda c: _dump_ldm_4view(c, "mvdream", False),
        "imagedream": lambda c: _dump_ldm_4view(c, "imagedream", True),
    }[args.kind]
    data = fn(args.ckpt)
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, f"{args.kind}.npz")
    np.savez(path, **data)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
