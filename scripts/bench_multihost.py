#!/usr/bin/env python
"""rays/s scaling benchmark: 1 device / 1 host / N hosts (BASELINE row).

Measures steady-state rays/s (novel-view pixels rendered per second,
fwd+bwd through the full DP train step — the same step the stage-1
trainer runs) at three rungs of the weak-scaling ladder:

  1 device            1 process x 1 device,  1 view/step
  1 host, D devices   1 process x D devices, D views/step
  N hosts             N processes (jax.distributed), D_total views/step

Each rung runs in a SUBPROCESS so it gets its own JAX platform/device
configuration. Without --platform=default the subprocesses force the CPU
backend with virtual devices (the recipe-validation mode that runs
anywhere, including this repo's CI); on a real TPU pod run with
``--platform=default`` once per host, passing --coordinator/--num-procs/
--proc-id as usual for multi-controller JAX — the measurement code is
identical, the collectives then ride ICI/DCN.

Per-host ideal scaling is linear in device count (views are
embarrassingly parallel; the gradient psum is the only cross-device
traffic). Prints one JSON line per rung and a final scaling summary.

Usage (recipe-validation mode, one machine):
    python scripts/bench_multihost.py [--devices 8] [--size 256]
Worker mode (used internally, or manually on a real pod):
    python scripts/bench_multihost.py --worker --num-procs 2 --proc-id 0 \
        --coordinator 127.0.0.1:9911 --devices 4 --size 256
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(args) -> None:
    """Measure rays/s of the PRODUCTION Stage1Trainer (mesh mode, fused
    shard_map'd scan — the same path cli.main runs with the ``mesh``
    config key) on the global mesh; proc 0 prints one JSON line."""
    import numpy as np

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    if args.num_procs > 1:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_procs,
            process_id=args.proc_id,
        )
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from dreamgaussian_tpu.train import Stage1Trainer
    from dreamgaussian_tpu.utils.config import Config

    devs = np.array(jax.devices())
    n_views = devs.size * args.views_per_device
    mesh = Mesh(devs, ("data",))
    size = args.size

    def fake_guidance(images, cond, step_ratio, key):
        return jnp.mean((images - 0.5) ** 2)

    # Same host-side RNG seed on every process => identical cameras/keys
    # on all controllers; the scan itself is SPMD over the global mesh.
    rng = np.random.default_rng(0)
    ref_rgb = rng.uniform(size=(size, size, 3)).astype(np.float32)
    ref_mask = (ref_rgb[..., 0] > 0.3).astype(np.float32)
    opt = Config(dict(
        iters=1000, ref_size=size, num_pts=args.num_pts, sh_degree=0,
        batch_size=n_views, novel_resolutions=[size, size, size],
        warmup_rgb_loss=False, density_start_iter=10000,
        density_end_iter=10000, densification_interval=100,
        opacity_reset_interval=10000, elevation=0, radius=2.0,
        fovy=49.1, min_ver=-30, max_ver=30, invert_bg_prob=0.5,
    ))
    tr = Stage1Trainer(
        opt, ref_rgb=ref_rgb, ref_mask=ref_mask,
        guidance_fns=((1.0, fake_guidance),), capacity=args.capacity,
        seed=0, mesh=mesh,
    )
    k = args.steps
    jax.block_until_ready(tr.train_segment(k, 1000))  # compile + warm
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(tr.train_segment(k, 1000))
        reps.append((time.perf_counter() - t0) / k)
    dt = float(np.median(reps))

    if args.proc_id == 0:
        print(json.dumps({
            "devices": int(devs.size),
            "processes": args.num_procs,
            "views_per_step": n_views,
            "size": size,
            "s_per_step": round(dt, 5),
            "rays_per_s": round(size * size * n_views / dt, 0),
            "median_of": 3,
            "rep_spread": round(max(reps) / min(reps), 2),
            "trainer": "Stage1Trainer(mesh) fused scan",
        }), flush=True)
    if args.num_procs > 1:
        jax.distributed.shutdown()


def launch_rung(label, procs, devices_per_proc, args):
    """Run one rung as subprocess(es); return proc-0's parsed JSON."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never dial the TPU tunnel
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices_per_proc}"
    ).strip()
    coord = f"127.0.0.1:{args.port}"
    children = []
    for pid in range(procs):
        cmd = [
            sys.executable, os.path.abspath(__file__), "--worker",
            "--num-procs", str(procs), "--proc-id", str(pid),
            "--coordinator", coord, "--size", str(args.size),
            "--steps", str(args.steps), "--num-pts", str(args.num_pts),
            "--capacity", str(args.capacity),
            "--views-per-device", str(args.views_per_device),
            "--platform", "cpu",
        ]
        children.append(subprocess.Popen(
            cmd, env=env, cwd=REPO,
            stdout=subprocess.PIPE if pid == 0 else subprocess.DEVNULL,
            text=True,
        ))
    out, _ = children[0].communicate(timeout=1200)
    for c in children[1:]:
        c.wait(timeout=120)
    assert children[0].returncode == 0, f"{label}: worker 0 failed"
    line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    rec["rung"] = label
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--num-procs", type=int, default=1)
    ap.add_argument("--proc-id", type=int, default=0)
    ap.add_argument("--coordinator", default="127.0.0.1:9911")
    ap.add_argument("--port", type=int, default=9911)
    ap.add_argument("--devices", type=int, default=8,
                    help="devices of the 1-host rung")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--num-pts", type=int, default=1024)
    ap.add_argument("--capacity", type=int, default=2048)
    ap.add_argument("--views-per-device", type=int, default=1)
    ap.add_argument("--platform", choices=("cpu", "default"), default="cpu",
                    help="'default' uses the real backend (TPU pods)")
    args = ap.parse_args()

    if args.worker:
        worker(args)
        return

    r1 = launch_rung("1_device", 1, 1, args)
    rh = launch_rung(f"1_host_{args.devices}dev", 1, args.devices, args)
    rn = launch_rung(f"2_hosts_{args.devices}dev", 2, args.devices // 2, args)
    print(json.dumps({
        "metric": "rays_per_s_scaling",
        "unit": "rays/s",
        "rungs": {r["rung"]: r["rays_per_s"] for r in (r1, rh, rn)},
        "scaling_1_host_vs_1_device": round(
            rh["rays_per_s"] / r1["rays_per_s"], 2
        ),
        "scaling_2_hosts_vs_1_host": round(
            rn["rays_per_s"] / rh["rays_per_s"], 2
        ),
        "note": ("cpu recipe-validation mode; on a TPU pod run per-host "
                 "with --platform=default for the real ICI/DCN numbers"),
    }), flush=True)


if __name__ == "__main__":
    main()
