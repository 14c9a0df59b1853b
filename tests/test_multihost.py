"""Multi-host correctness: 2-process jax.distributed == single process.

SURVEY §4 / VERDICT r1 item 7: the DP training step must produce the
same parameters whether the 4-device 'data' mesh lives in one process or
spans two (2 CPU devices each, collectives crossing the process
boundary). The workers run with the axon tunnel registration DISABLED
(PALLAS_AXON_POOL_IPS unset) so multiple JAX processes can coexist —
sitecustomize only dials the TPU tunnel when that variable is set.

The single-process reference runs the SAME step stream on 4 of this
process's virtual devices and must match the workers' result.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env():
    env = dict(os.environ)
    # No axon registration (sitecustomize gates on this), pure CPU.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_two_process_matches_single_process(tmp_path):
    out = str(tmp_path / "worker0.npz")
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(pid), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=540)
        logs.append(stdout.decode())
        assert p.returncode == 0, f"worker failed:\n{stdout.decode()}"
    assert os.path.exists(out), "\n".join(logs)
    two = np.load(out)

    # Single-process reference over 4 of this process's devices.
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from dreamgaussian_tpu.parallel import make_dp_train_step
    from dreamgaussian_tpu.parallel.dp import shard_cameras
    from dreamgaussian_tpu.scene import adam_init, init_random
    from tests.multihost_common import LRS, fake_guidance, make_inputs

    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    params, aux = init_random(jax.random.PRNGKey(0), num_pts=128,
                              capacity=256)
    adam = adam_init(params)
    step_fn = make_dp_train_step(
        mesh, novel_size=32, ref_size=32, sh_degree=0,
        views_per_device=1, use_known_view=True, warmup_rgb_loss=False,
        lr_schedules=LRS, guidance_fns=((1.0, fake_guidance),),
    )
    known, novel_np, ref_rgb, ref_mask, keys = make_inputs()
    novel = shard_cameras(mesh, novel_np)
    losses = []
    for i, key in enumerate(keys):
        params, adam, aux, metrics = step_fn(
            params, adam, aux, jnp.float32(i + 1.0), known, novel,
            jnp.ones(3), ref_rgb, ref_mask, jnp.asarray(key), {},
        )
        losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(losses, two["losses"], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(params["xyz"]), two["xyz"], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["opacity"]), two["opacity"], atol=1e-6
    )
