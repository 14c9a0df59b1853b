"""Worker process for the 2-process jax.distributed test.

Launched by tests/test_multihost.py with a CLEAN environment: the axon
tunnel registration is disabled (PALLAS_AXON_POOL_IPS unset — the
image's sitecustomize only dials the TPU tunnel when it is set), the
platform is CPU with 2 virtual devices per process, and jax.distributed
connects the two processes into one 4-device global mesh.

Runs N deterministic DP train steps over the global 'data' mesh and (on
process 0) writes the final replicated params to an npz for the parent
to compare against a single-process run of the same step stream.

Usage: multihost_worker.py <coordinator> <num_procs> <proc_id> <out.npz>
"""

import sys

import numpy as np


def main() -> None:
    coordinator, num_procs, proc_id, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=proc_id,
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from dreamgaussian_tpu.parallel import make_dp_train_step
    from dreamgaussian_tpu.scene import adam_init, init_random
    from tests.multihost_common import LRS, fake_guidance, make_inputs

    devs = np.array(jax.devices())
    assert devs.size == 4, f"expected 4 global devices, got {devs.size}"
    mesh = Mesh(devs, ("data",))

    params, aux = init_random(
        jax.random.PRNGKey(0), num_pts=128, capacity=256
    )
    adam = adam_init(params)

    step_fn = make_dp_train_step(
        mesh, novel_size=32, ref_size=32, sh_degree=0,
        views_per_device=1, use_known_view=True, warmup_rgb_loss=False,
        lr_schedules=LRS, guidance_fns=((1.0, fake_guidance),),
    )
    known, novel_np, ref_rgb, ref_mask, keys = make_inputs()

    def put(x, spec):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, NamedSharding(mesh, spec), lambda idx: x[idx]
        )

    novel = {k: put(v, P("data")) for k, v in novel_np.items()}
    repl = lambda t: jax.tree.map(lambda x: put(x, P()), t)  # noqa: E731
    params, adam, aux = repl(params), repl(adam), repl(aux)

    losses = []
    for i, key in enumerate(keys):
        params, adam, aux, metrics = step_fn(
            params, adam, aux, jnp.float32(i + 1.0),
            repl(known), novel, put(np.ones(3, np.float32), P()),
            repl(ref_rgb), repl(ref_mask), put(np.asarray(key), P()), {},
        )
        losses.append(float(np.asarray(metrics["loss"].addressable_data(0))))

    if proc_id == 0:
        np.savez(
            out_path,
            xyz=np.asarray(params["xyz"].addressable_data(0)),
            opacity=np.asarray(params["opacity"].addressable_data(0)),
            losses=np.asarray(losses),
        )
        print("[worker0] wrote", out_path, "losses", losses)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
