"""Full train-state checkpoint/resume (orbax-backed).

The reference can only save a gaussian PLY — mid-run resume is impossible
because optimizer moments and densification stats are not serialized
(/root/reference/gs_renderer.py:162-194 exists but is never wired to the
CLI; SURVEY.md §5). Here the COMPLETE stage-1 state round-trips: params,
Adam moments+count, alive mask + densify stats, step counter, and both
RNG states, so a resumed run continues bit-exactly.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np
import orbax.checkpoint as ocp


def _tree_to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_stage1(path: str, trainer) -> None:
    """Checkpoint a Stage1Trainer to ``path`` (a directory)."""
    path = os.path.abspath(path)
    state = {
        "params": dict(trainer.params),
        "adam_mu": dict(trainer.adam.mu),
        "adam_nu": dict(trainer.adam.nu),
        "adam_count": trainer.adam.count,
        "aux": {
            "alive": trainer.aux.alive,
            "max_radii2d": trainer.aux.max_radii2d,
            "grad_accum": trainer.aux.grad_accum,
            "denom": trainer.aux.denom,
        },
        "key": trainer.key,
    }
    state = _tree_to_numpy(state)
    # orbax refuses zero-size arrays (e.g. f_rest at sh_degree 0); stash
    # their shapes host-side and rebuild on restore.
    empties = {}

    def strip(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            key = f"{prefix}/{k}"
            if isinstance(v, dict):
                out[k] = strip(v, key)
            elif hasattr(v, "size") and v.size == 0:
                empties[key] = (tuple(v.shape), str(v.dtype))
            else:
                out[k] = v
        return out

    state = strip(state)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)
    # Host-side python state (numpy RNG, step) rides alongside.
    with open(os.path.join(path, "host_state.pkl"), "wb") as f:
        pickle.dump(
            {
                "step": trainer.step,
                "np_rng": trainer.rng.bit_generator.state,
                "empties": empties,
            },
            f,
        )


def restore_stage1(path: str, trainer) -> None:
    """Restore a Stage1Trainer in place from ``path``."""
    import jax.numpy as jnp

    from ..scene.optim import AdamState
    from ..scene.gaussians import GaussianAux

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    state = ckptr.restore(path)
    with open(os.path.join(path, "host_state.pkl"), "rb") as f:
        host = pickle.load(f)
    for key, (shape, dtype) in host.get("empties", {}).items():
        parts = key.strip("/").split("/")
        node = state
        for p_ in parts[:-1]:
            node = node.setdefault(p_, {})
        node[parts[-1]] = np.zeros(shape, dtype)
    trainer.params = {k: jnp.asarray(v) for k, v in state["params"].items()}
    trainer.adam = AdamState(
        mu={k: jnp.asarray(v) for k, v in state["adam_mu"].items()},
        nu={k: jnp.asarray(v) for k, v in state["adam_nu"].items()},
        count=jnp.asarray(state["adam_count"]),
    )
    trainer.aux = GaussianAux(
        alive=jnp.asarray(state["aux"]["alive"]),
        max_radii2d=jnp.asarray(state["aux"]["max_radii2d"]),
        grad_accum=jnp.asarray(state["aux"]["grad_accum"]),
        denom=jnp.asarray(state["aux"]["denom"]),
    )
    trainer.key = jnp.asarray(state["key"])
    trainer.step = host["step"]
    trainer.rng.bit_generator.state = host["np_rng"]
