"""Multi-host initialization + mesh construction.

SURVEY.md §2.3: the reference has no distributed code at all. Here a
multi-host run is standard JAX SPMD: every host calls
``initialize_multihost()`` (jax.distributed under the hood — coordinator
discovery via env or explicit args), then builds the same global mesh;
``shard_map`` collectives ride ICI within a slice and DCN across hosts
automatically. The training loops are already written against global
meshes, so nothing else changes.

Determinism requirement (SURVEY hard-part #5): all hosts must construct
identical camera batches and densify decisions. The trainers keep all
RNG in (seeded numpy, jax.random) state that every host advances
identically, and densify stats are psum'd before thresholding — so
parameters stay bitwise-identical across hosts without any parameter
synchronization traffic.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed (no-op on a single process)."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh_2d(data: int | None = None, tile: int = 1) -> Mesh:
    """Global 2D (data, tile) mesh over all devices of all hosts.

    The data axis is laid out across hosts (gradient psum crosses DCN
    once per step); the tile axis stays within a host so the per-render
    all_gather stays on ICI.
    """
    devs = np.array(jax.devices())
    n = devs.size
    if data is None:
        assert n % tile == 0, (n, tile)
        data = n // tile
    assert data * tile == n, f"{data}x{tile} != {n} devices"
    return Mesh(devs.reshape(data, tile), ("data", "tile"))


def rays_per_second(width: int, height: int, n_views: int,
                    seconds_per_step: float) -> float:
    """The BASELINE.json scaling metric: rays (pixels) rendered/s."""
    return width * height * n_views / seconds_per_step
