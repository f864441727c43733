"""Multi-host (multi-process) execution: DCN-spanning device meshes.

A TPU pod slice spans multiple hosts; each host's process sees only its
local chips (`jax.local_devices()`), and collectives between processes
ride the data-center network (DCN) instead of ICI. The 2D spatial
decomposition maps onto this hierarchy naturally: stack processes along
the mesh's y axis — the per-step y halo between neighbouring processes
is one row of (f, vel, flags, ...) = O(W) bytes over DCN — and keep the
x axis inside a process, where halos ride ICI.

The reference is single-GPU (`SURVEY.md` §2.3: its only parallelism is
`os.system` batch loops), so this module exceeds parity by design. The
process-spanning path is validated with REAL multi-process meshes
(two processes, Gloo-backed CPU collectives) in tests/test_multihost.py;
on a TPU pod the same code runs unchanged with the auto-detected
coordinator.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from jrl_lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Join the JAX distributed runtime (idempotent per process).

    On TPU pods all arguments are auto-detected from the environment;
    on CPU/GPU clusters pass them explicitly. Must be called before any
    other JAX API touches the backend.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def pod_mesh(rows_per_process: int = 1) -> Mesh:
    """Process-spanning 2D (`dy`, `dx`) mesh with processes stacked
    along `dy`.

    Each process contributes ``rows_per_process`` mesh rows of its local
    devices, so the y halos at process boundaries are the only DCN
    traffic; x halos stay on ICI. Requires every process to have the
    same local device count.
    """
    procs = jax.process_count()
    local = jax.local_device_count()
    if local % rows_per_process:
        raise ValueError(
            f"local device count {local} not divisible by "
            f"rows_per_process={rows_per_process}"
        )
    nx = local // rows_per_process
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    arr = np.array(devs).reshape(procs * rows_per_process, nx)
    return Mesh(arr, (AXIS_Y, AXIS_X))


def lift(tree, sharding_tree):
    """Lift host-replicated full arrays into globally sharded arrays.

    Every process passes the SAME full-size arrays (the usual scene
    init is deterministic, so each host can build them independently);
    each device materialises only its own shard. For domains too large
    to build on one host, construct shards directly instead.
    """

    def one(a, s):
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, s, lambda idx: a[idx])

    return jax.tree.map(one, tree, sharding_tree)


def mesh_shape(mesh: Mesh) -> Tuple[int, int]:
    return tuple(mesh.devices.shape)
