"""Checkpoint/resume for whole scene states.

The reference checkpoints ad hoc: `Re_*.h5` (velocity history),
`C_balance*.h5` (C/h), and re-readable Tecplot dumps (SURVEY §5). Those
artifact contracts live in `utils.io`. This module adds general
state-pytree checkpointing for long runs: every array leaf of a scene
state (plus a step counter) round-trips through one HDF5 file, with an
orbax backend when available.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np


def save_state(path: str, state: Dict[str, Any], step: int = 0, **extra):
    """Write a flat dict-of-arrays state + scalars to one HDF5 file."""
    import h5py

    tmp = path + ".tmp"
    with h5py.File(tmp, "w") as h5:
        h5.attrs["step"] = int(step)
        for k, v in extra.items():
            h5.attrs[k] = v
        for k, v in state.items():
            h5.create_dataset(k, data=np.asarray(v))
    os.replace(tmp, path)


def load_state(path: str) -> Tuple[Dict[str, jnp.ndarray], int, Dict[str, Any]]:
    """Read a state back; returns (state, step, extra_attrs)."""
    import h5py

    state = {}
    with h5py.File(path, "r") as h5:
        step = int(h5.attrs.get("step", 0))
        extra = {k: h5.attrs[k] for k in h5.attrs if k != "step"}
        for k in h5:
            state[k] = jnp.asarray(np.asarray(h5[k]))
    return state, step, extra


def save_state_orbax(path: str, state: Dict[str, Any]):
    """Orbax-backed checkpoint (sharded-array aware) when available."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_state_orbax(path: str, like: Dict[str, Any]):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
