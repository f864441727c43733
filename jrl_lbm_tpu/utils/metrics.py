"""Observability: MLUPS accounting, conservation diagnostics, profiler.

The reference has no tracing/metrics beyond tqdm progress bars (SURVEY
§5). This module adds the structured observability layer for the
rebuild: throughput (MLUPS) timers that force device completion (the
remote-tunnel caveat: `block_until_ready` can return early, so timers
fetch a scalar), physical-sanity diagnostics (mass/momentum,
divergence), and thin wrappers over `jax.profiler` for trace capture.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def force_sync(pytree) -> float:
    """Block until the device really finished by fetching a scalar."""
    leaf = jax.tree_util.tree_leaves(pytree)[0]
    return float(jnp.sum(leaf))


@dataclasses.dataclass
class StepTimer:
    """Wall-clock MLUPS meter for a lattice of `cells` sites."""

    cells: int
    steps: int = 0
    elapsed: float = 0.0
    _t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, steps: int, state=None):
        if state is not None:
            force_sync(state)
        self.elapsed += time.perf_counter() - self._t0
        self.steps += steps
        self._t0 = None

    @property
    def mlups(self) -> float:
        if self.elapsed == 0:
            return 0.0
        return self.cells * self.steps / self.elapsed / 1e6

    def report(self) -> Dict[str, float]:
        return {
            "cells": self.cells,
            "steps": self.steps,
            "seconds": round(self.elapsed, 4),
            "mlups": round(self.mlups, 1),
        }


def mass(f: jnp.ndarray) -> jnp.ndarray:
    """Total mass of a distribution array [Q, H, W]."""
    return jnp.sum(f)


def momentum(f: jnp.ndarray) -> jnp.ndarray:
    """Total momentum [2] of a distribution array."""
    mx = jnp.sum(f[1] - f[3] + f[5] - f[6] - f[7] + f[8])
    my = jnp.sum(f[2] - f[4] + f[5] + f[6] - f[7] - f[8])
    return jnp.stack([mx, my])


def divergence_norm(vel: jnp.ndarray) -> jnp.ndarray:
    """L2 norm of the central-difference divergence (incompressibility
    diagnostic on the interior)."""
    du = 0.5 * (vel[0, 1:-1, 2:] - vel[0, 1:-1, :-2])
    dv = 0.5 * (vel[1, 2:, 1:-1] - vel[1, :-2, 1:-1])
    return jnp.sqrt(jnp.mean((du + dv) ** 2))


def field_stats(state) -> Dict[str, float]:
    """Host-side summary of a scene state (finite check + ranges)."""
    out = {}
    for k, v in state.items():
        a = np.asarray(v)
        out[f"{k}_finite"] = bool(np.isfinite(a).all())
        out[f"{k}_min"] = float(a.min())
        out[f"{k}_max"] = float(a.max())
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block (view with
    TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Alias of jax.named_scope for annotating phases inside jit."""
    return jax.named_scope(name)
