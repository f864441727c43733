"""Grid utilities: meshgrids, staggered (MAC) resampling, droplet seeding.

Port of `src/LBM/utils/grid.py` to the framework's batch-free ``[C, H, W]``
convention (add a leading axis / vmap for batches).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp


def create_2d_meshgrid(
    shape: Sequence[int], dtype=jnp.float32
) -> jnp.ndarray:
    """Cell-index meshgrid ``[2, H, W]`` with channel 0 = x, 1 = y.

    Port of `grid.py:67-82` (integer cell indices; demos add +0.5*dx for
    cell centres).
    """
    H, W = shape[-2], shape[-1]
    y = jnp.arange(H, dtype=dtype)
    x = jnp.arange(W, dtype=dtype)
    ypos, xpos = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([xpos, ypos], axis=0)


def create_3d_meshgrid(shape: Sequence[int], dtype=jnp.float32) -> jnp.ndarray:
    """``[3, D, H, W]`` with channels (x, y, z); port of `grid.py:85-102`."""
    D, H, W = shape[-3], shape[-2], shape[-1]
    z = jnp.arange(D, dtype=dtype)
    y = jnp.arange(H, dtype=dtype)
    x = jnp.arange(W, dtype=dtype)
    zpos, ypos, xpos = jnp.meshgrid(z, y, x, indexing="ij")
    return jnp.stack([xpos, ypos, zpos], axis=0)


def _pad_replicate(a: jnp.ndarray, axis: int) -> jnp.ndarray:
    pad = [(0, 0)] * a.ndim
    pad[axis] = (1, 1)
    return jnp.pad(a, pad, mode="edge")


def get_staggered_x(a: jnp.ndarray) -> jnp.ndarray:
    """Centre -> x-face (MAC) resampling; port of `grid.py:7-21`."""
    mid = 0.5 * (a[..., 1:] + a[..., :-1])
    return _pad_replicate(mid, axis=-1)


def get_staggered_y(a: jnp.ndarray) -> jnp.ndarray:
    """Centre -> y-face resampling; port of `grid.py:24-38`."""
    mid = 0.5 * (a[..., 1:, :] + a[..., :-1, :])
    return _pad_replicate(mid, axis=-2)


def get_staggered(vel: jnp.ndarray) -> List[jnp.ndarray]:
    """Staggered components of ``[2, H, W]`` velocity; `grid.py:52-64`."""
    return [get_staggered_x(vel[0]), get_staggered_y(vel[1])]


def create_droplet_2d(
    droplet_center, droplet_radius: float, rho_liquid: float, rho: jnp.ndarray
) -> jnp.ndarray:
    """Seed a circular droplet of ``rho_liquid``; port of `grid.py:105-123`."""
    mg = create_2d_meshgrid(rho.shape, dtype=rho.dtype)
    center = jnp.asarray(droplet_center, dtype=rho.dtype)[:, None, None]
    dist = jnp.linalg.norm(mg - center, axis=0)
    return jnp.where(dist < droplet_radius, rho_liquid, rho)


def get_staggered_z(a: jnp.ndarray) -> jnp.ndarray:
    """Centre -> z-face resampling for 3D fields; port of `grid.py:41-49`."""
    mid = 0.5 * (a[..., 1:, :, :] + a[..., :-1, :, :])
    return _pad_replicate(mid, axis=-3)


def dot(dim: int, x: jnp.ndarray, y: jnp.ndarray, keep_dim: bool = False):
    """Channel dot product of two [.., dim, *res] fields.

    Port of `grid.py:126-231` for the same-shape case (the e-times-field
    case is :func:`dot_e_vel`).
    """
    axis = -(dim + 1)
    out = jnp.sum(x * y, axis=axis)
    if keep_dim:
        out = jnp.expand_dims(out, axis)
    return out


def dot_e_vel(e: jnp.ndarray, vel: jnp.ndarray) -> jnp.ndarray:
    """(e_q . u) per direction: e [Q, dim], vel [dim, *res] -> [Q, *res].

    Port of `grid.py:234-245` in the framework's batch-free layout.
    """
    dim = vel.shape[0]
    out = e[:, 0].reshape(-1, *([1] * (vel.ndim - 1))) * vel[0][None]
    for d in range(1, dim):
        out = out + e[:, d].reshape(-1, *([1] * (vel.ndim - 1))) * vel[d][None]
    return out


def dot_vel_vel(vel1: jnp.ndarray, vel2: jnp.ndarray, keep_dim: bool = False):
    """u . v over the leading channel axis; port of `grid.py:248-267`
    (without replicating its broken 3D indexing, SURVEY quirk §5.6)."""
    out = jnp.sum(vel1 * vel2, axis=0)
    if keep_dim:
        out = out[None]
    return out
