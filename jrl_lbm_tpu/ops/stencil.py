"""Isotropic D2Q9-weighted finite-difference stencils (grad, div, laplacian).

Port of the reference CUDA stencils
(`src/LBM/LBM_collision/cuda/collision_2d.cu:22-220`) used by the
axisymmetric source terms, and of the pure-torch 9-point laplacian
(`LBM_collision_2d.py:314-341`).

Neighbour rule (collision_2d.cu:69-72): FLUID cells wrap periodically;
non-FLUID cells clamp with ``max(0, i-1)`` / ``min(n-1, i+1)`` (note this
differs from the streaming kernel's reflect-clamp); on the symmetry axis
the negative neighbour collapses onto the axis line.
"""

from __future__ import annotations

import jax.numpy as jnp

from jrl_lbm_tpu.utils.types import AxiSymmetricType, CellType


def _shift_x(arr, sx: int, fluid: bool, axis_x: bool):
    """Value at x taken from x + sx (minmax clamp for non-FLUID cells)."""
    if sx == 0:
        return arr
    a = jnp.roll(arr, -sx, axis=-1)
    if sx == -1:  # from x-1
        if axis_x:
            return a.at[..., 0].set(arr[..., 0])
        if not fluid:
            return a.at[..., 0].set(arr[..., 0])
        return a
    if not fluid:  # from x+1
        return a.at[..., -1].set(arr[..., -1])
    return a


def _shift_y(arr, sy: int, fluid: bool, axis_y: bool):
    if sy == 0:
        return arr
    a = jnp.roll(arr, -sy, axis=-2)
    if sy == -1:
        if axis_y:
            return a.at[..., 0, :].set(arr[..., 0, :])
        if not fluid:
            return a.at[..., 0, :].set(arr[..., 0, :])
        return a
    if not fluid:
        return a.at[..., -1, :].set(arr[..., -1, :])
    return a


def _at(arr, sx, sy, is_fluid, axis_x, axis_y):
    """Per-cell value from offset (sx, sy) with the flag-selected clamp."""
    f_val = _shift_y(_shift_x(arr, sx, True, axis_x), sy, True, axis_y)
    s_val = _shift_y(_shift_x(arr, sx, False, axis_x), sy, False, axis_y)
    return jnp.where(is_fluid, f_val, s_val)


def get_grad(
    rho: jnp.ndarray,
    flags: jnp.ndarray,
    dx: float = 1.0,
    axisymmetric_type: int = 0,
) -> jnp.ndarray:
    """Obstacle-aware isotropic gradient, returns ``[2, H, W]``.

    Port of `collision_2d.cu:22-148`: each direction pair contributes only
    if neither member is an OBSTACLE; if any pair is blocked the whole
    component is zeroed ("no Neumann flux from obstacles"). Output is zero
    at OBSTACLE cells.
    """
    axis_x = int(axisymmetric_type) == int(AxiSymmetricType.LINE_X_EQ_0)
    axis_y = int(axisymmetric_type) == int(AxiSymmetricType.LINE_Y_EQ_0)
    is_fluid = flags == int(CellType.FLUID)
    is_obs = flags == int(CellType.OBSTACLE)
    obs = is_obs.astype(rho.dtype)

    def val(sx, sy):
        return _at(rho, sx, sy, is_fluid, axis_x, axis_y)

    def nbr_obs(sx, sy):
        return _at(obs, sx, sy, is_fluid, axis_x, axis_y) > 0.5

    # x component: pairs (+x,-x), (+x+y,-x+y), (+x-y,-x-y)
    gx = jnp.zeros_like(rho)
    blocked_x = jnp.zeros_like(is_obs)
    p1 = nbr_obs(1, 0) | nbr_obs(-1, 0)
    gx = gx + jnp.where(p1, 0.0, 4.0 * (val(1, 0) - val(-1, 0)))
    blocked_x = blocked_x | p1
    p2 = nbr_obs(1, 1) | nbr_obs(-1, 1)
    gx = gx + jnp.where(p2, 0.0, val(1, 1) - val(-1, 1))
    blocked_x = blocked_x | p2
    p3 = nbr_obs(-1, -1) | nbr_obs(1, -1)
    gx = gx + jnp.where(p3, 0.0, val(1, -1) - val(-1, -1))
    blocked_x = blocked_x | p3
    gx = jnp.where(blocked_x, 0.0, gx)

    # y component: pairs (+y,-y), (+x+y,+x-y), (-x+y,-x-y)
    gy = jnp.zeros_like(rho)
    blocked_y = jnp.zeros_like(is_obs)
    p1 = nbr_obs(0, 1) | nbr_obs(0, -1)
    gy = gy + jnp.where(p1, 0.0, 4.0 * (val(0, 1) - val(0, -1)))
    blocked_y = blocked_y | p1
    p2 = nbr_obs(1, 1) | nbr_obs(1, -1)
    gy = gy + jnp.where(p2, 0.0, val(1, 1) - val(1, -1))
    blocked_y = blocked_y | p2
    p3 = nbr_obs(-1, 1) | nbr_obs(-1, -1)
    gy = gy + jnp.where(p3, 0.0, val(-1, 1) - val(-1, -1))
    blocked_y = blocked_y | p3
    gy = jnp.where(blocked_y, 0.0, gy)

    grad = jnp.stack([gx, gy], axis=0) / (12.0 * dx)
    return jnp.where(is_obs[None], 0.0, grad)


def get_div(
    vel: jnp.ndarray,
    flags: jnp.ndarray,
    dx: float = 1.0,
    axisymmetric_type: int = 0,
) -> jnp.ndarray:
    """Isotropic divergence of ``[2, H, W]`` -> ``[H, W]``.

    Port of `collision_2d.cu:150-220`; zero at OBSTACLE cells, no
    neighbour obstacle masking (matching the reference).
    """
    axis_x = int(axisymmetric_type) == int(AxiSymmetricType.LINE_X_EQ_0)
    axis_y = int(axisymmetric_type) == int(AxiSymmetricType.LINE_Y_EQ_0)
    is_fluid = flags == int(CellType.FLUID)
    is_obs = flags == int(CellType.OBSTACLE)
    u, v = vel[0], vel[1]

    def at(arr, sx, sy):
        return _at(arr, sx, sy, is_fluid, axis_x, axis_y)

    div = 4.0 * (at(u, 1, 0) - at(u, -1, 0))
    div = div + at(u, 1, 1) - at(u, -1, 1)
    div = div + at(u, 1, -1) - at(u, -1, -1)
    div = div + 4.0 * (at(v, 0, 1) - at(v, 0, -1))
    div = div + at(v, 1, 1) - at(v, 1, -1)
    div = div + at(v, -1, 1) - at(v, -1, -1)
    div = div / (12.0 * dx)
    return jnp.where(is_obs, 0.0, div)


def get_laplacian(x: jnp.ndarray, dx: float = 1.0) -> jnp.ndarray:
    """9-point isotropic laplacian, zero on the border.

    Port of `LBM_collision_2d.py:314-341` (flags unused, as in the
    reference).
    """
    lap = (
        4.0 * (x[..., 1:-1, 2:] + x[..., 1:-1, :-2] + x[..., 2:, 1:-1] + x[..., :-2, 1:-1])
        + (x[..., 2:, 2:] + x[..., 2:, :-2] + x[..., :-2, 2:] + x[..., :-2, :-2])
        - 20.0 * x[..., 1:-1, 1:-1]
    ) / (5.0 * dx * dx)
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    return jnp.pad(lap, pad, mode="constant")
