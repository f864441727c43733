"""Signed-distance-field combinators and the JRL tip shapes.

`union_phi_obs` ports `src/LBM/utils/functions.py:4-16` (R-function
blend). The tip SDFs port the per-demo `CalculateObsPhi*` helpers so
scenes can rebuild geometry on-device as a pure function of the
loop-carried tip position (the reference mutates flags on the host each
step, `demo_2d_LBM_JRL_fluid_cylinder.py:204-214`).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def union_phi_obs(phi1: jnp.ndarray, phi2: jnp.ndarray, alpha: float = 0.0) -> jnp.ndarray:
    """Smooth/boolean union of two SDFs (`functions.py:4-16`)."""
    if alpha < 0.0 or alpha > 1.0:
        raise ValueError("alpha should be in the range [0,1].")
    if alpha == 1.0:
        return jnp.minimum(phi1, phi2)
    return (
        1.0
        / (1.0 + alpha)
        * (phi1 + phi2 - jnp.sqrt(phi1 * phi1 + phi2 * phi2 - 2 * alpha * phi1 * phi2))
    )


def cylinder_phi(mesh_grid: jnp.ndarray, center, radius: float) -> jnp.ndarray:
    """Signed distance to a circle (`demo_2d_LBM_cylinder.py:26-40`)."""
    x = mesh_grid[0]
    y = mesh_grid[1]
    cx, cy = center[0], center[1]
    d2 = (x - cx) ** 2 + (y - cy) ** 2 - radius * radius
    return jnp.where(d2 > 0, jnp.sqrt(jnp.abs(d2)), -jnp.sqrt(jnp.abs(d2)))


def jrl_tip_flat(
    mesh_grid: jnp.ndarray, box_center, box_radius: float, res_y: int | None = None
) -> jnp.ndarray:
    """Flat (0-degree) tip: box-corner max SDF plus the top wall.

    Port of `demo_2d_LBM_JRL_fluid_cylinder.py:39-48`. ``res_y`` is the
    GLOBAL domain height; it defaults to the mesh shape but must be
    passed explicitly under shard_map (where the local block is smaller).
    """
    if res_y is None:
        res_y = mesh_grid.shape[-2]
    tx = (mesh_grid[0] - box_center[0]) - box_radius
    ty = (mesh_grid[1] - box_center[1]) - box_radius
    phi = jnp.maximum(tx, ty)
    ty_top = -(mesh_grid[1] - res_y)
    return union_phi_obs(phi, ty_top, alpha=1.0)


def jrl_tip_45degree(
    mesh_grid: jnp.ndarray, box_center, box_radius: float, with_top: bool = True,
    res_y: int | None = None,
) -> jnp.ndarray:
    """45-degree wedge tip (`demo_2d_LBM_JRL_fluid_45degree.py:33-45`)."""
    if res_y is None:
        res_y = mesh_grid.shape[-2]
    x = mesh_grid[0]
    y = mesh_grid[1]
    phi = (y - box_center[1]) - box_radius
    x1 = box_center[0] + box_radius
    y1 = box_center[1] + box_radius
    align = (x + y - (x1 + y1)) / math.sqrt(2.0)
    phi = jnp.maximum(phi, align)
    if with_top:
        phi = union_phi_obs(phi, -(y - res_y), alpha=1.0)
    return phi


def jrl_tip_flat_forC(
    mesh_grid: jnp.ndarray, box_center, box_radius: float, is_negative: bool,
    res_y: int | None = None,
) -> jnp.ndarray:
    """Flat tip for the concentration phase (`demo_2d_LBM_JRL_C_cylinder.py:31-41`)."""
    if res_y is None:
        res_y = mesh_grid.shape[-2]
    tx = (mesh_grid[0] - box_center[0]) - box_radius
    ty = (mesh_grid[1] - box_center[1]) - box_radius
    phi = jnp.maximum(tx, ty)
    if is_negative:
        phi = union_phi_obs(phi, -(mesh_grid[1] - res_y), alpha=1.0)
    return phi


def jrl_tip_45degree_forC(
    mesh_grid: jnp.ndarray, box_center, box_radius: float, is_negative: bool,
    res_y: int | None = None,
) -> jnp.ndarray:
    """45-degree tip for the C phase (`demo_2d_LBM_JRL_C_ethaline.py:31-49`)."""
    if res_y is None:
        res_y = mesh_grid.shape[-2]
    x = mesh_grid[0]
    y = mesh_grid[1]
    phi = (y - box_center[1]) - box_radius
    x1 = box_center[0] + box_radius
    y1 = box_center[1] + box_radius
    align = (x + y - (x1 + y1)) / math.sqrt(2.0)
    phi = jnp.maximum(phi, align)
    if is_negative:
        phi = union_phi_obs(phi, -(y - res_y), alpha=1.0)
    return phi
