"""Equilibrium distributions.

Second-order D2Q9 equilibrium with Guo-style half-force velocity shift,
matching the live code path of the reference
(`src/LBM/LBM_collision/LBM_collision_2d.py:236-263`). The reference's
`is_convection` first-order branch is dead (commented out at `:259`);
the full second-order form is used for both the fluid and the
advection-diffusion lattices, as in the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from jrl_lbm_tpu import lattice


def feq(
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    dx: float = 1.0,
    dt: float = 1.0,
    force: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Second-order equilibrium ``[Q, H, W]``.

    Args:
        rho:   ``[H, W]`` density (or concentration ``C``).
        vel:   ``[2, H, W]`` velocity, channel 0 = x.
        force: optional ``[2, H, W]`` body force; applies the half-force
               velocity shift ``u += F/(2*rho)`` (reference `:249-252`,
               zero where ``rho <= 1e-10``).
    """
    dtype = rho.dtype
    c = dx / dt
    cs2 = c * c / 3.0
    if force is not None:
        eps = 1e-10
        shift = jnp.where(rho[None] <= eps, jnp.zeros_like(vel), 0.5 * force / rho[None])
        vel = vel + shift

    e = jnp.asarray(lattice.E, dtype=dtype)  # [Q, 2]
    w = jnp.asarray(lattice.W, dtype=dtype)  # [Q]

    # eu[q] = c * (e_q . u), shape [Q, H, W]
    eu = c * (e[:, 0, None, None] * vel[0][None] + e[:, 1, None, None] * vel[1][None])
    uv = vel[0] * vel[0] + vel[1] * vel[1]  # [H, W]

    rho_w = rho[None] * w[:, None, None]
    out = rho_w * (1.0 + eu / cs2)
    out = out + rho_w * (0.5 * eu * eu / (cs2 * cs2) - 0.5 * uv[None] / cs2)
    return out.astype(dtype)


def geq(
    rho: jnp.ndarray,
    density: jnp.ndarray,
    vel: jnp.ndarray,
    pressure: jnp.ndarray,
    force: jnp.ndarray | None = None,
    feq_: jnp.ndarray | None = None,
    dx: float = 1.0,
    dt: float = 1.0,
) -> jnp.ndarray:
    """Multiphase pressure-equilibrium g^eq.

    Port of `LBM_collision_2d.py:288-306` (exported by the reference but
    unused by its demos; provided for API completeness):
    geq = w (p - cs^2 density) + cs^2 density / rho * feq.
    """
    from jrl_lbm_tpu import lattice

    c = dx / dt
    cs2 = c * c / 3.0
    if feq_ is None:
        feq_ = feq(rho, vel, dx=dx, dt=dt, force=force)
    w = jnp.asarray(lattice.W, dtype=rho.dtype)[:, None, None]
    return w * (pressure - cs2 * density)[None] + (cs2 * density / rho)[None] * feq_


def equation_of_states(rho: jnp.ndarray, dx: float = 1.0, dt: float = 1.0) -> jnp.ndarray:
    """Carnahan-Starling-style EOS (`LBM_collision_2d.py:217-234`)."""
    c = dx / dt
    cs2 = c * c / 3.0
    RT = cs2
    a = 12.0 * RT
    b = 4.0
    tr = b * rho / 4.0
    return (
        rho * RT * (4.0 * tr - 2.0 * tr * tr) / jnp.power(1.0 - tr, 3)
        + rho * RT
        - a * rho * rho
    )
