"""Macroscopic moment computation (rho, u, C) and vorticity.

Port of the live PyTorch paths of the reference
(`src/LBM/LBM_macro_compute/LBM_macro_compute_2d.py:237-361`). The
reference's CUDA twins (`macro_compute.cu`) are never called by any demo
(SURVEY §2 N3); the semantics implemented here are the ones the demos
exercise.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from jrl_lbm_tpu.utils.types import CellType


def contact_angle_correctness(
    rho: jnp.ndarray, flags: jnp.ndarray, contact_angle: float
) -> jnp.ndarray:
    """Ghost-density extrapolation on the domain border.

    Port of `LBM_macro_compute_2d.py:237-271`: builds a ``rho_obs`` field
    that is zero everywhere except the outermost ring (extrapolated from
    the adjacent interior line plus a tan(pi/2 - theta) slope term) and
    substitutes it at every OBSTACLE cell — including interior obstacle
    cells, which therefore read density 0 (a reference behaviour the
    cylinder demo relies on; see SURVEY §2 P11).
    """
    tanv = math.tan(math.pi / 2.0 - float(contact_angle))
    rho_obs = jnp.zeros_like(rho)

    # 1. neg x border (column 0)
    hlp = jnp.abs(rho[2:, 1] - rho[:-2, 1])
    rho_obs = rho_obs.at[1:-1, 0].set(rho[1:-1, 2] + tanv * hlp)
    # 2. pos x border (column -1)
    hlp = jnp.abs(rho[2:, -2] - rho[:-2, -2])
    rho_obs = rho_obs.at[1:-1, -1].set(rho[1:-1, -3] + tanv * hlp)
    # 3. neg y border (row 0)
    hlp = jnp.abs(rho[1, 2:] - rho[1, :-2])
    rho_obs = rho_obs.at[0, 1:-1].set(rho[2, 1:-1] + tanv * hlp)
    # 4. pos y border (row -1)
    hlp = jnp.abs(rho[-2, 2:] - rho[-2, :-2])
    rho_obs = rho_obs.at[-1, 1:-1].set(rho[-3, 1:-1] + tanv * hlp)

    # 5. corners (note: the reference's bottom-right corner averages
    # rho_obs[-2,-2] with itself, `LBM_macro_compute_2d.py:269` — kept).
    rho_obs = rho_obs.at[0, 0].set(0.5 * (rho_obs[1, 0] + rho_obs[0, 1]))
    rho_obs = rho_obs.at[-1, 0].set(0.5 * (rho_obs[-2, 0] + rho_obs[-1, 1]))
    rho_obs = rho_obs.at[0, -1].set(0.5 * (rho_obs[0, -2] + rho_obs[1, -1]))
    rho_obs = rho_obs.at[-1, -1].set(0.5 * (rho_obs[-2, -2] + rho_obs[-2, -2]))

    return jnp.where(flags == int(CellType.OBSTACLE), rho_obs, rho)


def macro_compute(
    f: jnp.ndarray,
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    flags: jnp.ndarray,
    dx: float = 1.0,
    dt: float = 1.0,
    contact_angle: float | None = None,
):
    """rho = sum_q f, u = sum_q f e_q c / rho, with OBSTACLE passthrough.

    Port of `LBM_macro_compute_2d.py:316-336` (single-phase path; the
    multiphase density/pressure remap is in :func:`density_remap`).
    """
    c = dx / dt
    dtype = f.dtype
    is_obs = flags == int(CellType.OBSTACLE)

    macro_rho = jnp.sum(f, axis=0)
    rho_new = jnp.where(is_obs, rho, macro_rho)
    if contact_angle is not None:
        rho_new = contact_angle_correctness(rho_new, flags, contact_angle)

    del dtype
    # Unrolled momentum sums: e components are 0/+-1, so these are exact
    # f32 adds on the VPU (an einsum would route through the MXU at
    # reduced bf16 precision on TPU).
    mom_x = f[1] - f[3] + f[5] - f[6] - f[7] + f[8]
    mom_y = f[2] - f[4] + f[5] + f[6] - f[7] - f[8]
    # Guard the division: interior OBSTACLE cells can carry rho == 0 after
    # the contact-angle substitution; their velocity is replaced below.
    safe_rho = jnp.where(rho_new == 0, jnp.ones_like(rho_new), rho_new)
    vel_new = jnp.stack([mom_x, mom_y], axis=0) * (c / safe_rho)[None]
    vel_new = jnp.where(is_obs[None], vel, vel_new)

    return rho_new, vel_new


def macro_compute_C(
    h: jnp.ndarray,
    C: jnp.ndarray,
    flags: jnp.ndarray,
) -> jnp.ndarray:
    """C = sum_q h with OBSTACLE passthrough.

    Port of `LBM_macro_compute_2d.py:273-295`. The axisymmetric
    1/(1 + 0.5 dt u_r / r) correction is commented out in the reference
    (`:284-291`) and therefore not applied here either.
    """
    macro_C = jnp.sum(h, axis=0)
    return jnp.where(flags == int(CellType.OBSTACLE), C, macro_C)


def density_remap(
    rho: jnp.ndarray,
    density_liquid: float,
    density_gas: float,
    rho_liquid: float,
    rho_gas: float,
) -> jnp.ndarray:
    """Multiphase density remap (`LBM_macro_compute_2d.py:338-345`)."""
    return density_gas + (density_liquid - density_gas) * (
        (rho - rho_gas) / (rho_liquid - rho_gas)
    )


def get_pressure(density: jnp.ndarray, dx: float = 1.0, dt: float = 1.0) -> jnp.ndarray:
    """Carnahan-Starling-style EOS pressure (`LBM_macro_compute_2d.py:177-195`)."""
    c = dx / dt
    cs2 = c * c / 3.0
    RT = cs2
    a = 12.0 * RT
    b = 4.0
    td = b * density / 4.0
    return (
        density * RT * td * (4.0 - 2.0 * td) / jnp.power(1.0 - td, 3)
        - a * density * density
        + density * RT
    )


def get_vort(vel: jnp.ndarray, dx: float = 1.0) -> jnp.ndarray:
    """Central-difference vorticity with replicate-padded border.

    Port of `LBM_macro_compute_2d.py:353-361`; returns ``[H, W]``.
    """
    vort = (
        (vel[0, 2:, 1:-1] - vel[0, :-2, 1:-1])
        - (vel[1, 1:-1, 2:] - vel[1, 1:-1, :-2])
    ) / (2.0 * dx)
    return jnp.pad(vort, ((1, 1), (1, 1)), mode="edge")
