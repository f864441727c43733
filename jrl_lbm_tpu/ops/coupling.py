"""Curved-boundary solid-fluid coupling (nonequilibrium reconstruction).

Port of the reference CUDA kernel
(`src/LBM/LBM_solid_fluid_coupling/cuda/solid_fluid_coupling.cu:25-252`):
for every non-OBSTACLE cell (excluding the last row/column) that has at
least one OBSTACLE neighbour whose sub-grid fraction ``t = phi_obs`` lies
in (-eps, 1+eps]:

1. average a target velocity from the upstream fluid neighbours weighted
   by ``t`` and the obstacle velocity: (t u + u_obs)/(t + 1)
   (`solid_fluid_coupling.cu:158-182`), with axis mirroring of the radial
   component on the symmetry axis;
2. target density = sum of this cell's (already streamed/reflected)
   populations plus the moving-wall momentum correction
   6 w_q (e_rev . u_obs) (`:176,198`);
3. velocity-gradient tensor via the isotropic 12-point stencil (`:209-237`);
4. reconstruct the boundary-adjacent populations with the nonequilibrium
   pressure-tensor expansion
   f = w [rho + rho c/cs2 (e.u) + 0.5 Pab (ea eb - cs2 dab)/cs4],
   Pab = rho u u - rho cs2 tau (grad u + grad u^T) (`:238-251`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jrl_lbm_tpu import lattice
from jrl_lbm_tpu.ops.stencil import _at
from jrl_lbm_tpu.utils.types import AxiSymmetricType, CellType


@partial(jax.jit, static_argnames=("axisymmetric_type", "has_obs_vel", "dx", "dt", "tau"))
def _solve_boundary_impl(
    rho, vel, flags, f, phi_obs, obs_vel, tau, axisymmetric_type, has_obs_vel, dx, dt
):
    del rho  # the reference kernel receives rho but never reads it
    axis_x = axisymmetric_type == int(AxiSymmetricType.LINE_X_EQ_0)
    axis_y = axisymmetric_type == int(AxiSymmetricType.LINE_Y_EQ_0)
    H, W = flags.shape
    dtype = f.dtype
    c = dx / dt
    cs2 = c * c / 3.0
    eps = 1e-10

    is_fluid = flags == int(CellType.FLUID)
    is_obs = flags == int(CellType.OBSTACLE)
    obs_mask = is_obs.astype(dtype)

    iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    skip = is_obs | (ix == W - 1) | (iy == H - 1)
    col0 = ix == 0
    row0 = iy == 0

    E = lattice.E
    REFL = lattice.REFLECT
    w_np = lattice.W

    def at(arr, sx, sy):
        return _at(arr, sx, sy, is_fluid, axis_x, axis_y)

    t = phi_obs
    t_ok = (t > -eps) & (t <= 1.0 + eps)

    valid = []
    vel_tgt_x = jnp.zeros((H, W), dtype=dtype)
    vel_tgt_y = jnp.zeros((H, W), dtype=dtype)
    rho_tgt = jnp.sum(f, axis=0)  # sum over reflected dirs == plain sum
    count = jnp.zeros((H, W), dtype=dtype)

    for q in range(9):
        ex, ey = int(E[q, 0]), int(E[q, 1])
        nbr_obs = at(obs_mask, ex, ey) > 0.5  # outcome neighbour is obstacle
        v_q = nbr_obs & t_ok
        valid.append(v_q)
        vmask = v_q.astype(dtype)
        count = count + vmask
        # guard: t == -1 exactly would give 0 * inf = NaN under the mask
        tq = jnp.where(v_q, t, jnp.zeros_like(t))

        # upstream fluid velocity at income position (cell - e_q)
        ux = at(vel[0], -ex, -ey)
        uy = at(vel[1], -ex, -ey)
        if axis_x and q in lattice.AXIS_X_IN:
            ux = jnp.where(col0, -ux, ux)
        if axis_y and q in lattice.AXIS_Y_IN:
            uy = jnp.where(row0, -uy, uy)

        if has_obs_vel:
            obs_ux = at(obs_vel[0], ex, ey)
            obs_uy = at(obs_vel[1], ex, ey)
            vel_tgt_x = vel_tgt_x + vmask * (tq * ux + obs_ux) / (tq + 1.0)
            vel_tgt_y = vel_tgt_y + vmask * (tq * uy + obs_uy) / (tq + 1.0)
            qi = int(REFL[q])
            rho_tgt = rho_tgt + vmask * 6.0 * float(w_np[q]) * (
                float(E[qi, 0]) * obs_ux + float(E[qi, 1]) * obs_uy
            )
        else:
            vel_tgt_x = vel_tgt_x + vmask * tq * ux / (tq + 1.0)
            vel_tgt_y = vel_tgt_y + vmask * tq * uy / (tq + 1.0)

    safe_count = jnp.where(count > 0, count, jnp.ones_like(count))
    u0 = vel_tgt_x / safe_count
    u1 = vel_tgt_y / safe_count

    # velocity-gradient tensor via the 12-point stencil (no obstacle
    # masking, no dx division — matching `solid_fluid_coupling.cu:209-237`)
    def grad12(a):
        gx = (
            4.0 * (at(a, 1, 0) - at(a, -1, 0))
            + (at(a, 1, 1) - at(a, -1, 1))
            + (at(a, 1, -1) - at(a, -1, -1))
        ) / 12.0
        gy = (
            4.0 * (at(a, 0, 1) - at(a, 0, -1))
            + (at(a, 1, 1) - at(a, 1, -1))
            + (at(a, -1, 1) - at(a, -1, -1))
        ) / 12.0
        return gx, gy

    g00, g01 = grad12(vel[0])  # du/dx, du/dy
    g10, g11 = grad12(vel[1])  # dv/dx, dv/dy

    f_new = f
    for q in range(9):
        qi = int(REFL[q])
        e0, e1 = float(E[qi, 0]), float(E[qi, 1])
        pab = (u0 * u0 - cs2 * tau * (g00 + g00)) * (e0 * e0 - cs2)
        pab = pab + (u1 * u0 - cs2 * tau * (g10 + g01)) * (e1 * e0)
        pab = pab + (u0 * u1 - cs2 * tau * (g01 + g10)) * (e0 * e1)
        pab = pab + (u1 * u1 - cs2 * tau * (g11 + g11)) * (e1 * e1 - cs2)
        recon = float(w_np[qi]) * rho_tgt * (
            1.0 + (c / cs2) * (u0 * e0 + u1 * e1) + 0.5 * pab / (cs2 * cs2)
        )
        mask = valid[q] & (~skip)
        f_new = f_new.at[qi].set(jnp.where(mask, recon, f_new[qi]))

    return f_new


def solve_boundary(
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    flags: jnp.ndarray,
    f: jnp.ndarray,
    phi_obs: jnp.ndarray,
    obs_vel: jnp.ndarray | None = None,
    tau: float = 1.0,
    is_convection: bool = False,
    axisymmetric_type: int = 0,
    dx: float = 1.0,
    dt: float = 1.0,
) -> jnp.ndarray:
    """Apply the curved-boundary reconstruction; returns the updated f."""
    del is_convection  # received but unused by the reference kernel's live path
    dtype = f.dtype
    ov = obs_vel if obs_vel is not None else jnp.zeros_like(vel)
    return _solve_boundary_impl(
        rho.astype(dtype) if rho is not None else jnp.zeros(flags.shape, dtype),
        vel,
        flags,
        f,
        phi_obs,
        ov,
        float(tau),
        int(axisymmetric_type),
        obs_vel is not None,
        float(dx),
        float(dt),
    )
