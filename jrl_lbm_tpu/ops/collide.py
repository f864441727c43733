"""Collision operators: BGK, MRT, KBC (entropic), with axisymmetric sources.

Port of the live code paths of the reference collision layer:
* BGK + axisymmetric Gi: `src/LBM/LBM_collision/LBM_collision_2d.py:343-555`
* MRT moment-matrix relaxation: `LBM_collision_MRT_2d.py:36-184`
* KBC entropic stabiliser: `LBM_collision_KBC_2d.py:28-317`

All operators are pure functions over ``[Q, H, W]`` states. The 9x9 MRT /
KBC moment matrices are applied with an einsum over the Q axis, which XLA
maps onto fused vector ops (Q=9 is far below MXU tile size; the per-cell
work is bandwidth-bound either way).

Known reference quirks replicated on purpose (SURVEY §5):
* the convection-source `elif` in `LBM_collision_2d.py:516-527` repeats
  LINE_X_EQ_0 where LINE_Y_EQ_0 was intended, so LINE_Y_EQ_0 convection
  gets no extra relaxation-rate term;
* `LBMCollision2d.collision` ignores `KBC_type` (BGK always).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from jrl_lbm_tpu import lattice
from jrl_lbm_tpu.ops.equilibrium import feq
from jrl_lbm_tpu.ops.stencil import get_div, get_grad
from jrl_lbm_tpu.utils.types import AxiSymmetricType, CellType, KBCType


# ---------------------------------------------------------------------------
# Axisymmetric source terms
# ---------------------------------------------------------------------------

def axisymmetric_source(
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    flags: jnp.ndarray,
    feq_: jnp.ndarray,
    mesh_grid: jnp.ndarray,
    tau: float,
    axisymmetric_type: int,
    is_convection: bool = False,
    dx: float = 1.0,
    dt: float = 1.0,
    grad_fn=None,
    div_fn=None,
):
    """Gi source term ``[Q, H, W]`` (or scalar 0 when not axisymmetric).

    Port of `LBM_collision_2d.py:343-471` (live branches only).
    ``mesh_grid`` is ``[2, H, W]`` cell-centre coordinates (x, y), already
    offset by +0.5*dx as the demos do. ``grad_fn``/``div_fn`` override the
    stencils (the shard_map path injects halo-aware variants; default is
    the single-device obstacle-aware stencil).
    """
    c = dx / dt
    cs2 = c * c / 3.0
    dtype = rho.dtype
    e = jnp.asarray(lattice.E, dtype=dtype)  # [Q, 2]
    w = jnp.asarray(lattice.W, dtype=dtype)  # [Q]
    ax = int(axisymmetric_type)
    if grad_fn is None:
        grad_fn = lambda a: get_grad(a, flags, dx=dx, axisymmetric_type=ax)
    if div_fn is None:
        div_fn = lambda a: get_div(a, flags, dx=dx, axisymmetric_type=ax)

    if ax == int(AxiSymmetricType.LINE_X_EQ_0):
        r = mesh_grid[0]  # [H, W]; x plays the radial coordinate
        er = e[:, 0][:, None, None]  # [Q, 1, 1]
        ur = vel[0]
        A1 = -rho * ur / r  # [H, W]
        if is_convection:
            # Liu et al. 2017 axisymmetric advection-diffusion source,
            # `LBM_collision_2d.py:382-384`. Weight NOT applied (feq
            # already carries it) — matches the early `return`.
            s = (1.0 - 0.5 / tau) * er / r[None]
            return -(ur / r)[None] * feq_ * (1.0 - 0.5 / tau - 0.5 * s)

        visc = cs2 * (tau - 0.5)
        mu = visc * rho
        pressure = rho * cs2
        grad_u = grad_fn(vel[0])  # [2,H,W]
        grad_v = grad_fn(vel[1])

        A2 = grad_fn(pressure)[0]
        A2 = A2 + div_fn(rho[None] * ur[None] * vel)
        A2 = A2 * (dt / (2.0 * r))

        F2 = (mu / r)[None] * jnp.stack([grad_u[0] - ur / r, grad_v[0]], axis=0)
        F2 = F2 + vel * A1[None]
        F2 = F2 - dt * (tau - 1.0) * cs2 * grad_fn(A1)
        # (F2 . e_q) per direction
        F2e = (
            e[:, 0][:, None, None] * F2[0][None]
            + e[:, 1][:, None, None] * F2[1][None]
        )
        G = A1[None] + A2[None] + F2e / cs2
        return G * w[:, None, None]

    if ax == int(AxiSymmetricType.LINE_Y_EQ_0):
        # `LBM_collision_2d.py:428-469`: r = y - 0.5*dx with row 0 set to 1.
        r = mesh_grid[1] - 0.5 * dx
        r = r.at[0, :].set(1.0)
        ur = vel[1]
        A1 = -rho * ur / r
        if is_convection:
            G = A1[None] * jnp.ones((9, 1, 1), dtype=dtype)
        else:
            visc = cs2 * (tau - 0.5)
            mu = visc * rho
            grad_u = grad_fn(vel[0])
            grad_v = grad_fn(vel[1])
            H1 = (
                mu * (grad_u[1] + grad_v[0]) / r
                - rho * vel[0] * vel[1] / r
            )
            H2 = (
                mu * (grad_v[1] * 2.0) / r
                - 2.0 * mu * vel[1] / (r * r)
                - rho * vel[1] * vel[1] / r
            )
            G = A1[None] + (
                e[:, 0][:, None, None] * H1[None] + e[:, 1][:, None, None] * H2[None]
            ) / cs2
        return G * w[:, None, None]

    return 0.0


# ---------------------------------------------------------------------------
# BGK
# ---------------------------------------------------------------------------

def bgk_collide(
    f: jnp.ndarray,
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    flags: jnp.ndarray,
    tau: float,
    force: jnp.ndarray | None = None,
    mesh_grid: jnp.ndarray | None = None,
    is_convection: bool = False,
    axisymmetric_type: int = 0,
    dx: float = 1.0,
    dt: float = 1.0,
    grad_fn=None,
    div_fn=None,
) -> jnp.ndarray:
    """BGK relaxation f + w (feq - f) + dt Gi, OBSTACLE passthrough.

    Port of `LBM_collision_2d.py:473-555`. ``tau`` is the relaxation time
    of whichever lattice is being collided (the caller passes tau_D for
    the advection-diffusion lattice, mirroring the reference's
    ``is_convection`` switch).
    """
    c = dx / dt
    dtype = f.dtype
    ax = int(axisymmetric_type)
    feq_ = feq(rho, vel, dx=dx, dt=dt, force=force)

    if is_convection and ax == int(AxiSymmetricType.LINE_X_EQ_0):
        # `LBM_collision_2d.py:513-529`: per-direction relaxation rate
        # w = 1/tau + dt (1 - 0.5/tau) e_r / r. (The LINE_Y_EQ_0 elif is
        # unreachable in the reference — quirk §5.3.)
        e = jnp.asarray(lattice.E, dtype=dtype)
        r = mesh_grid[0]
        s = dt * (1.0 - 0.5 / tau) * e[:, 0][:, None, None] / r[None]
        w_rate = 1.0 / tau + s
    else:
        w_rate = 1.0 / tau

    Gi = axisymmetric_source(
        rho, vel, flags, feq_, mesh_grid, tau, ax,
        is_convection=is_convection, dx=dx, dt=dt,
        grad_fn=grad_fn, div_fn=div_fn,
    )

    collided = f + w_rate * (feq_ - f) + dt * Gi
    return jnp.where((flags == int(CellType.OBSTACLE))[None], f, collided)


# ---------------------------------------------------------------------------
# MRT
# ---------------------------------------------------------------------------

def mrt_matrices(tau: float, tau_D: float | None = None):
    """Precompute M^-1 S M for fluid (and optionally convection).

    Port of `LBM_collision_MRT_2d.py:36-82`: s7 = 1/tau,
    s4 = 8(2 - s7)/(8 - s7); the convection matrix uses the reference's
    literal rates [1, 1.1, 1.1, s3, s3, s3, s3, 1.2, 1.2] with s3 = 1/tau_D.
    Returns float64 numpy arrays (cast at use site).
    """
    M = np.array(
        [
            [1, 1, 1, 1, 1, 1, 1, 1, 1],
            [-4, -1, -1, -1, -1, 2, 2, 2, 2],
            [4, -2, -2, -2, -2, 1, 1, 1, 1],
            [0, 1, 0, -1, 0, 1, -1, -1, 1],
            [0, -2, 0, 2, 0, 1, -1, -1, 1],
            [0, 0, 1, 0, -1, 1, 1, -1, -1],
            [0, 0, -2, 0, 2, 1, 1, -1, -1],
            [0, 1, -1, 1, -1, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 1, -1, 1, -1],
        ],
        dtype=np.float64,
    )
    s7 = 1.0 / tau
    s4 = 8.0 * (2.0 - s7) / (8.0 - s7)
    S = np.array([0.0, s7, s7, 0.0, s4, 0.0, s4, s7, s7])
    Minv = np.linalg.inv(M)
    MinvSM = Minv @ (S[:, None] * M)

    MinvSM_conv = None
    if tau_D is not None:
        s3 = 1.0 / tau_D
        S_conv = np.array([1.0, 1.1, 1.1, s3, s3, s3, s3, 1.2, 1.2])
        MinvSM_conv = Minv @ (S_conv[:, None] * M)
    return MinvSM, MinvSM_conv


def mrt_collide(
    f: jnp.ndarray,
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    flags: jnp.ndarray,
    minv_s_m: np.ndarray,
    tau: float,
    force: jnp.ndarray | None = None,
    mesh_grid: jnp.ndarray | None = None,
    is_convection: bool = False,
    axisymmetric_type: int = 0,
    dx: float = 1.0,
    dt: float = 1.0,
) -> jnp.ndarray:
    """MRT collision f + M^-1 S M (feq - f) + dt Gi.

    Port of `LBM_collision_MRT_2d.py:121-184`.
    """
    dtype = f.dtype
    feq_ = feq(rho, vel, dx=dx, dt=dt, force=force)
    A = jnp.asarray(minv_s_m, dtype=dtype)
    # precision='highest' keeps the 9x9 moment contraction in full f32 on
    # TPU (the MXU default would round operands to bf16).
    omega = jnp.einsum("ab,bhw->ahw", A, feq_ - f, precision="highest")
    Gi = axisymmetric_source(
        rho, vel, flags, feq_, mesh_grid, tau, int(axisymmetric_type),
        is_convection=is_convection, dx=dx, dt=dt,
    )
    collided = f + omega + dt * Gi
    return jnp.where((flags == int(CellType.OBSTACLE))[None], f, collided)


# ---------------------------------------------------------------------------
# KBC (entropic)
# ---------------------------------------------------------------------------

# Raw-moment matrix (rows: M00 M10 M01 M20 M11 M02 M21 M12 M22),
# `LBM_collision_KBC_2d.py:38-55`.
KBC_C_MAT = np.array(
    [
        [1, 1, 1, 1, 1, 1, 1, 1, 1],
        [0, 1, 0, -1, 0, 1, -1, -1, 1],
        [0, 0, 1, 0, -1, 1, 1, -1, -1],
        [0, 1, 0, 1, 0, 1, 1, 1, 1],
        [0, 0, 0, 0, 0, 1, -1, 1, -1],
        [0, 0, 1, 0, 1, 1, 1, 1, 1],
        [0, 0, 0, 0, 0, 1, 1, -1, -1],
        [0, 0, 0, 0, 0, 1, -1, -1, 1],
        [0, 0, 0, 0, 0, 1, 1, 1, 1],
    ],
    dtype=np.float64,
)

# Central-moment exponent tables (`LBM_collision_KBC_2d.py:57-68`):
# moment order [00, 10, 01, 20, 11, 02, 21, 12, 22].
KBC_P = np.array([0, 1, 0, 2, 1, 0, 2, 1, 2], dtype=np.int32)
KBC_Q = np.array([0, 0, 1, 0, 1, 2, 1, 2, 2], dtype=np.int32)


def kbc_omega(
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    f: jnp.ndarray,
    feq_: jnp.ndarray,
    tau: float,
    kbc_type: int,
):
    """Entropic collision operator Omega = -beta (2 ds + gamma dh).

    Port of `LBM_collision_KBC_2d.py:70-249`. KBC A/B use per-cell
    central moments (c e - u)^p (c e - u)^q; KBC C/D use raw moments.
    """
    dtype = f.dtype
    kbc = int(kbc_type)
    e = jnp.asarray(lattice.E, dtype=dtype)

    if kbc in (int(KBCType.KBC_A), int(KBCType.KBC_B)):
        c = 1.0  # dx = dt = 1 hardcoded in the reference (:96-98)
        # euev[m, q] basis evaluated per cell: [Qm, Q, H, W]
        du = c * e[:, 0][:, None, None] - vel[0][None]  # [Q, H, W]
        dv = c * e[:, 1][:, None, None] - vel[1][None]
        p = jnp.asarray(KBC_P, dtype=dtype)
        q_ = jnp.asarray(KBC_Q, dtype=dtype)
        basis = jnp.power(du[None], p[:, None, None, None]) * jnp.power(
            dv[None], q_[:, None, None, None]
        )  # [9(moments), 9(dirs), H, W]
        rhoM = jnp.einsum("mqhw,qhw->mhw", basis, f, precision="highest")
        rhoMeq = jnp.einsum("mqhw,qhw->mhw", basis, feq_, precision="highest")
    else:
        C = jnp.asarray(KBC_C_MAT, dtype=dtype)
        rhoM = jnp.einsum("mq,qhw->mhw", C, f, precision="highest")
        rhoMeq = jnp.einsum("mq,qhw->mhw", C, feq_, precision="highest")

    rhoT = rhoM[3] + rhoM[5]
    rhoN = rhoM[3] - rhoM[5]
    rhoPIxy = rhoM[4]
    rhoTeq = rhoMeq[3] + rhoMeq[5]
    rhoNeq = rhoMeq[3] - rhoMeq[5]
    rhoPIxyeq = rhoMeq[4]

    df = f - feq_

    def shear_parts(T, N, PIxy, include_T: bool):
        u, v = vel[0], vel[1]
        if include_T:
            s0 = rho - T
            sp = 0.5 * (0.5 * (T + N))
            sq = 0.5 * (0.5 * (T - N))
        else:
            s0 = rho
            sp = 0.5 * (0.5 * N)
            sq = 0.5 * (0.5 * (-N))
        s1 = sp + 0.5 * rho * u
        s3 = sp - 0.5 * rho * u
        s2 = sq + 0.5 * rho * v
        s4 = sq - 0.5 * rho * v
        s5 = 0.25 * PIxy
        s6 = -0.25 * PIxy
        s7 = 0.25 * PIxy
        s8 = -0.25 * PIxy
        return jnp.stack([s0, s1, s2, s3, s4, s5, s6, s7, s8], axis=0)

    if kbc == int(KBCType.LBGK):
        ds = df
        dh = jnp.zeros_like(f)
    elif kbc in (int(KBCType.KBC_A), int(KBCType.KBC_C)):
        ds = shear_parts(rhoT, rhoN, rhoPIxy, True) - shear_parts(
            rhoTeq, rhoNeq, rhoPIxyeq, True
        )
        dh = df - ds
    elif kbc in (int(KBCType.KBC_B), int(KBCType.KBC_D)):
        ds = shear_parts(rhoT, rhoN, rhoPIxy, False) - shear_parts(
            rhoTeq, rhoNeq, rhoPIxyeq, False
        )
        dh = df - ds
    else:
        raise ValueError(f"unknown KBC type {kbc_type}")

    beta = 1.0 / (2.0 * tau)
    eps = 1e-10
    if kbc == int(KBCType.LBGK):
        gamma = 2.0
    else:
        dsdh = jnp.sum(ds * dh / (feq_ + eps), axis=0)
        dhdh = jnp.sum(dh * dh / (feq_ + eps), axis=0)
        gamma = 1.0 / beta - (2.0 - 1.0 / beta) * (dsdh / (dhdh + eps))
        gamma = gamma[None]

    return -beta * (2.0 * ds + gamma * dh)


def kbc_collide(
    f: jnp.ndarray,
    rho: jnp.ndarray,
    vel: jnp.ndarray,
    flags: jnp.ndarray,
    tau: float,
    kbc_type: int,
    force: jnp.ndarray | None = None,
    mesh_grid: jnp.ndarray | None = None,
    is_convection: bool = False,
    axisymmetric_type: int = 0,
    dx: float = 1.0,
    dt: float = 1.0,
) -> jnp.ndarray:
    """KBC entropic collision (`LBM_collision_KBC_2d.py:251-317`)."""
    feq_ = feq(rho, vel, dx=dx, dt=dt, force=force)
    Gi = axisymmetric_source(
        rho, vel, flags, feq_, mesh_grid, tau, int(axisymmetric_type),
        is_convection=is_convection, dx=dx, dt=dt,
    )
    omega = kbc_omega(rho, vel, f, feq_, tau, kbc_type)
    collided = f + omega + dt * Gi
    return jnp.where((flags == int(CellType.OBSTACLE))[None], f, collided)
