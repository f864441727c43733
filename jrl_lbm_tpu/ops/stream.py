"""Streaming (propagation) with flag-based boundary conditions.

TPU-native re-design of the reference streaming kernel
(`src/LBM/LBM_propagation/cuda/propagation.cu:22-488`). Semantics
reproduced per cell type:

* FLUID cells pull-stream periodically; non-FLUID cells use the
  reflect-clamp neighbour rule (``x-1 < 0 -> 1``, ``x+1 >= W -> W-2``)
  (`propagation.cu:84-87`);
* on the axisymmetric symmetry axis the pull neighbour collapses onto the
  axis column/row and the incoming channel is mirrored
  (`propagation.cu:76-83,117-124,136-143`);
* OBSTACLE cells store reflected incoming populations (feeds the
  solid-fluid coupling pass) (`propagation.cu:111-130`);
* populations arriving from an OBSTACLE neighbour use half-way bounce-back
  or, when ``phi_obs`` carries a fraction t in [0,1], sub-grid linear
  interpolation between "previous step" / "this step" / "next step"
  populations (`propagation.cu:151-192`);
* OUTFLOW cells copy all 9 post-stream populations from the adjacent
  interior cell (`propagation.cu:195-255`). The reference reads a
  neighbour's ``f_new`` written by another thread in the same launch (a
  latent ordering hazard, SURVEY §5); here it is an explicit second pass
  over the completed streamed field, which is the behaviour the demos
  rely on;
* INFLOW cells overwrite (rho, u) and set f = feq(rho_in, u_in)
  (`propagation.cu:295-352`); INFLOW_2 sets a rho=1 Dirichlet equilibrium
  (`propagation.cu:354-377`).

Everything is expressed as Q-unrolled `jnp.roll` shifts plus one-line
border fixes, which XLA fuses into a single pass over HBM; there are no
gathers and no data-dependent shapes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jrl_lbm_tpu import lattice
from jrl_lbm_tpu.ops.equilibrium import feq
from jrl_lbm_tpu.utils.types import AxiSymmetricType, CellType


def _pull_x(arr: jnp.ndarray, ex: int, fluid: bool, axis_x: bool) -> jnp.ndarray:
    """Value at x pulled from x - ex along the last axis.

    ``fluid`` selects periodic wrap; otherwise the reference's
    reflect-clamp rule. ``axis_x`` applies the x=0 symmetry-axis override
    (neighbour collapses to column 0) for pulls crossing the axis.
    """
    if ex == 0:
        return arr
    a = jnp.roll(arr, ex, axis=-1)
    if ex == 1:  # pull from x-1; only column 0 differs from wrap
        if axis_x:
            return a.at[..., 0].set(arr[..., 0])
        if not fluid:
            return a.at[..., 0].set(arr[..., 1])
        return a
    # ex == -1: pull from x+1; only the last column differs from wrap
    if not fluid:
        return a.at[..., -1].set(arr[..., -2])
    return a


def _pull_y(arr: jnp.ndarray, ey: int, fluid: bool, axis_y: bool) -> jnp.ndarray:
    """Same as :func:`_pull_x` along the second-to-last axis."""
    if ey == 0:
        return arr
    a = jnp.roll(arr, ey, axis=-2)
    if ey == 1:
        if axis_y:
            return a.at[..., 0, :].set(arr[..., 0, :])
        if not fluid:
            return a.at[..., 0, :].set(arr[..., 1, :])
        return a
    if not fluid:
        return a.at[..., -1, :].set(arr[..., -2, :])
    return a


def _pull(arr, ex, ey, fluid, axis_x, axis_y):
    """Separable 2-D pull: value at (y, x) from (y - ey, x - ex)."""
    return _pull_y(_pull_x(arr, ex, fluid, axis_x), ey, fluid, axis_y)


def _pull_both(arr, ex, ey, is_fluid, axis_x, axis_y):
    """Per-cell select between the FLUID (wrap) and non-FLUID pulls."""
    f_val = _pull(arr, ex, ey, True, axis_x, axis_y)
    s_val = _pull(arr, ex, ey, False, axis_x, axis_y)
    return jnp.where(is_fluid, f_val, s_val)


@partial(
    jax.jit,
    static_argnames=(
        "axisymmetric_type",
        "has_phi_obs",
        "has_rho",
        "has_vel",
        "has_inflow_vel",
        "has_inflow_density",
        "is_convection",
        "dx",
        "dt",
    ),
)
def _propagate_impl(
    f,
    flags,
    phi_obs,
    rho,
    vel,
    inflow_vel,
    inflow_density,
    axisymmetric_type,
    has_phi_obs,
    has_rho,
    has_vel,
    has_inflow_vel,
    has_inflow_density,
    is_convection,
    dx,
    dt,
):
    del is_convection  # the reference kernel's is_convection branches are dead code
    axis_x = axisymmetric_type == int(AxiSymmetricType.LINE_X_EQ_0)
    axis_y = axisymmetric_type == int(AxiSymmetricType.LINE_Y_EQ_0)
    H, W = flags.shape
    dtype = f.dtype

    is_fluid = flags == int(CellType.FLUID)
    is_obs = flags == int(CellType.OBSTACLE)
    obs_mask = is_obs.astype(dtype)  # gatherable obstacle indicator

    col0 = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) == 0
    row0 = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) == 0

    REFL = lattice.REFLECT
    MX = lattice.MIRROR_X
    MY = lattice.MIRROR_Y

    raw_in = [f[0]] + [None] * 8  # raw streamed income per direction
    streamed = [f[0]] + [None] * 8  # income after obstacle-neighbour replacement

    for q in range(1, 9):
        ex, ey = int(lattice.E[q, 0]), int(lattice.E[q, 1])

        # --- raw income value (with axis channel mirroring) ---
        val = _pull_both(f[q], ex, ey, is_fluid, axis_x, axis_y)
        if axis_x and q in lattice.AXIS_X_IN:
            val_m = _pull_both(f[int(MX[q])], ex, ey, is_fluid, axis_x, axis_y)
            val = jnp.where(col0, val_m, val)
        if axis_y and q in lattice.AXIS_Y_IN:
            val_m = _pull_both(f[int(MY[q])], ex, ey, is_fluid, axis_x, axis_y)
            val = jnp.where(row0, val_m, val)
        raw_in[q] = val

        # --- did this population arrive from an OBSTACLE neighbour? ---
        nbr_obs = _pull_both(obs_mask, ex, ey, is_fluid, axis_x, axis_y) > 0.5

        f_this = f[int(REFL[q])]  # half-way bounce-back value
        if not has_phi_obs:
            v_obs = f_this
        else:
            # sub-grid interpolation, propagation.cu:160-190
            f_prev = val
            # "next step" population from the downstream cell (push gather)
            nxt = _pull_both(f[int(REFL[q])], -ex, -ey, is_fluid, axis_x, axis_y)
            if axis_x and q in lattice.AXIS_X_OUT:
                oq = int(MX[q])
                nxt_m = _pull_both(f[int(REFL[oq])], -ex, -ey, is_fluid, axis_x, axis_y)
                nxt = jnp.where(col0, nxt_m, nxt)
            if axis_y and q in lattice.AXIS_Y_OUT:
                oq = int(MY[q])
                nxt_m = _pull_both(f[int(REFL[oq])], -ex, -ey, is_fluid, axis_x, axis_y)
                nxt = jnp.where(row0, nxt_m, nxt)

            t = phi_obs
            t1 = 2.0 * t - 1.0
            v1 = t1 * f_prev + (1.0 - t1) * f_this
            t2 = 2.0 * t
            v2 = t2 * f_this + (1.0 - t2) * nxt
            v_obs = jnp.where(
                (t >= 0.5) & (t <= 1.0),
                v1,
                jnp.where((t >= 0.0) & (t <= 0.5), v2, f_this),
            )

        streamed[q] = jnp.where(nbr_obs, v_obs, val)

    # OBSTACLE cells store reflected incoming populations:
    # f_new[REFL[q]] = raw_in[q]  <=>  f_new[p] = raw_in[REFL[p]].
    out = [f[0]]
    for p in range(1, 9):
        out.append(jnp.where(is_obs, raw_in[int(REFL[p])], streamed[p]))
    f_new = jnp.stack(out, axis=0)

    # --- INFLOW: overwrite (rho, u), f = feq(rho_in, u_in) ---
    rho_out = rho
    vel_out = vel
    in_mask = flags == int(CellType.INFLOW)
    if has_inflow_density:
        rho_in = jnp.full((H, W), inflow_density, dtype=dtype)
    elif has_rho:
        rho_in = rho
    else:
        rho_in = jnp.zeros((H, W), dtype=dtype)

    if has_inflow_vel:
        u_in = jnp.broadcast_to(
            jnp.asarray(inflow_vel, dtype=dtype)[:, None, None], (2, H, W)
        )
    elif has_vel:
        u_in = vel
    else:
        u_in = jnp.zeros((2, H, W), dtype=dtype)

    feq_in = feq(rho_in, u_in, dx=dx, dt=dt)
    f_new = jnp.where(in_mask[None], feq_in, f_new)
    if has_rho and has_inflow_density:
        rho_out = jnp.where(in_mask, rho_in, rho_out)
    if has_vel and has_inflow_vel:
        vel_out = jnp.where(in_mask[None], u_in, vel_out)

    # --- INFLOW_2: rho = 1 Dirichlet equilibrium with the local velocity ---
    in2_mask = flags == int(CellType.INFLOW_2)
    u2 = vel if has_vel else jnp.zeros((2, H, W), dtype=dtype)
    feq_in2 = feq(jnp.ones((H, W), dtype=dtype), u2, dx=dx, dt=dt)
    f_new = jnp.where(in2_mask[None], feq_in2, f_new)
    if has_rho:
        rho_out = jnp.where(in2_mask, jnp.ones((), dtype=dtype), rho_out)

    # --- OUTFLOW: copy all 9 populations from the adjacent interior cell ---
    of_mask = flags == int(CellType.OUTFLOW)
    g = f_new
    g = g.at[:, 0, :].set(g[:, 1, :])
    g = g.at[:, -1, :].set(g[:, -2, :])
    g = g.at[:, :, 0].set(g[:, :, 1])
    g = g.at[:, :, -1].set(g[:, :, -2])
    f_new = jnp.where(of_mask[None], g, f_new)

    return rho_out, vel_out, f_new


def propagate(
    f: jnp.ndarray,
    flags: jnp.ndarray,
    phi_obs: jnp.ndarray | None = None,
    rho: jnp.ndarray | None = None,
    vel: jnp.ndarray | None = None,
    inflow_vel=None,
    inflow_density: float | None = None,
    is_convection: bool = False,
    axisymmetric_type: int = 0,
    dx: float = 1.0,
    dt: float = 1.0,
):
    """Stream ``f`` one step and apply flag boundary conditions.

    Returns ``(rho, vel, f_new)``; ``rho``/``vel`` are passed through
    unchanged except at INFLOW/INFLOW_2 cells (where the reference kernel
    writes them in place, `propagation.cu:295-362`). Callers that did not
    supply ``rho``/``vel`` get them back as ``None``.
    """
    H, W = flags.shape
    dtype = f.dtype
    z2 = jnp.zeros((2, H, W), dtype=dtype)
    rho_arg = rho if rho is not None else jnp.zeros((H, W), dtype=dtype)
    vel_arg = vel if vel is not None else z2
    phi_arg = phi_obs if phi_obs is not None else jnp.zeros((H, W), dtype=dtype)
    iv_arg = (
        jnp.asarray(inflow_vel, dtype=dtype)
        if inflow_vel is not None
        else jnp.zeros((2,), dtype=dtype)
    )
    # The reference treats inflow_density < 0 as "absent" (propagation.cpp
    # passes -1); here absence is static.
    has_inflow_density = inflow_density is not None and inflow_density >= 0

    rho_out, vel_out, f_new = _propagate_impl(
        f,
        flags,
        phi_arg,
        rho_arg,
        vel_arg,
        iv_arg,
        float(inflow_density) if has_inflow_density else -1.0,
        int(axisymmetric_type),
        phi_obs is not None,
        rho is not None,
        vel is not None,
        inflow_vel is not None,
        has_inflow_density,
        bool(is_convection),
        float(dx),
        float(dt),
    )
    return (
        rho_out if rho is not None else None,
        vel_out if vel is not None else None,
        f_new,
    )


def rebounce_obstacle(f: jnp.ndarray, flags: jnp.ndarray) -> jnp.ndarray:
    """Full bounce-back on OBSTACLE cells via channel permutation.

    Port of `LBM_propagation_2d.py:181-186`.
    """
    inverted = f[jnp.asarray(lattice.REFLECT)]
    return jnp.where((flags == int(CellType.OBSTACLE))[None], inverted, f)
