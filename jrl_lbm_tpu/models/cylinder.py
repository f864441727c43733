"""Channel flow past a cylinder (inflow/outflow + MRT + curved coupling).

Workload parity with `demo/demo_2d_LBM_cylinder.py:43-202`: an (H, W)
channel with an INFLOW row at y=0 (plug velocity +y), an OUTFLOW row at
y=H-1, OBSTACLE side walls, and a cylinder resolved with the sub-grid
solid-fluid coupling. This is the framework's flagship/benchmark scene
(2048^2 for the MLUPS target, BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from jrl_lbm_tpu import lattice
from jrl_lbm_tpu.ops import collide as _collide
from jrl_lbm_tpu.ops import coupling as _coupling
from jrl_lbm_tpu.ops import macro as _macro
from jrl_lbm_tpu.ops import stream as _stream
from jrl_lbm_tpu.ops.equilibrium import feq
from jrl_lbm_tpu.utils.grid import create_2d_meshgrid
from jrl_lbm_tpu.utils.sdf import cylinder_phi
from jrl_lbm_tpu.utils.types import CellType


@dataclasses.dataclass(frozen=True)
class CylinderConfig:
    res: Tuple[int, int] = (800, 400)  # (H, W)
    Re: float = 5000.0
    Vmax: float = 0.05
    D: float = 20.0  # cylinder diameter in cells
    cylinder_center: Optional[Tuple[float, float]] = None  # (x, y); default (10D, 10D)
    dx: float = 1.0
    dt: float = 1.0
    density: float = 1.0
    contact_angle: float = 0.5 * math.pi
    dtype: object = jnp.float32

    @property
    def tau(self) -> float:
        c = self.dx / self.dt
        cs2 = c * c / 3.0
        visc = self.Vmax * max(self.res) * self.dx / self.Re
        return 0.5 + visc / cs2

    @property
    def center(self) -> Tuple[float, float]:
        if self.cylinder_center is not None:
            return self.cylinder_center
        return (10.0 * self.D, 10.0 * self.D)


def init(cfg: CylinderConfig):
    """Flags/geometry/initial fields; port of `demo_2d_LBM_cylinder.py:109-136`."""
    H, W = cfg.res
    dtype = cfg.dtype
    cx, cy = cfg.center
    if not (0 < cx < W and 0 < cy < H):
        import warnings

        warnings.warn(
            f"cylinder center {cfg.center} lies outside the {H}x{W} domain "
            "(the default center is (10D, 10D) as in the reference demo; "
            "pass cylinder_center= for small grids)",
            stacklevel=2,
        )

    flags = jnp.full((H, W), int(CellType.OBSTACLE), jnp.int32)
    flags = flags.at[1:-1, 1:-1].set(int(CellType.FLUID))
    flags = flags.at[0, 1:-1].set(int(CellType.INFLOW))
    flags = flags.at[-1, 1:-1].set(int(CellType.OUTFLOW))

    mesh = create_2d_meshgrid((H, W), dtype=dtype) + 0.5 * cfg.dx
    phi_obs = cylinder_phi(mesh, cfg.center, cfg.D / 2.0)
    flags = jnp.where(phi_obs <= 0, int(CellType.OBSTACLE), flags)

    inflow_vel = jnp.asarray([0.0, cfg.Vmax], dtype=dtype)
    rho = jnp.full((H, W), cfg.density, dtype)
    vel = jnp.zeros((2, H, W), dtype)
    vel = jnp.where(
        (flags == int(CellType.INFLOW))[None], inflow_vel[:, None, None], vel
    )
    force = jnp.zeros((2, H, W), dtype)
    f = feq(rho, vel, dx=cfg.dx, dt=cfg.dt, force=force)

    state = {"f": f, "rho": rho, "vel": vel}
    fields = {
        "flags": flags,
        "phi_obs": phi_obs,
        "obs_vel": jnp.zeros((2, H, W), dtype),
        "force": force,
        "inflow_vel": inflow_vel,
    }
    return state, fields


def make_step(cfg: CylinderConfig):
    """propagate (inflow/outflow) -> solid-fluid coupling -> macro -> MRT."""
    minv_s_m, _ = _collide.mrt_matrices(cfg.tau)

    def step(state, fields):
        f, rho, vel = state["f"], state["rho"], state["vel"]
        flags = fields["flags"]
        rho, vel, f = _stream.propagate(
            f,
            flags,
            rho=rho,
            vel=vel,
            inflow_density=cfg.density,
            inflow_vel=fields["inflow_vel"],
            dx=cfg.dx,
            dt=cfg.dt,
        )
        f = _coupling.solve_boundary(
            rho, vel, flags, f, fields["phi_obs"], obs_vel=fields["obs_vel"],
            tau=cfg.tau, dx=cfg.dx, dt=cfg.dt,
        )
        rho, vel = _macro.macro_compute(
            f, rho, vel, flags, dx=cfg.dx, dt=cfg.dt, contact_angle=cfg.contact_angle
        )
        f = _collide.mrt_collide(
            f, rho, vel, flags, minv_s_m=minv_s_m, tau=cfg.tau,
            force=fields["force"], dx=cfg.dx, dt=cfg.dt,
        )
        return {"f": f, "rho": rho, "vel": vel}

    return step


def make_runner(cfg: CylinderConfig):
    step = make_step(cfg)

    @partial(jax.jit, static_argnames=("n",))
    def run(state, fields, n: int):
        return jax.lax.fori_loop(0, n, lambda _, s: step(s, fields), state)

    return run


def drag_lift(state, fields, cfg: CylinderConfig, margin: float = 2.0):
    """Force on the cylinder from a control-surface momentum balance.

    At steady state the force equals the net flux of the second moment
    tensor Pi_ab = sum_q f_q e_a e_b (which carries both pressure and
    viscous stress in LBM) through any closed surface around the body:
    F_a = -closed-surface integral of Pi_ab n_b. This is
    scheme-independent (works with the curved-boundary reconstruction,
    where momentum-exchange summation over bounce-back links would not
    apply). An addition over the reference, which reports no forces.
    Returns (Fx, Fy); Cd = Fy / (0.5 rho U^2 D) for the +y channel flow.
    """
    f = state["f"]
    cx, cy = cfg.center
    r = margin * cfg.D
    x0, x1 = int(cx - r), int(cx + r)
    y0, y1 = int(cy - r), int(cy + r)

    e = jnp.asarray(lattice.E, f.dtype)
    # Pi components as [H, W] planes
    pi_xx = jnp.einsum("qhw,q->hw", f, e[:, 0] * e[:, 0], precision="highest")
    pi_xy = jnp.einsum("qhw,q->hw", f, e[:, 0] * e[:, 1], precision="highest")
    pi_yy = jnp.einsum("qhw,q->hw", f, e[:, 1] * e[:, 1], precision="highest")

    # outward normals: top (+y) row y1, bottom (-y) row y0, right (+x)
    # col x1, left (-x) col x0
    fx = -(
        jnp.sum(pi_xy[y1, x0:x1]) - jnp.sum(pi_xy[y0, x0:x1])
        + jnp.sum(pi_xx[y0:y1, x1]) - jnp.sum(pi_xx[y0:y1, x0])
    )
    fy = -(
        jnp.sum(pi_yy[y1, x0:x1]) - jnp.sum(pi_yy[y0, x0:x1])
        + jnp.sum(pi_xy[y0:y1, x1]) - jnp.sum(pi_xy[y0:y1, x0])
    )
    return fx, fy
