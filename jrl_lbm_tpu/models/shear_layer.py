"""Doubly-periodic double shear layer scene (BGK or MRT).

Workload parity with `demo/demo_2d_LBM.py` (BGK) and
`demo/demo_2d_LBM_KBC.py` (which, despite its name, constructs the MRT
operator — reference quirk SURVEY §5.4; both are exposed here). The time
loop runs fully on device under `jax.lax.fori_loop`; the host only syncs
at dump cadence.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from jrl_lbm_tpu.ops import collide as _collide
from jrl_lbm_tpu.ops import macro as _macro
from jrl_lbm_tpu.ops import stream as _stream
from jrl_lbm_tpu.utils.types import KBCType
from jrl_lbm_tpu.ops.equilibrium import feq
from jrl_lbm_tpu.utils.types import CellType


@dataclasses.dataclass(frozen=True)
class ShearLayerConfig:
    res: Tuple[int, int] = (130, 130)  # (H, W)
    Re: float = 3000.0
    Vmax: float = 0.2
    KBC_sigma: float = 0.05
    KBC_kappa: float = 80.0
    dx: float = 1.0
    dt: float = 1.0
    density: float = 0.265
    collision: str = "bgk"  # "bgk" | "mrt" | "kbc"
    kbc_type: Optional[int] = None  # only for collision == "kbc"
    contact_angle: float = 0.5 * math.pi
    dtype: object = jnp.float32

    @property
    def tau(self) -> float:
        c = self.dx / self.dt
        cs2 = c * c / 3.0
        visc = self.Vmax * max(self.res) * self.dx / self.Re
        return 0.5 + visc / cs2


def init(cfg: ShearLayerConfig):
    """Initial state; port of `demo_2d_LBM.py:86-99`."""
    H, W = cfg.res
    dtype = cfg.dtype
    flags = jnp.full((H, W), int(CellType.FLUID), jnp.int32)
    rho = jnp.full((H, W), cfg.density, dtype)

    j = jnp.arange(H, dtype=dtype)[:, None]
    i = jnp.arange(W, dtype=dtype)[None, :]
    vy = cfg.KBC_sigma * cfg.Vmax * jnp.sin(2.0 * jnp.pi * (i / W + 0.25))
    vy = jnp.broadcast_to(vy, (H, W))
    vx_lo = cfg.Vmax * jnp.tanh(cfg.KBC_kappa * (j / H - 0.25))
    vx_hi = cfg.Vmax * jnp.tanh(cfg.KBC_kappa * (-j / H + 0.75))
    vx = jnp.broadcast_to(jnp.where(j <= H / 2.0, vx_lo, vx_hi), (H, W))
    vel = jnp.stack([vx, vy], axis=0).astype(dtype)

    force = jnp.zeros((2, H, W), dtype)
    f = feq(rho, vel, dx=cfg.dx, dt=cfg.dt, force=force)
    return {"f": f, "rho": rho, "vel": vel}, {"flags": flags, "force": force}


def make_step(cfg: ShearLayerConfig):
    """One lattice update: propagate -> macro -> collide."""
    if cfg.collision == "mrt":
        minv_s_m, _ = _collide.mrt_matrices(cfg.tau)
    else:
        minv_s_m = None

    def step(state, fields):
        f, rho, vel = state["f"], state["rho"], state["vel"]
        flags = fields["flags"]
        _, _, f = _stream.propagate(f, flags, dx=cfg.dx, dt=cfg.dt)
        rho, vel = _macro.macro_compute(
            f, rho, vel, flags, dx=cfg.dx, dt=cfg.dt, contact_angle=cfg.contact_angle
        )
        if cfg.collision == "bgk":
            f = _collide.bgk_collide(
                f, rho, vel, flags, tau=cfg.tau, force=fields["force"],
                dx=cfg.dx, dt=cfg.dt,
            )
        elif cfg.collision == "mrt":
            f = _collide.mrt_collide(
                f, rho, vel, flags, minv_s_m=minv_s_m, tau=cfg.tau,
                force=fields["force"], dx=cfg.dx, dt=cfg.dt,
            )
        elif cfg.collision == "kbc":
            # default to KBC_A, the variant the reference demo passes
            # (`demo_2d_LBM_KBC.py:102`; ignored there because the demo
            # actually constructs MRT — quirk SURVEY §5.4)
            kbc_type = cfg.kbc_type
            if kbc_type is None:
                kbc_type = int(KBCType.KBC_A)
            f = _collide.kbc_collide(
                f, rho, vel, flags, tau=cfg.tau, kbc_type=kbc_type,
                force=fields["force"], dx=cfg.dx, dt=cfg.dt,
            )
        else:
            raise ValueError(cfg.collision)
        return {"f": f, "rho": rho, "vel": vel}

    return step


def make_runner(cfg: ShearLayerConfig):
    """jitted (state, fields, n) -> state advancing n steps on device."""
    step = make_step(cfg)

    @partial(jax.jit, static_argnames=("n",))
    def run(state, fields, n: int):
        return jax.lax.fori_loop(0, n, lambda _, s: step(s, fields), state)

    return run


def vorticity(state, cfg: ShearLayerConfig):
    return _macro.get_vort(state["vel"], dx=cfg.dx)
