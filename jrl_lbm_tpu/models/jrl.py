"""JRL tip-approach workloads: axisymmetric fluid phase + concentration phase.

Workload parity with `demo/demo_2d_LBM_JRL_fluid_*.py` and
`demo/demo_2d_LBM_JRL_C_*.py` (shapes: flat tip / "cylinder", 45-degree
wedge, infinite plane, ethaline refinement variant). The reference
mutates flags/velocity on the host every step as the tip walks
(`demo_2d_LBM_JRL_fluid_cylinder.py:204-214`); here geometry is a pure
function of the loop-carried step index, so whole stretches of the time
loop run on device under `lax.fori_loop` and the host only syncs at
snapshot/record instants.

Unit conversion, parameters, and file contracts (Re_*.h5 with dataset
"vel"; C_balance*.h5 with "C" and "h"; record/balance txt column layout)
follow the reference demos line by line — see the per-function docstrings.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jrl_lbm_tpu.ops import collide as _collide
from jrl_lbm_tpu.ops import coupling as _coupling
from jrl_lbm_tpu.ops import macro as _macro
from jrl_lbm_tpu.ops import stream as _stream
from jrl_lbm_tpu.ops.equilibrium import feq
from jrl_lbm_tpu.utils.grid import create_2d_meshgrid
from jrl_lbm_tpu.utils import sdf as _sdf
from jrl_lbm_tpu.utils.types import AxiSymmetricType, CellType

FLAT_SHAPES = ("cylinder", "infiniteplane")
WEDGE_SHAPES = ("45degree", "ethaline")


# ---------------------------------------------------------------------------
# Fluid phase
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class JRLFluidConfig:
    """Parameters of `demo_2d_LBM_JRL_fluid_*.py:51-136` (dx = dt = 1)."""

    res: Tuple[int, int] = (128, 64)  # (H, W)
    Re: float = 1e-4
    vel_obs_real: float = 28e-6
    gravity_strength_real: float = -9.8
    Rg: float = 4.0
    shape: str = "cylinder"  # cylinder | 45degree | infiniteplane | ethaline
    refine: int = 1
    dtype: object = jnp.float32

    # fixed lattice constants (`fluid_cylinder:66-91`)
    tau: float = 1.0
    density_fluid: float = 1.0
    radius_obs_real: float = 1.25e-5

    def __post_init__(self):
        if self.shape not in FLAT_SHAPES + WEDGE_SHAPES:
            raise ValueError(f"unknown tip shape {self.shape}")

    @property
    def eff_res(self) -> Tuple[int, int]:
        if self.shape == "ethaline":
            return (self.res[0] * self.refine, self.res[1] * self.refine)
        return self.res

    @property
    def radius_obs(self) -> float:
        mult = self.refine if self.shape == "ethaline" else 1
        return mult * 6 + 0.50000000000001

    @property
    def inflow_height(self) -> float:
        base = 20 if self.shape in FLAT_SHAPES else 40
        mult = self.refine if self.shape == "ethaline" else 1
        return mult * (base + 0.50000000000001)

    @property
    def inflow_height_int(self) -> int:
        return int(self.inflow_height + 0.5)

    @property
    def visc(self) -> float:
        return (1.0 / 3.0) * (self.tau - 0.5)

    @property
    def vel_obs(self) -> float:
        return self.Re * self.visc / self.radius_obs

    @property
    def gravity_strength(self) -> float:
        # Froude similarity (`fluid_cylinder:90`)
        return (
            self.gravity_strength_real
            / (self.vel_obs_real**2 / self.radius_obs_real)
            * (self.vel_obs**2 / self.radius_obs)
        )

    @property
    def dt_real(self) -> float:
        return (1.0 * self.vel_obs / self.radius_obs) / (
            self.vel_obs_real / self.radius_obs_real
        )

    @property
    def Rg_radius(self) -> int:
        return int(self.Rg * self.radius_obs + 0.5)

    @property
    def total_steps(self) -> int:
        return int((self.eff_res[0] - 1 - self.inflow_height_int) / self.vel_obs)

    @property
    def box_radius(self) -> float:
        return self.Rg_radius + 100.0


def _tip_phi(cfg, mesh, walks):
    """Tip SDF as a function of the walk position (lattice units).

    The global domain height is passed explicitly so this stays correct
    when ``mesh`` is a shard-local block under shard_map.
    """
    box_center_x = cfg.Rg_radius - cfg.box_radius
    box_center_y = walks - cfg.box_radius
    res_y = cfg.eff_res[0]
    if cfg.shape in FLAT_SHAPES:
        return _sdf.jrl_tip_flat(
            mesh, (box_center_x, box_center_y), cfg.box_radius, res_y=res_y
        )
    return _sdf.jrl_tip_45degree(
        mesh, (box_center_x, box_center_y), cfg.box_radius, res_y=res_y
    )


def fluid_base_flags(cfg: JRLFluidConfig) -> jnp.ndarray:
    """Domain flags before tip marking (`fluid_cylinder:161-165`)."""
    H, W = cfg.eff_res
    flags = jnp.full((H, W), int(CellType.OUTFLOW), jnp.int32)
    flags = flags.at[1:-1, 1:-1].set(int(CellType.FLUID))
    flags = flags.at[:, 0].set(int(CellType.FLUID))  # symmetry axis column
    flags = flags.at[-1, :].set(int(CellType.OBSTACLE))  # top wall
    return flags


def fluid_init(cfg: JRLFluidConfig):
    """Initial fields (`fluid_cylinder:141-195`)."""
    H, W = cfg.eff_res
    dtype = cfg.dtype
    flags0 = fluid_base_flags(cfg)
    mesh = create_2d_meshgrid((H, W), dtype=dtype) + 0.5

    iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    block0 = (iy < cfg.inflow_height_int) & (ix < cfg.Rg_radius)
    flags_init = jnp.where(block0, int(CellType.OBSTACLE), flags0)

    rho = jnp.where(
        flags_init == int(CellType.OBSTACLE),
        jnp.asarray(1.0, dtype),  # density_wall
        jnp.asarray(cfg.density_fluid, dtype),
    )
    gravity = jnp.asarray([0.0, -cfg.gravity_strength], dtype)[:, None, None]
    force = rho[None] * gravity
    vel = jnp.zeros((2, H, W), dtype)
    f = feq(rho, vel, force=force)

    state = {"f": f, "rho": rho, "vel": vel}
    fields = {"base_flags": flags0, "mesh": mesh, "force": force}
    return state, fields


def make_fluid_step(cfg: JRLFluidConfig):
    """One fluid step as a pure function of (state, fields, step_idx)."""
    H, W = cfg.eff_res
    dtype = cfg.dtype
    vel_obs = cfg.vel_obs
    ax = int(AxiSymmetricType.LINE_X_EQ_0)

    def step(state, fields, step_idx):
        f, rho, vel = state["f"], state["rho"], state["vel"]
        walks = cfg.inflow_height + step_idx.astype(dtype) * vel_obs
        walks_int = jnp.floor(walks + 0.5).astype(jnp.int32)
        mesh = fields["mesh"]
        phi = _tip_phi(cfg, mesh, walks)

        iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

        if cfg.shape in FLAT_SHAPES:
            # `fluid_cylinder:204-214`: rectangular tip block
            tip = (iy < walks_int) & (ix < cfg.Rg_radius)
            obs_vel = jnp.stack(
                [jnp.zeros((H, W), dtype), jnp.where(tip, vel_obs, 0.0).astype(dtype)]
            )
            flags = jnp.where(tip, int(CellType.OBSTACLE), fields["base_flags"])
            vel = jnp.stack(
                [jnp.where(tip, 0.0, vel[0]), jnp.where(tip, vel_obs, vel[1])]
            ).astype(dtype)
        else:
            # `fluid_ethaline:203-220`: obstacle = phi <= 0, top row excluded
            # from the moving velocity
            is_obs = phi <= 0
            obs_v = jnp.stack(
                [
                    jnp.zeros((H, W), dtype),
                    jnp.where(is_obs, vel_obs, 0.0).astype(dtype),
                ]
            )
            obs_vel = obs_v.at[:, -1, :].set(0.0)
            flags = jnp.where(is_obs, int(CellType.OBSTACLE), fields["base_flags"])
            vel = jnp.where(is_obs[None], obs_vel, vel)

        _, _, f = _stream.propagate(
            f, flags, phi_obs=phi, rho=rho, vel=vel, axisymmetric_type=ax
        )
        f = _coupling.solve_boundary(
            rho, vel, flags, f, phi, obs_vel=obs_vel, tau=cfg.tau,
            axisymmetric_type=ax,
        )
        rho, vel = _macro.macro_compute(f, rho, vel, flags, contact_angle=None)
        f = _collide.bgk_collide(
            f, rho, vel, flags, tau=cfg.tau, force=fields["force"],
            mesh_grid=mesh, axisymmetric_type=ax,
        )
        return {"f": f, "rho": rho, "vel": vel}

    return step


def make_fluid_runner(cfg: JRLFluidConfig):
    step = make_fluid_step(cfg)

    @partial(jax.jit, static_argnames=("n",))
    def run(state, fields, start_step, n: int):
        def body(i, s):
            return step(s, fields, start_step + i)

        return jax.lax.fori_loop(0, n, body, state)

    return run


def fluid_record_steps(cfg: JRLFluidConfig, x_interval: float = 0.1):
    """Steps at which the reference snapshots the velocity field.

    `fluid_cylinder:239-251`: a snapshot is taken when
    int(step * vel_obs / x_interval) increments, interpolated between the
    post-step fields of the previous and current step.
    """
    v = cfg.vel_obs
    steps = []
    prev = 0
    for s in range(1, cfg.total_steps):
        b = int(s * v / x_interval)
        if b > prev:
            steps.append(s)
            prev = b
    return steps


def _pick_fluid_runner(cfg: JRLFluidConfig):
    """Fused kernel on TPU: VMEM-resident whole-loop kernel when the grid
    fits (`ops/pallas/fused_jrl.py`, ~5x at 128x64), row-tiled two-kernel
    step otherwise (`ops/pallas/fused_jrl_tiled.py`, ~140x over the jnp
    path at refine 8 = 1024x512); jnp path on CPU or with JRL_FUSED=0.
    """
    import os

    if os.environ.get("JRL_FUSED", "1") != "0":
        try:
            import jax as _jax

            from jrl_lbm_tpu.ops.pallas import fused_jrl

            if _jax.devices()[0].platform != "cpu":
                if fused_jrl.fits_vmem(cfg):
                    return fused_jrl.make_fused_fluid_runner(cfg), True
                from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled

                if cfg.eff_res[0] % 8 == 0:
                    return fused_jrl_tiled.make_tiled_fluid_runner(cfg), True
        except Exception:
            pass
    return make_fluid_runner(cfg), False


def run_fluid_phase(cfg: JRLFluidConfig, progress: bool = False):
    """Full fluid phase; returns the normalized velocity history [N,2,H,W].

    Mirrors the `demo_2d_LBM_JRL_fluid_*` main loop including the
    two-frame interpolation of each snapshot.
    """
    state, fields = fluid_init(cfg)
    run, fused = _pick_fluid_runner(cfg)
    if fused:
        one = lambda s, i: run(s, fields, i, 1)  # noqa: E731
    else:
        step_fn = make_fluid_step(cfg)
        one = jax.jit(lambda s, i: step_fn(s, fields, i))

    x_interval = 0.1
    v = cfg.vel_obs
    records = fluid_record_steps(cfg, x_interval)
    snapshots = []
    cur = 0
    it = records
    if progress:
        from tqdm import tqdm

        it = tqdm(records)
    for s in it:
        # reference iteration s records AFTER its update, interpolating
        # with the pre-update velocity (`fluid_cylinder:216,239-250`)
        if s - cur > 0:
            state = run(state, fields, jnp.asarray(cur, jnp.int32), s - cur)
            cur = s
        vel_prev = state["vel"]
        state = one(state, jnp.asarray(cur, jnp.int32))
        cur += 1
        x_comp = s * v
        b = int(x_comp / x_interval)
        t1 = x_comp / x_interval - b
        t2 = b - (s - 1) * v / x_interval
        h5_vel = (state["vel"] * t2 + vel_prev * t1) / (t2 + t1) / v
        snapshots.append(np.asarray(h5_vel))
    if cfg.total_steps - cur > 0:
        state = run(state, fields, jnp.asarray(cur, jnp.int32), cfg.total_steps - cur)
    return np.stack(snapshots, axis=0) if snapshots else np.zeros((0, 2) + cfg.eff_res), state


# ---------------------------------------------------------------------------
# Concentration phase
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class JRLCConfig:
    """Parameters of `demo_2d_LBM_JRL_C_*.py:52-123` (dx = dt = 1)."""

    res: Tuple[int, int] = (128, 64)
    balance_time: float = 600.0
    Re: float = 1e-4
    Pe: float = 0.01
    vel_obs_real: float = 21e-6
    gravity_strength_real: float = -9.8
    Rg: float = 4.0
    shape: str = "ethaline"
    refine: int = 1
    is_negative: bool = True
    dtype: object = jnp.float32
    radius_obs_real: float = 1.25e-5

    def __post_init__(self):
        if self.shape not in FLAT_SHAPES + WEDGE_SHAPES:
            raise ValueError(f"unknown tip shape {self.shape}")

    @property
    def eff_res(self) -> Tuple[int, int]:
        if self.shape == "ethaline":
            return (self.res[0] * self.refine, self.res[1] * self.refine)
        return self.res

    @property
    def radius_obs(self) -> float:
        mult = self.refine if self.shape == "ethaline" else 1
        return mult * 6 + 0.50000000000001

    @property
    def radius_obs_int(self) -> int:
        return int(self.radius_obs + 0.5)

    @property
    def inflow_height(self) -> float:
        base = 20 if self.shape in FLAT_SHAPES else 40
        mult = self.refine if self.shape == "ethaline" else 1
        return mult * (base + 0.50000000000001)

    @property
    def inflow_height_int(self) -> int:
        return int(self.inflow_height + 0.5)

    @property
    def tau_D(self) -> float:
        # Pe -> (vel_obs_conv, tau_D) with u capped at 0.1 (`C_ethaline:96-102`)
        cs2 = 1.0 / 3.0
        tau_D = 1.0
        D = cs2 * (tau_D - 0.5)
        v = self.Pe * D / self.radius_obs
        if v > 0.1:
            v = 0.1
            D = v * self.radius_obs / self.Pe
            tau_D = 0.5 + D / cs2
        return tau_D

    @property
    def vel_obs_conv(self) -> float:
        cs2 = 1.0 / 3.0
        v = self.Pe * cs2 * 0.5 / self.radius_obs
        return min(v, 0.1)

    @property
    def D_coeff(self) -> float:
        return (1.0 / 3.0) * (self.tau_D - 0.5)

    @property
    def dt_conv_real(self) -> float:
        return (1.0 * self.vel_obs_conv / self.radius_obs) / (
            self.vel_obs_real / self.radius_obs_real
        )

    @property
    def Rg_radius(self) -> int:
        return int(self.Rg * self.radius_obs + 0.5)

    @property
    def total_steps(self) -> int:
        return int((self.eff_res[0] - 1 - self.inflow_height_int) / self.vel_obs_conv)

    @property
    def balance_steps(self) -> int:
        return int(self.balance_time / self.dt_conv_real)

    @property
    def box_radius(self) -> float:
        return self.Rg_radius + 100.0

    @property
    def clamp_C(self) -> bool:
        # flat/IP variants clamp C to [0,1] (`C_cylinder:324`); the
        # 45degree/ethaline variants do not (`C_ethaline:337`)
        return self.shape in FLAT_SHAPES

    @property
    def area_array(self) -> np.ndarray:
        """Annulus areas pi (r_{i+1}^2 - r_i^2) (`C_ethaline:189-192`)."""
        r = np.arange(self.radius_obs_int + 1, dtype=np.float64)
        a = math.pi * r * r
        return (a[1:] - a[:-1]).astype(np.float32)


def c_base_flags(cfg: JRLCConfig) -> jnp.ndarray:
    """Domain flags before tip marking (`C_ethaline:166-173`)."""
    H, W = cfg.eff_res
    flags = jnp.full((H, W), int(CellType.OUTFLOW), jnp.int32)
    flags = flags.at[1:-1, 1:-1].set(int(CellType.FLUID))
    flags = flags.at[:, 0].set(int(CellType.FLUID))  # symmetry axis
    # top row
    flags = flags.at[-1, :].set(
        int(CellType.OBSTACLE) if cfg.is_negative else int(CellType.INFLOW_2)
    )
    # right column (rows :-1): variant-dependent (`C_ethaline:170` vs
    # `C_cylinder:158`)
    if cfg.shape in FLAT_SHAPES:
        right = int(CellType.INFLOW_2)
    else:
        right = int(CellType.INFLOW_2) if cfg.is_negative else int(CellType.OUTFLOW)
    flags = flags.at[:-1, -1].set(right)
    # bottom reservoir outside the platform
    flags = flags.at[0, cfg.Rg_radius :].set(int(CellType.INFLOW_2))
    return flags


def _c_tip_phi(cfg: JRLCConfig, mesh, walks):
    box_center = (cfg.Rg_radius - cfg.box_radius, walks - cfg.box_radius)
    res_y = cfg.eff_res[0]
    if cfg.shape in FLAT_SHAPES:
        return _sdf.jrl_tip_flat_forC(
            mesh, box_center, cfg.box_radius, cfg.is_negative, res_y=res_y
        )
    return _sdf.jrl_tip_45degree_forC(
        mesh, box_center, cfg.box_radius, cfg.is_negative, res_y=res_y
    )


def _c_flags_at(cfg: JRLCConfig, base_flags, mesh, walks, walks_int, strict: bool):
    """Flags with the tip marked at the given walk position.

    ``strict`` selects phi < 0 (approach, `C_ethaline:302`) vs phi <= 0
    (balance, `C_ethaline:218`). Flat variants use the rectangular block
    (`C_cylinder:206`).
    """
    H, W = cfg.eff_res
    iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    if cfg.shape in FLAT_SHAPES:
        obs = (iy < walks_int) & (ix < cfg.Rg_radius)
    else:
        phi = _c_tip_phi(cfg, mesh, walks)
        obs = (phi < 0) if strict else (phi <= 0)
        # the initial rectangular tip block stays marked (`C_ethaline:172`);
        # it is contained in phi<=0 for all walks but kept explicit for the
        # strict< case at the boundary
        obs = obs | ((iy < cfg.inflow_height_int) & (ix < cfg.Rg_radius))
    flags = jnp.where(obs, int(CellType.OBSTACLE), base_flags)
    # tip head row = INFLOW (C=0 sink), `C_ethaline:220,303`
    head = (iy == walks_int - 1) & (ix < cfg.radius_obs_int)
    flags = jnp.where(head, int(CellType.INFLOW), flags)
    return flags


def c_init(cfg: JRLCConfig):
    """Initial C lattice (`C_ethaline:147-221`)."""
    H, W = cfg.eff_res
    dtype = cfg.dtype
    base = c_base_flags(cfg)
    mesh = create_2d_meshgrid((H, W), dtype=dtype) + 0.5
    walks = cfg.inflow_height
    walks_int = cfg.inflow_height_int
    flags = _c_flags_at(cfg, base, mesh, walks, walks_int, strict=False)
    C = jnp.ones((H, W), dtype)
    C = jnp.where(flags == int(CellType.OBSTACLE), 0.0, C).astype(dtype)
    h = feq(C, jnp.zeros((2, H, W), dtype))
    fields = {"base_flags": base, "mesh": mesh}
    return {"C": C, "h": h}, fields, flags


def make_balance_step(cfg: JRLCConfig, flags):
    """Balance-phase step: zero velocity, fixed flags (`C_ethaline:230-253`)."""
    H, W = cfg.eff_res
    dtype = cfg.dtype
    ax = int(AxiSymmetricType.LINE_X_EQ_0)

    def step(state, fields):
        C, h = state["C"], state["h"]
        zero_vel = jnp.zeros((2, H, W), dtype)
        C, _, h = _stream.propagate(
            h, flags, rho=C, vel=zero_vel, is_convection=True,
            inflow_density=0.0, axisymmetric_type=ax,
        )
        C = _macro.macro_compute_C(h, C, flags)
        h = _collide.bgk_collide(
            h, C, zero_vel, flags, tau=cfg.tau_D, mesh_grid=fields["mesh"],
            is_convection=True, axisymmetric_type=ax,
        )
        return {"C": C, "h": h}

    return step


def make_approach_step(cfg: JRLCConfig, parametrized: bool = False):
    """Approach-phase step over (state, fields, step_idx).

    ``fields`` must contain ``vel_field`` [N, 2, H, W] (the normalized
    fluid history from the fluid phase). Returns the new state plus the
    per-step inflow/current integrals (`C_ethaline:294-385`).

    With ``parametrized=True``, ``fields`` must additionally carry traced
    scalars ``vel_obs_conv`` and ``tau_D`` which override the config
    values — this is what lets the Pe-sweep layer vmap one compiled step
    over many Pe lanes (each Pe only changes these two scalars plus the
    trip count; `C_ethaline:96-103`).
    """
    H, W = cfg.eff_res
    dtype = cfg.dtype
    ax = int(AxiSymmetricType.LINE_X_EQ_0)
    rint = cfg.radius_obs_int
    x_interval = 0.1

    def step(state, fields, step_idx):
        if parametrized:
            v = fields["vel_obs_conv"]
            tau_D = fields["tau_D"]
        else:
            v = cfg.vel_obs_conv
            tau_D = cfg.tau_D
        C, h = state["C"], state["h"]
        mesh = fields["mesh"]
        walks = cfg.inflow_height + step_idx.astype(dtype) * v
        walks_int = jnp.floor(walks + 0.5).astype(jnp.int32)
        flags = _c_flags_at(cfg, fields["base_flags"], mesh, walks, walks_int, strict=True)
        phi = _c_tip_phi(cfg, mesh, walks)
        C = jnp.where(flags == int(CellType.OBSTACLE), 0.0, C).astype(dtype)

        # stored-velocity interpolation in tip-position space
        vel_field = fields["vel_field"]
        n_frames = vel_field.shape[0]
        x_comp = step_idx.astype(dtype) * v
        b = jnp.floor(x_comp / x_interval).astype(jnp.int32)
        b = jnp.clip(b, 0, n_frames - 1)
        t = x_comp / x_interval - b.astype(dtype)
        v0 = jax.lax.dynamic_index_in_dim(vel_field, b, axis=0, keepdims=False)
        v1 = jax.lax.dynamic_index_in_dim(
            vel_field, jnp.minimum(b + 1, n_frames - 1), axis=0, keepdims=False
        )
        vel = jnp.where(b + 1 < n_frames, v0 * (1.0 - t) + v1 * t, v0)
        C_vel = vel * v
        iy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        ix = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        tip_block = (iy < walks_int) & (ix < cfg.Rg_radius)
        C_vel = jnp.stack(
            [
                jnp.where(tip_block, 0.0, C_vel[0]),
                jnp.where(tip_block, v, C_vel[1]),
            ]
        ).astype(dtype)

        C, _, h = _stream.propagate(
            h, flags, phi_obs=phi, rho=C, vel=C_vel, is_convection=True,
            inflow_density=0.0, axisymmetric_type=ax,
        )
        C = _macro.macro_compute_C(h, C, flags)
        if cfg.clamp_C:
            C = jnp.clip(C, 0.0, 1.0)
        h = _collide.bgk_collide(
            h, C, C_vel, flags, tau=tau_D, mesh_grid=mesh,
            is_convection=True, axisymmetric_type=ax,
        )

        # per-step inflow/current integrals over the tip disk
        area = jnp.asarray(cfg.area_array, dtype)

        def disk_row(arr, row):
            return jax.lax.dynamic_slice(arr, (row, 0), (1, rint))[0]

        if cfg.shape in FLAT_SHAPES:
            # flux form dC_z + dC_r (`C_cylinder:344-358`)
            def flux(row):
                dC_z = disk_row(C, row) - disk_row(C, row - 1)
                r_line = jax.lax.dynamic_slice(mesh[0], (row, 0), (1, rint + 1))[0]
                c_line = jax.lax.dynamic_slice(C, (row, 0), (1, rint + 1))[0]
                rC = r_line * c_line
                dC_r = (rC[1:] - rC[:-1]) / r_line[:-1]
                return jnp.sum((dC_z + dC_r) * area)

            new_inflow = flux(walks_int)
            new_current = flux(walks_int + 1)
        else:
            # plain disk integral (`C_ethaline:364-381`)
            new_inflow = jnp.sum(disk_row(C, walks_int) * area)
            new_current = jnp.sum(disk_row(C, walks_int + 1) * area)

        rec_u = jnp.sum(disk_row(C_vel[0], walks_int + 1) * area)
        rec_v = jnp.sum(disk_row(C_vel[1], walks_int + 1) * area)

        return {"C": C, "h": h}, (new_inflow, new_current, rec_u, rec_v)

    return step


def make_balance_runner(cfg: JRLCConfig, flags):
    step = make_balance_step(cfg, flags)

    @partial(jax.jit, static_argnames=("n",))
    def run(state, fields, n: int):
        return jax.lax.fori_loop(0, n, lambda _, s: step(s, fields), state)

    return run


def pick_balance_runner(cfg: JRLCConfig, flags):
    """Fused VMEM-resident balance kernel on TPU when the grid fits
    (`ops/pallas/fused_jrl.py`); jnp `make_balance_runner` otherwise.
    Set JRL_FUSED=0 to force the jnp path."""
    import os

    if os.environ.get("JRL_FUSED", "1") != "0":
        try:
            from jrl_lbm_tpu.ops.pallas import fused_jrl

            if jax.devices()[0].platform != "cpu":
                if fused_jrl.fits_vmem(cfg):
                    return fused_jrl.make_fused_balance_runner(cfg, flags)
                from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled

                if cfg.eff_res[0] % 8 == 0:
                    return fused_jrl_tiled.make_tiled_balance_runner(cfg, flags)
        except Exception:
            pass
    return make_balance_runner(cfg, flags)


def make_approach_runner(cfg: JRLCConfig):
    """Runner that advances n steps and accumulates running-mean integrals."""
    step = make_approach_step(cfg)

    @partial(jax.jit, static_argnames=("n",))
    def run(state, fields, start_step, n: int):
        def body(i, carry):
            s, acc = carry
            s, (inflow, current, rec_u, rec_v) = step(s, fields, start_step + i)
            acc = {
                "inflow_sum": acc["inflow_sum"] + inflow,
                "current_sum": acc["current_sum"] + current,
                "count": acc["count"] + 1.0,
                "rec_u": rec_u,
                "rec_v": rec_v,
            }
            return (s, acc)

        acc0 = {
            "inflow_sum": jnp.zeros((), cfg.dtype),
            "current_sum": jnp.zeros((), cfg.dtype),
            "count": jnp.zeros((), cfg.dtype),
            "rec_u": jnp.zeros((), cfg.dtype),
            "rec_v": jnp.zeros((), cfg.dtype),
        }
        return jax.lax.fori_loop(0, n, body, (state, acc0))

    return run


def pick_approach_runner(cfg: JRLCConfig, vel_field):
    """Fused VMEM-resident approach kernel on TPU when the grid fits
    (`ops/pallas/fused_jrl.py`, calls split at stored-frame boundaries);
    the jnp `make_approach_runner` otherwise. Same (state, fields,
    start_step, n) -> (state, acc) contract. JRL_FUSED=0 opts out."""
    import os

    if os.environ.get("JRL_FUSED", "1") != "0":
        try:
            from jrl_lbm_tpu.ops.pallas import fused_jrl

            if jax.devices()[0].platform != "cpu":
                if fused_jrl.fits_vmem(cfg):
                    return fused_jrl.make_fused_approach_runner(cfg, vel_field)
                from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled

                if cfg.eff_res[0] % 8 == 0:
                    return fused_jrl_tiled.make_tiled_approach_runner(
                        cfg, vel_field
                    )
        except Exception:
            pass
    base = make_approach_runner(cfg)
    vf = jnp.asarray(vel_field)

    def run(state, fields, start_step, n: int):
        f2 = dict(fields)
        f2.setdefault("vel_field", vf)
        return base(state, f2, start_step, n)

    return run


def c_dump_steps(cfg: JRLCConfig):
    """Steps after which the reference writes a record line.

    `C_ethaline:390`: dump when floor(walks) == floor(walks + dt*v) - 1,
    evaluated with walks at the value used DURING the step.
    """
    v = cfg.vel_obs_conv
    out = []
    for s in range(cfg.total_steps):
        walks = cfg.inflow_height + s * v
        if math.floor(walks) == math.floor(walks + v) - 1:
            out.append(s)
    return out
