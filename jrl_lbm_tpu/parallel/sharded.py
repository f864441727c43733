"""Sharded whole-step functions: shard_map over a 2D device mesh.

The full cylinder-channel step (streaming with inflow/outflow, curved
solid-fluid coupling, macro moments with contact-angle border treatment,
MRT collision) runs per-shard on local blocks after one halo exchange;
XLA lowers the `ppermute` halos onto ICI. Collision and moments are
purely local, so the only per-step communication is the 1-cell halo of
(f, flags, phi_obs, vel, obs_vel) — O(surface) vs O(volume) compute.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from jrl_lbm_tpu.ops import collide as _collide
from jrl_lbm_tpu.parallel import padded_ops as pops
from jrl_lbm_tpu.parallel.halo import make_domain, pad_halo
from jrl_lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y


def state_shardings(mesh: Mesh):
    """NamedShardings for the cylinder scene state/fields pytrees."""
    s2 = NamedSharding(mesh, P(AXIS_Y, AXIS_X))  # [H, W]
    s3 = NamedSharding(mesh, P(None, AXIS_Y, AXIS_X))  # [C/Q, H, W]
    rep = NamedSharding(mesh, P())
    state = {"f": s3, "rho": s2, "vel": s3}
    fields = {
        "flags": s2,
        "phi_obs": s2,
        "obs_vel": s3,
        "force": s3,
        "inflow_vel": rep,
    }
    return state, fields


def make_sharded_cylinder_step(cfg, mesh: Mesh):
    """Sharded version of `models.cylinder.make_step` over ``mesh``.

    Returns a function (state, fields) -> state operating on globally
    sharded arrays; the per-shard body exchanges halos and runs the
    padded ops.
    """
    H, W = cfg.res
    ny, nx = mesh.devices.shape
    assert H % ny == 0 and W % nx == 0, "grid must tile the mesh"
    h, w = H // ny, W // nx
    assert h >= 3 and w >= 3, "blocks must be at least 3 cells wide"
    minv_s_m, _ = _collide.mrt_matrices(cfg.tau)

    def local_step(f, rho, vel, flags, phi_obs, obs_vel, force, inflow_vel):
        dom = make_domain((h, w), (H, W), AXIS_Y, AXIS_X, 0)
        fp = pad_halo(f, AXIS_Y, AXIS_X)
        flagsp = pad_halo(flags, AXIS_Y, AXIS_X)
        velp_pre = pad_halo(vel, AXIS_Y, AXIS_X)

        rho, vel, f = pops.propagate_padded(
            fp,
            flagsp,
            dom,
            phi_obs=None,
            rho=rho,
            vel=vel,
            inflow_vel=inflow_vel,
            inflow_density=cfg.density,
            dx=cfg.dx,
            dt=cfg.dt,
        )
        # the coupling reads the velocity field as updated by the INFLOW
        # pass; re-exchange its halo
        velp = pad_halo(vel, AXIS_Y, AXIS_X)
        del velp_pre
        obs_vel_p = pad_halo(obs_vel, AXIS_Y, AXIS_X)
        f = pops.solve_boundary_padded(
            velp, flagsp, f, phi_obs, dom, obs_vel_p=obs_vel_p,
            tau=cfg.tau, dx=cfg.dx, dt=cfg.dt,
        )
        rho, vel = pops.macro_padded(
            f, rho, vel, flags, dom, dx=cfg.dx, dt=cfg.dt,
            contact_angle=cfg.contact_angle,
        )
        f = _collide.mrt_collide(
            f, rho, vel, flags, minv_s_m=minv_s_m, tau=cfg.tau,
            force=force, dx=cfg.dx, dt=cfg.dt,
        )
        return f, rho, vel

    spec2 = P(AXIS_Y, AXIS_X)
    spec3 = P(None, AXIS_Y, AXIS_X)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec3, spec2, spec3, spec2, spec2, spec3, spec3, P()),
        out_specs=(spec3, spec2, spec3),
    )

    def step(state, fields):
        f, rho, vel = sharded(
            state["f"],
            state["rho"],
            state["vel"],
            fields["flags"],
            fields["phi_obs"],
            fields["obs_vel"],
            fields["force"],
            fields["inflow_vel"],
        )
        return {"f": f, "rho": rho, "vel": vel}

    return step


def make_sharded_cylinder_runner(cfg, mesh: Mesh):
    step = make_sharded_cylinder_step(cfg, mesh)

    @partial(jax.jit, static_argnames=("n",))
    def run(state, fields, n: int):
        return jax.lax.fori_loop(0, n, lambda _, s: step(s, fields), state)

    return run


def shard_state(state, fields, mesh: Mesh):
    """Place an unsharded (state, fields) pair onto the mesh."""
    st_sh, fl_sh = state_shardings(mesh)
    state = {k: jax.device_put(v, st_sh[k]) for k, v in state.items()}
    fields = {k: jax.device_put(v, fl_sh[k]) for k, v in fields.items()}
    return state, fields


def make_sharded_jrl_fluid_step(cfg, mesh: Mesh):
    """Sharded version of `models.jrl.make_fluid_step` over ``mesh``.

    The moving-tip geometry (flags, phi, obs_vel) is rebuilt per shard
    from GLOBAL coordinates, so no host mutation and no resharding is
    needed as the tip walks; the axisymmetric source terms use the
    halo-aware grad/div stencils. Covers the flat-tip shapes (the wedge
    shapes only change the SDF, which is already a pure function of
    global coordinates).
    """
    import jax.numpy as jnp

    from jrl_lbm_tpu.models import jrl as _jrl
    from jrl_lbm_tpu.utils.types import CellType

    H, W = cfg.eff_res
    ny, nx = mesh.devices.shape
    assert H % ny == 0 and W % nx == 0, "grid must tile the mesh"
    h, w = H // ny, W // nx
    assert h >= 3 and w >= 3, "blocks must be at least 3 cells wide"
    ax = 1  # LINE_X_EQ_0
    vel_obs = cfg.vel_obs
    dtype = cfg.dtype

    def local_step(f, rho, vel, base_flags, gmesh, force, step_idx):
        dom = make_domain((h, w), (H, W), AXIS_Y, AXIS_X, ax)
        walks = cfg.inflow_height + step_idx.astype(dtype) * vel_obs
        walks_int = jnp.floor(walks + 0.5).astype(jnp.int32)
        phi = _jrl._tip_phi(cfg, gmesh, walks)

        if cfg.shape in _jrl.FLAT_SHAPES:
            tip = (dom.gy < walks_int) & (dom.gx < cfg.Rg_radius)
            obs_vel = jnp.stack(
                [jnp.zeros((h, w), dtype), jnp.where(tip, vel_obs, 0.0).astype(dtype)]
            )
            flags = jnp.where(tip, int(CellType.OBSTACLE), base_flags)
            vel = jnp.stack(
                [jnp.where(tip, 0.0, vel[0]), jnp.where(tip, vel_obs, vel[1])]
            ).astype(dtype)
        else:
            is_o = phi <= 0
            obs_v = jnp.stack(
                [jnp.zeros((h, w), dtype), jnp.where(is_o, vel_obs, 0.0).astype(dtype)]
            )
            obs_vel = jnp.where(dom.at_yH[None], 0.0, obs_v)
            flags = jnp.where(is_o, int(CellType.OBSTACLE), base_flags)
            vel = jnp.where(is_o[None], obs_vel, vel)

        fp = pad_halo(f, AXIS_Y, AXIS_X)
        flagsp = pad_halo(flags, AXIS_Y, AXIS_X)
        _, _, f = pops.propagate_padded(
            fp, flagsp, dom, phi_obs=phi, rho=rho, vel=vel
        )
        velp = pad_halo(vel, AXIS_Y, AXIS_X)
        obs_vel_p = pad_halo(obs_vel, AXIS_Y, AXIS_X)
        f = pops.solve_boundary_padded(
            velp, flagsp, f, phi, dom, obs_vel_p=obs_vel_p, tau=cfg.tau
        )
        rho, vel = pops.macro_padded(f, rho, vel, flags, dom, contact_angle=None)

        # axisymmetric BGK with halo-aware stencils (each grad/div call
        # exchanges the halo of its operand)
        def grad_fn(a):
            return pops.grad_padded(pad_halo(a, AXIS_Y, AXIS_X), flagsp, dom)

        def div_fn(a):
            return pops.div_padded(pad_halo(a, AXIS_Y, AXIS_X), flagsp, dom)

        f = _collide.bgk_collide(
            f, rho, vel, flags, tau=cfg.tau, force=force, mesh_grid=gmesh,
            axisymmetric_type=ax, grad_fn=grad_fn, div_fn=div_fn,
        )
        return f, rho, vel

    spec2 = P(AXIS_Y, AXIS_X)
    spec3 = P(None, AXIS_Y, AXIS_X)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec3, spec2, spec3, spec2, spec3, spec3, P()),
        out_specs=(spec3, spec2, spec3),
    )

    def step(state, fields, step_idx):
        f, rho, vel = sharded(
            state["f"], state["rho"], state["vel"],
            fields["base_flags"], fields["mesh"], fields["force"],
            step_idx,
        )
        return {"f": f, "rho": rho, "vel": vel}

    return step


def make_sharded_jrl_fluid_runner(cfg, mesh: Mesh):
    step = make_sharded_jrl_fluid_step(cfg, mesh)

    @partial(jax.jit, static_argnames=("n",))
    def run(state, fields, start_step, n: int):
        def body(i, s):
            return step(s, fields, start_step + i)

        return jax.lax.fori_loop(0, n, body, state)

    return run


def shard_jrl_state(state, fields, mesh: Mesh):
    """Place a JRL fluid-scene (state, fields) pair onto the mesh."""
    s2 = NamedSharding(mesh, P(AXIS_Y, AXIS_X))
    s3 = NamedSharding(mesh, P(None, AXIS_Y, AXIS_X))
    state = {
        "f": jax.device_put(state["f"], s3),
        "rho": jax.device_put(state["rho"], s2),
        "vel": jax.device_put(state["vel"], s3),
    }
    fields = {
        "base_flags": jax.device_put(fields["base_flags"], s2),
        "mesh": jax.device_put(fields["mesh"], s3),
        "force": jax.device_put(fields["force"], s3),
    }
    return state, fields
