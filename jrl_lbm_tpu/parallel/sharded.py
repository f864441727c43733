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
