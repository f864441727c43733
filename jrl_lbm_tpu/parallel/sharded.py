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


# ---------------------------------------------------------------------------
# JRL concentration (C) phase
# ---------------------------------------------------------------------------

def _c_area_row(cfg) -> "jnp.ndarray":
    """Global [W] lookup of the annulus areas, zero beyond the tip disk.

    Column x of the lookup holds `cfg.area_array[x]` for x < radius_obs_int
    (the exact float32 values the single-device integrals use,
    `models/jrl.py::JRLCConfig.area_array` / `C_ethaline:189-192`), so a
    masked per-cell product + `psum` reproduces the reference's
    `sum(C[row, :rint] * area)` disk integral across shards.
    """
    import numpy as np

    W = cfg.eff_res[1]
    rint = cfg.radius_obs_int
    a = np.zeros((W,), np.float32)
    a[:rint] = cfg.area_array
    return jnp.asarray(a, cfg.dtype)


def _c_flags_local(cfg, base_flags, gmesh, dom, walks, walks_int, strict: bool):
    """Per-shard port of `models.jrl._c_flags_at` using global coordinates.

    ``strict`` selects phi < 0 (approach, `C_ethaline:302`) vs phi <= 0
    (balance, `C_ethaline:218`).
    """
    from jrl_lbm_tpu.models import jrl as _jrl
    from jrl_lbm_tpu.utils.types import CellType

    gy, gx = dom.gy, dom.gx
    if cfg.shape in _jrl.FLAT_SHAPES:
        obs = (gy < walks_int) & (gx < cfg.Rg_radius)
    else:
        phi = _jrl._c_tip_phi(cfg, gmesh, walks)
        obs = (phi < 0) if strict else (phi <= 0)
        obs = obs | ((gy < cfg.inflow_height_int) & (gx < cfg.Rg_radius))
    flags = jnp.where(obs, int(CellType.OBSTACLE), base_flags)
    head = (gy == walks_int - 1) & (gx < cfg.radius_obs_int)
    return jnp.where(head, int(CellType.INFLOW), flags)


def make_sharded_balance_step(cfg, mesh: Mesh):
    """Sharded version of `models.jrl.make_balance_step` over ``mesh``.

    Zero velocity, fixed flags (`C_ethaline:230-253`); the only per-step
    communication is the 1-cell `ppermute` halo of (h, flags).
    Signature: (state, fields, flags) -> state on globally sharded arrays.
    """
    H, W = cfg.eff_res
    ny, nx = mesh.devices.shape
    assert H % ny == 0 and W % nx == 0, "grid must tile the mesh"
    h_, w_ = H // ny, W // nx
    assert h_ >= 3 and w_ >= 3, "blocks must be at least 3 cells wide"
    ax = 1  # LINE_X_EQ_0
    dtype = cfg.dtype

    def local_step(C, h, flags, gmesh):
        dom = make_domain((h_, w_), (H, W), AXIS_Y, AXIS_X, ax)
        zero_vel = jnp.zeros((2, h_, w_), dtype)
        hp = pad_halo(h, AXIS_Y, AXIS_X)
        flagsp = pad_halo(flags, AXIS_Y, AXIS_X)
        C, _, h = pops.propagate_padded(
            hp, flagsp, dom, rho=C, vel=zero_vel, inflow_density=0.0
        )
        from jrl_lbm_tpu.ops import macro as _macro

        C = _macro.macro_compute_C(h, C, flags)
        h = _collide.bgk_collide(
            h, C, zero_vel, flags, tau=cfg.tau_D, mesh_grid=gmesh,
            is_convection=True, axisymmetric_type=ax,
        )
        return C, h

    spec2 = P(AXIS_Y, AXIS_X)
    spec3 = P(None, AXIS_Y, AXIS_X)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec2, spec3, spec2, spec3),
        out_specs=(spec2, spec3),
    )

    def step(state, fields, flags):
        C, h = sharded(state["C"], state["h"], flags, fields["mesh"])
        return {"C": C, "h": h}

    return step


def make_sharded_balance_runner(cfg, mesh: Mesh):
    step = make_sharded_balance_step(cfg, mesh)

    @partial(jax.jit, static_argnames=("n",))
    def run(state, fields, flags, n: int):
        return jax.lax.fori_loop(0, n, lambda _, s: step(s, fields, flags), state)

    return run


def make_sharded_approach_step(cfg, mesh: Mesh):
    """Sharded version of `models.jrl.make_approach_step` over ``mesh``.

    The moving tip (flags, phi, head-row sink) is rebuilt per shard from
    global coordinates; the stored fluid-velocity history is sharded over
    the same spatial mesh (`P(None, None, dy, dx)`); and the per-step
    tip-disk inflow/current integrals (`C_ethaline:364-385`) are computed
    as masked per-shard partial sums reduced with `jax.lax.psum` over both
    mesh axes — the SURVEY §2.3 "psum for global diagnostics" collective.

    Signature matches the single-device step: (state, fields, step_idx)
    -> (state, (new_inflow, new_current, rec_u, rec_v)) with the integrals
    replicated on every device.
    """
    from jrl_lbm_tpu.models import jrl as _jrl
    from jrl_lbm_tpu.ops import macro as _macro
    from jrl_lbm_tpu.utils.types import CellType

    H, W = cfg.eff_res
    ny, nx = mesh.devices.shape
    assert H % ny == 0 and W % nx == 0, "grid must tile the mesh"
    h_, w_ = H // ny, W // nx
    assert h_ >= 3 and w_ >= 3, "blocks must be at least 3 cells wide"
    ax = 1  # LINE_X_EQ_0
    dtype = cfg.dtype
    v = cfg.vel_obs_conv
    tau_D = cfg.tau_D
    x_interval = 0.1
    flat = cfg.shape in _jrl.FLAT_SHAPES

    def local_step(C, h, base_flags, gmesh, vel_field, area_row, step_idx):
        dom = make_domain((h_, w_), (H, W), AXIS_Y, AXIS_X, ax)
        walks = cfg.inflow_height + step_idx.astype(dtype) * v
        walks_int = jnp.floor(walks + 0.5).astype(jnp.int32)
        flags = _c_flags_local(cfg, base_flags, gmesh, dom, walks, walks_int, True)
        phi = _jrl._c_tip_phi(cfg, gmesh, walks)
        C = jnp.where(flags == int(CellType.OBSTACLE), 0.0, C).astype(dtype)

        # stored-velocity interpolation in tip-position space
        # (`C_ethaline:294-335`); vel_field is the shard-local [N, 2, h, w]
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
        tip_block = (dom.gy < walks_int) & (dom.gx < cfg.Rg_radius)
        C_vel = jnp.stack(
            [
                jnp.where(tip_block, 0.0, C_vel[0]),
                jnp.where(tip_block, v, C_vel[1]),
            ]
        ).astype(dtype)

        hp = pad_halo(h, AXIS_Y, AXIS_X)
        flagsp = pad_halo(flags, AXIS_Y, AXIS_X)
        C, _, h = pops.propagate_padded(
            hp, flagsp, dom, phi_obs=phi, rho=C, vel=C_vel, inflow_density=0.0
        )
        C = _macro.macro_compute_C(h, C, flags)
        if cfg.clamp_C:
            C = jnp.clip(C, 0.0, 1.0)
        h = _collide.bgk_collide(
            h, C, C_vel, flags, tau=tau_D, mesh_grid=gmesh,
            is_convection=True, axisymmetric_type=ax,
        )

        # tip-disk integrals as masked partial sums + psum. area_row is
        # the exact area lookup (zero beyond the disk), so the column
        # bound gx < radius_obs_int is carried by the data.
        area2 = jnp.broadcast_to(area_row[None, :], (h_, w_))
        row_in = (dom.gy == walks_int).astype(dtype)
        row_cur = (dom.gy == walks_int + 1).astype(dtype)
        if flat:
            # flux form dC_z + dC_r (`C_cylinder:344-358`)
            Cp = pad_halo(C, AXIS_Y, AXIS_X)
            r = gmesh[0]
            rCp = pad_halo(r * C, AXIS_Y, AXIS_X)
            dC_z = C - Cp[..., 0:-2, 1:-1]  # C[y] - C[y-1]
            dC_r = (rCp[..., 1:-1, 2:] - r * C) / r  # (rC[x+1] - rC[x]) / r[x]
            integ = (dC_z + dC_r) * area2
            new_inflow = jnp.sum(integ * row_in)
            new_current = jnp.sum(integ * row_cur)
        else:
            # plain disk integral (`C_ethaline:364-381`)
            new_inflow = jnp.sum(C * area2 * row_in)
            new_current = jnp.sum(C * area2 * row_cur)
        rec_u = jnp.sum(C_vel[0] * area2 * row_cur)
        rec_v = jnp.sum(C_vel[1] * area2 * row_cur)

        new_inflow = jax.lax.psum(new_inflow, (AXIS_Y, AXIS_X))
        new_current = jax.lax.psum(new_current, (AXIS_Y, AXIS_X))
        rec_u = jax.lax.psum(rec_u, (AXIS_Y, AXIS_X))
        rec_v = jax.lax.psum(rec_v, (AXIS_Y, AXIS_X))
        return C, h, new_inflow, new_current, rec_u, rec_v

    spec2 = P(AXIS_Y, AXIS_X)
    spec3 = P(None, AXIS_Y, AXIS_X)
    spec4 = P(None, None, AXIS_Y, AXIS_X)
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec2, spec3, spec2, spec3, spec4, P(AXIS_X), P()),
        out_specs=(spec2, spec3, P(), P(), P(), P()),
    )

    area_row = _c_area_row(cfg)

    def step(state, fields, step_idx):
        C, h, inflow, current, rec_u, rec_v = sharded(
            state["C"], state["h"], fields["base_flags"], fields["mesh"],
            fields["vel_field"], area_row, step_idx,
        )
        return {"C": C, "h": h}, (inflow, current, rec_u, rec_v)

    return step


def make_sharded_approach_runner(cfg, mesh: Mesh):
    """Sharded analog of `models.jrl.make_approach_runner` (same acc pytree)."""
    step = make_sharded_approach_step(cfg, mesh)

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


def shard_c_state(state, fields, mesh: Mesh, flags=None):
    """Place a JRL C-scene (state, fields[, flags]) onto the mesh.

    ``fields`` may contain ``vel_field`` [N, 2, H, W] (approach phase),
    which is sharded spatially over the same mesh.
    """
    s2 = NamedSharding(mesh, P(AXIS_Y, AXIS_X))
    s3 = NamedSharding(mesh, P(None, AXIS_Y, AXIS_X))
    s4 = NamedSharding(mesh, P(None, None, AXIS_Y, AXIS_X))
    state = {
        "C": jax.device_put(state["C"], s2),
        "h": jax.device_put(state["h"], s3),
    }
    out_fields = {
        "base_flags": jax.device_put(fields["base_flags"], s2),
        "mesh": jax.device_put(fields["mesh"], s3),
    }
    if "vel_field" in fields:
        out_fields["vel_field"] = jax.device_put(fields["vel_field"], s4)
    if flags is not None:
        return state, out_fields, jax.device_put(flags, s2)
    return state, out_fields
