"""Analytic physics validation: Taylor-Green decay, Poiseuille, Couette."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from jrl_lbm_tpu.ops import bgk_collide, feq, macro_compute, propagate, solve_boundary
from jrl_lbm_tpu.utils.types import CellType


def _run_periodic_bgk(f, rho, vel, flags, tau, n, force=None):
    def step(_, carry):
        f, rho, vel = carry
        _, _, f = propagate(f, flags)
        rho, vel = macro_compute(f, rho, vel, flags, contact_angle=None)
        f = bgk_collide(f, rho, vel, flags, tau=tau, force=force)
        return (f, rho, vel)

    return jax.lax.fori_loop(0, n, step, (f, rho, vel))


def test_taylor_green_decay():
    """Kinetic energy of a TG vortex decays as exp(-2 nu k^2 t)."""
    N = 64
    tau = 0.8
    nu = (tau - 0.5) / 3.0
    k = 2.0 * math.pi / N
    u0 = 0.01

    y, x = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    ux = -u0 * np.cos(k * x) * np.sin(k * y)
    uy = u0 * np.sin(k * x) * np.cos(k * y)
    vel = jnp.asarray(np.stack([ux, uy]), jnp.float32)
    rho = jnp.ones((N, N), jnp.float32)
    flags = jnp.full((N, N), int(CellType.FLUID), jnp.int32)
    f = feq(rho, vel)

    n = 200
    f, rho, vel2 = _run_periodic_bgk(f, rho, vel, flags, tau, n)
    e0 = float(jnp.sum(vel[0] ** 2 + vel[1] ** 2))
    e1 = float(jnp.sum(vel2[0] ** 2 + vel2[1] ** 2))
    expected = math.exp(-2.0 * nu * (2.0 * k * k) * n / 2.0)  # note: 2D TG, k^2 = kx^2+ky^2
    # decay rate of energy = exp(-4 nu k^2 t) for equal kx=ky... derive:
    # u ~ exp(-nu (kx^2+ky^2) t) => energy ~ exp(-2 nu * 2k^2 * t)
    expected = math.exp(-4.0 * nu * k * k * n)
    assert abs(e1 / e0 - expected) < 0.02 * expected, (e1 / e0, expected)


def test_poiseuille_profile():
    """Body-force-driven channel flow between bounce-back walls.

    The reference's forcing applies only a half-force velocity shift in
    feq (`LBM_collision_2d.py:249-252`), which injects momentum
    rho*du/tau = F/(2 tau) per step — i.e. an EFFECTIVE body force of
    g/(2 tau). The steady profile is therefore
    u(x) = g_eff/(2 nu) x (L - x) with g_eff = g/(2 tau), for half-way
    walls 0.5 cells outside the first/last fluid nodes.
    """
    H, W = 8, 34
    tau = 1.0
    nu = (tau - 0.5) / 3.0
    g = 1e-6
    flags = np.full((H, W), int(CellType.FLUID), np.int32)
    flags[:, 0] = flags[:, -1] = int(CellType.OBSTACLE)
    flags = jnp.asarray(flags)
    rho = jnp.ones((H, W), jnp.float32)
    vel = jnp.zeros((2, H, W), jnp.float32)
    force = jnp.stack([jnp.zeros((H, W)), jnp.full((H, W), g)]).astype(jnp.float32)
    f = feq(rho, vel, force=force)

    f, rho, vel = _run_periodic_bgk(f, rho, vel, flags, tau, 8000, force=force)
    prof = np.asarray(vel[1][H // 2, 1:-1])
    xs = np.arange(1, W - 1) - 0.5  # distance from wall at x=0.5
    L = W - 2.0  # channel width between half-way walls
    g_eff = g / (2.0 * tau)
    analytic = g_eff / (2.0 * nu) * xs * (L - xs)
    err = np.abs(prof - analytic).max() / analytic.max()
    assert err < 0.03, err


def test_couette_moving_wall():
    """Moving top wall via solid-fluid coupling drives a linear profile."""
    H, W = 8, 32
    tau = 0.8
    U = 0.02
    flags = np.full((H, W), int(CellType.FLUID), np.int32)
    flags[:, 0] = flags[:, -1] = int(CellType.OBSTACLE)
    flags = jnp.asarray(flags)
    rho = jnp.ones((H, W), jnp.float32)
    vel = jnp.zeros((2, H, W), jnp.float32)
    # phi_obs fraction 0.5 on cells adjacent to the moving wall
    phi = jnp.full((H, W), 0.5, jnp.float32)
    obs_vel = np.zeros((2, H, W), np.float32)
    obs_vel[1, :, -1] = U  # wall at x = W-1 moves in +y
    obs_vel = jnp.asarray(obs_vel)
    f = feq(rho, vel)

    def step(_, carry):
        f, rho, vel = carry
        _, _, f = propagate(f, flags, phi_obs=phi)
        f = solve_boundary(rho, vel, flags, f, phi, obs_vel=obs_vel, tau=tau)
        rho, vel = macro_compute(f, rho, vel, flags, contact_angle=None)
        f = bgk_collide(f, rho, vel, flags, tau=tau)
        return (f, rho, vel)

    f, rho, vel = jax.lax.fori_loop(0, 12000, step, (f, rho, vel))
    prof = np.asarray(vel[1][H // 2, 1:-1])
    # The reference reconstruction samples the driving fluid velocity at
    # cell - e_q (1.5 cells from the wall) and blends it with u_obs as
    # (t u + u_obs)/(t + 1), which yields a linear profile with partial
    # slip at the moving wall (steady wall-adjacent velocity ~0.55 U for
    # t=0.5, tau=0.8). Assert the scheme's actual steady behaviour: a
    # monotone linear shear driven by the wall.
    xs = np.linspace(0, 1, W - 2)
    corr = np.corrcoef(prof, xs)[0, 1]
    assert corr > 0.995, corr
    assert np.all(np.diff(prof) > 0)
    assert 0.3 * U < prof[-1] < 0.9 * U, prof[-1]


def test_shear_layer_scene_stability():
    from jrl_lbm_tpu.models import shear_layer as sl

    cfg = sl.ShearLayerConfig(res=(64, 64), Re=3000.0)
    state, fields = sl.init(cfg)
    run = sl.make_runner(cfg)
    state = run(state, fields, 200)
    assert bool(jnp.all(jnp.isfinite(state["f"])))
    # mass conserved
    np.testing.assert_allclose(
        float(jnp.sum(state["rho"])), 64 * 64 * cfg.density, rtol=1e-4
    )


def test_cylinder_scene_smoke():
    from jrl_lbm_tpu.models import cylinder as cyl

    cfg = cyl.CylinderConfig(
        res=(200, 100), D=9.3, Re=200.0, cylinder_center=(50.0, 60.0)
    )
    state, fields = cyl.init(cfg)
    run = cyl.make_runner(cfg)
    state = run(state, fields, 300)
    assert bool(jnp.all(jnp.isfinite(state["f"])))
    vmax = float(jnp.max(jnp.abs(state["vel"])))
    assert 0 < vmax < 0.5, vmax
