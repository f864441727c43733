"""grad/div stencils and solid-fluid coupling vs numpy oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from jrl_lbm_tpu.ops.stencil import get_div, get_grad, get_laplacian
from jrl_lbm_tpu.ops.coupling import solve_boundary
from jrl_lbm_tpu.utils.types import CellType

import oracle


def _flags_with_blob(rng, H, W):
    flags = np.full((H, W), int(CellType.FLUID), np.int32)
    # obstacle blob + border mix
    flags[H // 2 : H // 2 + 3, W // 2 : W // 2 + 3] = int(CellType.OBSTACLE)
    flags[0, :] = rng.choice(
        [int(CellType.OUTFLOW), int(CellType.OBSTACLE), int(CellType.FLUID)], size=W
    )
    flags[-1, :] = int(CellType.OBSTACLE)
    return flags


@pytest.mark.parametrize("axisym", [0, 1, 2])
def test_grad_matches_oracle(axisym):
    rng = np.random.default_rng(10 + axisym)
    H, W = 12, 11
    rho = rng.uniform(0.5, 1.5, size=(H, W)).astype(np.float32)
    flags = _flags_with_blob(rng, H, W)
    g_o = oracle.grad_oracle(rho, flags, dx=1.0, axisymmetric_type=axisym)
    g_j = get_grad(jnp.asarray(rho), jnp.asarray(flags), dx=1.0, axisymmetric_type=axisym)
    np.testing.assert_allclose(np.asarray(g_j), g_o, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("axisym", [0, 1])
def test_div_matches_oracle(axisym):
    rng = np.random.default_rng(20 + axisym)
    H, W = 10, 13
    vel = rng.uniform(-1, 1, size=(2, H, W)).astype(np.float32)
    flags = _flags_with_blob(rng, H, W)
    d_o = oracle.div_oracle(vel, flags, dx=1.0, axisymmetric_type=axisym)
    d_j = get_div(jnp.asarray(vel), jnp.asarray(flags), dx=1.0, axisymmetric_type=axisym)
    np.testing.assert_allclose(np.asarray(d_j), d_o, rtol=2e-5, atol=1e-6)


def test_grad_of_linear_field():
    """Interior gradient of a linear ramp is exact for the isotropic stencil."""
    H, W = 16, 16
    x = np.arange(W, dtype=np.float32)[None, :].repeat(H, 0)
    flags = np.full((H, W), int(CellType.FLUID), np.int32)
    flags[:, 0] = flags[:, -1] = int(CellType.NOTHING)  # avoid wrap on ramp
    flags[0, :] = flags[-1, :] = int(CellType.NOTHING)
    g = np.asarray(get_grad(jnp.asarray(x), jnp.asarray(flags)))
    np.testing.assert_allclose(g[0, 2:-2, 2:-2], 1.0, rtol=1e-5)
    np.testing.assert_allclose(g[1, 2:-2, 2:-2], 0.0, atol=1e-5)


def test_laplacian_of_quadratic():
    H, W = 16, 16
    xx, yy = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    field = xx * xx + yy * yy  # true laplacian = 4
    lap = np.asarray(get_laplacian(jnp.asarray(field)))
    # The reference stencil divides by 5 instead of the isotropic 6
    # (`LBM_collision_2d.py:334`), so it returns 6/5 of the true
    # laplacian: 4 * 1.2 = 4.8. Behaviour preserved for parity.
    np.testing.assert_allclose(lap[2:-2, 2:-2], 4.8, rtol=1e-4)
    np.testing.assert_allclose(lap[0, :], 0.0)  # zero-padded border


@pytest.mark.parametrize("with_obs_vel", [False, True])
@pytest.mark.parametrize("axisym", [0, 1])
def test_solve_boundary_matches_oracle(with_obs_vel, axisym):
    rng = np.random.default_rng(30 + axisym)
    H, W = 12, 10
    f = rng.uniform(0.1, 1.0, size=(9, H, W)).astype(np.float32)
    vel = rng.uniform(-0.05, 0.05, size=(2, H, W)).astype(np.float32)
    rho = rng.uniform(0.5, 1.5, size=(H, W)).astype(np.float32)
    flags = np.full((H, W), int(CellType.FLUID), np.int32)
    flags[4:7, 3:6] = int(CellType.OBSTACLE)
    flags[-1, :] = int(CellType.OBSTACLE)
    flags[0, :] = int(CellType.OUTFLOW)
    # mix of in-range and out-of-range phi values
    phi = rng.uniform(-0.5, 1.5, size=(H, W)).astype(np.float32)
    obs_vel = (
        rng.uniform(-0.02, 0.02, size=(2, H, W)).astype(np.float32)
        if with_obs_vel
        else None
    )
    tau = 0.8

    f_o = oracle.solve_boundary_oracle(
        vel, flags, f, phi, obs_vel=obs_vel, tau=tau, axisymmetric_type=axisym
    )
    f_j = solve_boundary(
        jnp.asarray(rho),
        jnp.asarray(vel),
        jnp.asarray(flags),
        jnp.asarray(f),
        jnp.asarray(phi),
        obs_vel=None if obs_vel is None else jnp.asarray(obs_vel),
        tau=tau,
        axisymmetric_type=axisym,
    )
    np.testing.assert_allclose(np.asarray(f_j), f_o, rtol=3e-5, atol=3e-6)
