"""Streaming op vs the cell-by-cell numpy oracle + invariants."""

import numpy as np
import jax.numpy as jnp
import pytest

from jrl_lbm_tpu.ops.stream import propagate, rebounce_obstacle
from jrl_lbm_tpu.utils.types import AxiSymmetricType, CellType

import oracle


def _random_state(rng, H, W):
    f = rng.uniform(0.1, 1.0, size=(9, H, W)).astype(np.float32)
    rho = rng.uniform(0.5, 1.5, size=(H, W)).astype(np.float32)
    vel = rng.uniform(-0.05, 0.05, size=(2, H, W)).astype(np.float32)
    return f, rho, vel


def _random_flags(rng, H, W, types):
    return rng.choice(types, size=(H, W)).astype(np.int32)


@pytest.mark.parametrize("axisym", [0, 1, 2])
def test_propagate_matches_oracle_random_flags(axisym):
    rng = np.random.default_rng(42 + axisym)
    H, W = 12, 10
    f, rho, vel = _random_state(rng, H, W)
    flags = _random_flags(
        rng,
        H,
        W,
        [
            int(CellType.FLUID),
            int(CellType.FLUID),
            int(CellType.FLUID),
            int(CellType.OBSTACLE),
            int(CellType.OUTFLOW),
            int(CellType.INFLOW),
            int(CellType.INFLOW_2),
        ],
    )
    phi = rng.uniform(-0.5, 1.5, size=(H, W)).astype(np.float32)
    inflow_vel = np.array([0.01, 0.02], dtype=np.float32)
    inflow_density = 0.7

    rho_o, vel_o, f_o = oracle.propagate_oracle(
        f,
        flags,
        phi_obs=phi,
        rho=rho,
        vel=vel,
        inflow_vel=inflow_vel,
        inflow_density=inflow_density,
        axisymmetric_type=axisym,
    )
    rho_j, vel_j, f_j = propagate(
        jnp.asarray(f),
        jnp.asarray(flags),
        phi_obs=jnp.asarray(phi),
        rho=jnp.asarray(rho),
        vel=jnp.asarray(vel),
        inflow_vel=inflow_vel,
        inflow_density=inflow_density,
        axisymmetric_type=axisym,
    )
    np.testing.assert_allclose(np.asarray(f_j), f_o, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(rho_j), rho_o, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(vel_j), vel_o, rtol=1e-6)


def test_propagate_matches_oracle_no_optional_args():
    rng = np.random.default_rng(7)
    H, W = 9, 11
    f, _, _ = _random_state(rng, H, W)
    flags = _random_flags(
        rng, H, W, [int(CellType.FLUID), int(CellType.OBSTACLE), int(CellType.OUTFLOW)]
    )
    _, _, f_o = oracle.propagate_oracle(f, flags)
    _, _, f_j = propagate(jnp.asarray(f), jnp.asarray(flags))
    np.testing.assert_allclose(np.asarray(f_j), f_o, rtol=2e-5, atol=2e-6)


def test_periodic_streaming_is_pure_shift():
    """All-FLUID domain: streaming must equal a circular shift by e_q."""
    rng = np.random.default_rng(0)
    H, W = 8, 16
    f = rng.uniform(size=(9, H, W)).astype(np.float32)
    flags = np.full((H, W), int(CellType.FLUID), np.int32)
    _, _, f_new = propagate(jnp.asarray(f), jnp.asarray(flags))
    from jrl_lbm_tpu import lattice

    for q in range(9):
        ex, ey = int(lattice.E[q, 0]), int(lattice.E[q, 1])
        expect = np.roll(f[q], shift=(ey, ex), axis=(0, 1))
        np.testing.assert_allclose(np.asarray(f_new[q]), expect, rtol=1e-6)


def test_mass_conserved_periodic():
    rng = np.random.default_rng(1)
    H, W = 16, 16
    f = rng.uniform(size=(9, H, W)).astype(np.float32)
    flags = np.full((H, W), int(CellType.FLUID), np.int32)
    _, _, f_new = propagate(jnp.asarray(f), jnp.asarray(flags))
    np.testing.assert_allclose(float(jnp.sum(f_new)), float(np.sum(f)), rtol=1e-5)


def test_rebounce_obstacle_permutation():
    rng = np.random.default_rng(2)
    f = rng.uniform(size=(9, 4, 4)).astype(np.float32)
    flags = np.full((4, 4), int(CellType.FLUID), np.int32)
    flags[1, 2] = int(CellType.OBSTACLE)
    out = np.asarray(rebounce_obstacle(jnp.asarray(f), jnp.asarray(flags)))
    perm = [0, 3, 4, 1, 2, 7, 8, 5, 6]
    np.testing.assert_allclose(out[:, 1, 2], f[perm, 1, 2])
    np.testing.assert_allclose(out[:, 0, 0], f[:, 0, 0])


def test_axis_mirror_on_symmetry_column():
    """On x=0 with LINE_X_EQ_0, incoming q in {1,5,8} pull the mirrored
    channel from the axis column itself (propagation.cu:117-124)."""
    rng = np.random.default_rng(3)
    H, W = 6, 6
    f, rho, vel = _random_state(rng, H, W)
    flags = np.full((H, W), int(CellType.FLUID), np.int32)
    _, _, f_j = propagate(
        jnp.asarray(f),
        jnp.asarray(flags),
        axisymmetric_type=int(AxiSymmetricType.LINE_X_EQ_0),
    )
    _, _, f_o = oracle.propagate_oracle(f, flags, axisymmetric_type=1)
    np.testing.assert_allclose(np.asarray(f_j), f_o, rtol=2e-5, atol=2e-6)
    # spot-check: q=1 at (y=2, x=0) should equal f[3][y=2, x=0]
    np.testing.assert_allclose(np.asarray(f_j)[1, 2, 0], f[3, 2, 0], rtol=1e-6)
