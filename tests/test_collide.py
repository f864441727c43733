"""Collision operator invariants: feq moments, conservation, MRT/KBC."""

import numpy as np
import jax.numpy as jnp
import pytest

from jrl_lbm_tpu import lattice
from jrl_lbm_tpu.ops.equilibrium import feq
from jrl_lbm_tpu.ops.collide import (
    bgk_collide,
    kbc_collide,
    mrt_collide,
    mrt_matrices,
)
from jrl_lbm_tpu.utils.types import CellType, KBCType


def test_feq_moments():
    """sum_q feq = rho; sum_q feq e_q = rho u (2nd-order D2Q9 identity)."""
    rng = np.random.default_rng(0)
    H, W = 8, 8
    rho = rng.uniform(0.5, 1.5, size=(H, W)).astype(np.float32)
    vel = rng.uniform(-0.05, 0.05, size=(2, H, W)).astype(np.float32)
    f = np.asarray(feq(jnp.asarray(rho), jnp.asarray(vel)))
    np.testing.assert_allclose(f.sum(axis=0), rho, rtol=1e-5)
    mom_x = np.einsum("qhw,q->hw", f, lattice.E[:, 0].astype(np.float64))
    mom_y = np.einsum("qhw,q->hw", f, lattice.E[:, 1].astype(np.float64))
    np.testing.assert_allclose(mom_x, rho * vel[0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(mom_y, rho * vel[1], rtol=1e-4, atol=1e-6)


def test_feq_half_force_shift():
    """Force shifts the equilibrium velocity by F/(2 rho) (Guo)."""
    H, W = 4, 4
    rho = jnp.ones((H, W))
    vel = jnp.zeros((2, H, W))
    force = jnp.stack([jnp.full((H, W), 0.02), jnp.zeros((H, W))])
    f1 = feq(rho, vel, force=force)
    f2 = feq(rho, vel + force / (2.0 * rho[None]))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-6)


def test_bgk_fixed_point():
    """f = feq is a fixed point of BGK (no force, no axisymmetry)."""
    rng = np.random.default_rng(1)
    H, W = 8, 8
    rho = rng.uniform(0.5, 1.5, size=(H, W)).astype(np.float32)
    vel = rng.uniform(-0.05, 0.05, size=(2, H, W)).astype(np.float32)
    flags = jnp.full((H, W), int(CellType.FLUID), jnp.int32)
    f0 = feq(jnp.asarray(rho), jnp.asarray(vel))
    f1 = bgk_collide(f0, jnp.asarray(rho), jnp.asarray(vel), flags, tau=0.8)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=1e-5, atol=1e-7)


def test_bgk_conserves_mass_momentum():
    rng = np.random.default_rng(2)
    H, W = 8, 8
    f = rng.uniform(0.05, 0.2, size=(9, H, W)).astype(np.float32)
    flags = jnp.full((H, W), int(CellType.FLUID), jnp.int32)
    rho = f.sum(axis=0)
    e = lattice.E.astype(np.float64)
    vel = np.stack(
        [np.einsum("qhw,q->hw", f, e[:, 0]), np.einsum("qhw,q->hw", f, e[:, 1])]
    ) / rho[None]
    f1 = np.asarray(
        bgk_collide(
            jnp.asarray(f), jnp.asarray(rho.astype(np.float32)),
            jnp.asarray(vel.astype(np.float32)), flags, tau=0.9,
        )
    )
    np.testing.assert_allclose(f1.sum(axis=0), rho, rtol=1e-5)
    np.testing.assert_allclose(
        np.einsum("qhw,q->hw", f1, e[:, 0]), rho * vel[0], rtol=1e-4, atol=1e-6
    )


def test_bgk_obstacle_passthrough():
    rng = np.random.default_rng(3)
    H, W = 6, 6
    f = rng.uniform(0.05, 0.2, size=(9, H, W)).astype(np.float32)
    rho = f.sum(axis=0)
    vel = np.zeros((2, H, W), np.float32)
    flags = np.full((H, W), int(CellType.FLUID), np.int32)
    flags[2, 3] = int(CellType.OBSTACLE)
    f1 = np.asarray(
        bgk_collide(jnp.asarray(f), jnp.asarray(rho), jnp.asarray(vel),
                    jnp.asarray(flags), tau=0.6)
    )
    np.testing.assert_allclose(f1[:, 2, 3], f[:, 2, 3])


def test_mrt_matrix_identities():
    """With all rates equal to 1/tau, MRT reduces to BGK."""
    tau = 0.8
    M = np.array(
        [
            [1, 1, 1, 1, 1, 1, 1, 1, 1],
            [-4, -1, -1, -1, -1, 2, 2, 2, 2],
            [4, -2, -2, -2, -2, 1, 1, 1, 1],
            [0, 1, 0, -1, 0, 1, -1, -1, 1],
            [0, -2, 0, 2, 0, 1, -1, -1, 1],
            [0, 0, 1, 0, -1, 1, 1, -1, -1],
            [0, 0, -2, 0, 2, 1, 1, -1, -1],
            [0, 1, -1, 1, -1, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 1, -1, 1, -1],
        ],
        dtype=np.float64,
    )
    A = np.linalg.inv(M) @ ((1.0 / tau) * np.eye(9)) @ M
    np.testing.assert_allclose(A, np.eye(9) / tau, atol=1e-12)

    # the framework's matrices: conserved moments (rho, jx, jy rows of M
    # with rate 0) must be exactly preserved by M^-1 S M
    MinvSM, _ = mrt_matrices(tau)
    # rho row of M is all ones -> ones @ MinvSM should be 0 (rate s0=0)
    np.testing.assert_allclose(np.ones(9) @ MinvSM, 0.0, atol=1e-12)


def test_mrt_conserves_and_fixed_point():
    rng = np.random.default_rng(4)
    H, W = 8, 8
    rho = rng.uniform(0.5, 1.5, size=(H, W)).astype(np.float32)
    vel = rng.uniform(-0.05, 0.05, size=(2, H, W)).astype(np.float32)
    flags = jnp.full((H, W), int(CellType.FLUID), jnp.int32)
    MinvSM, _ = mrt_matrices(0.7)
    f0 = feq(jnp.asarray(rho), jnp.asarray(vel))
    f1 = mrt_collide(
        f0, jnp.asarray(rho), jnp.asarray(vel), flags, minv_s_m=MinvSM, tau=0.7
    )
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=1e-4, atol=1e-6)

    f = jnp.asarray(rng.uniform(0.05, 0.2, size=(9, H, W)).astype(np.float32))
    rho2 = jnp.sum(f, axis=0)
    e = lattice.E.astype(np.float64)
    fn = np.asarray(f)
    vel2 = np.stack(
        [np.einsum("qhw,q->hw", fn, e[:, 0]), np.einsum("qhw,q->hw", fn, e[:, 1])]
    ) / np.asarray(rho2)[None]
    f2 = np.asarray(
        mrt_collide(
            f, rho2, jnp.asarray(vel2.astype(np.float32)), flags,
            minv_s_m=MinvSM, tau=0.7,
        )
    )
    np.testing.assert_allclose(f2.sum(axis=0), np.asarray(rho2), rtol=1e-5)


@pytest.mark.parametrize(
    "kbc_type", [KBCType.LBGK, KBCType.KBC_A, KBCType.KBC_B, KBCType.KBC_C, KBCType.KBC_D]
)
def test_kbc_equilibrium_fixed_point(kbc_type):
    """At f = feq: ds = dh = 0, so Omega = 0 for every KBC variant."""
    rng = np.random.default_rng(5)
    H, W = 8, 8
    rho = rng.uniform(0.5, 1.5, size=(H, W)).astype(np.float32)
    vel = rng.uniform(-0.05, 0.05, size=(2, H, W)).astype(np.float32)
    flags = jnp.full((H, W), int(CellType.FLUID), jnp.int32)
    f0 = feq(jnp.asarray(rho), jnp.asarray(vel))
    f1 = kbc_collide(
        f0, jnp.asarray(rho), jnp.asarray(vel), flags, tau=0.8,
        kbc_type=int(kbc_type),
    )
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=1e-4, atol=1e-5)


def test_kbc_lbgk_equals_bgk():
    """KBC with LBGK type (gamma=2) must reproduce plain BGK."""
    rng = np.random.default_rng(6)
    H, W = 8, 8
    f = jnp.asarray(rng.uniform(0.05, 0.2, size=(9, H, W)).astype(np.float32))
    rho = jnp.sum(f, axis=0)
    vel = jnp.zeros((2, H, W), jnp.float32)
    flags = jnp.full((H, W), int(CellType.FLUID), jnp.int32)
    tau = 0.75
    f_kbc = kbc_collide(f, rho, vel, flags, tau=tau, kbc_type=int(KBCType.LBGK))
    f_bgk = bgk_collide(f, rho, vel, flags, tau=tau)
    np.testing.assert_allclose(np.asarray(f_kbc), np.asarray(f_bgk), rtol=1e-5, atol=1e-7)


def test_kbc_conserves_mass():
    rng = np.random.default_rng(7)
    H, W = 8, 8
    f = jnp.asarray(rng.uniform(0.05, 0.2, size=(9, H, W)).astype(np.float32))
    rho = jnp.sum(f, axis=0)
    e = lattice.E.astype(np.float64)
    fn = np.asarray(f)
    vel = np.stack(
        [np.einsum("qhw,q->hw", fn, e[:, 0]), np.einsum("qhw,q->hw", fn, e[:, 1])]
    ) / np.asarray(rho)[None]
    flags = jnp.full((H, W), int(CellType.FLUID), jnp.int32)
    for kbc in (KBCType.KBC_A, KBCType.KBC_C):
        f1 = np.asarray(
            kbc_collide(
                f, rho, jnp.asarray(vel.astype(np.float32)), flags,
                tau=0.8, kbc_type=int(kbc),
            )
        )
        np.testing.assert_allclose(f1.sum(axis=0), np.asarray(rho), rtol=1e-4)
