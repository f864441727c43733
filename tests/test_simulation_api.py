"""The reference-parity wrapper API (SimulationParameters/Runner).

Drives the wrappers exactly like the reference demo loops do and checks
they agree with the scene-layer implementation.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from jrl_lbm_tpu import SimulationParameters, SimulationRunner
from jrl_lbm_tpu.models import shear_layer as sl
from jrl_lbm_tpu.utils.types import CellType, KBCType


def _params(res=(32, 32), tau=0.6, axisym=0, contact=0.5 * math.pi):
    return SimulationParameters(
        dim=2,
        simulation_size=(1, 1, *res),
        dt=1.0,
        density_gas=0.038,
        density_fluid=0.265,
        contact_angle=contact,
        Q=9,
        tau=tau,
        axisymmetric_type=axisym,
    )


def test_runner_factories():
    runner = SimulationRunner(_params())
    prop = runner.create_propagation()
    macro = runner.create_macro_compute()
    bgk = runner.create_collision()
    kbc = runner.create_collision_KBC()
    mrt = runner.create_collision_MRT()
    sfc = runner.create_LBM_fluid_solid_coupling()
    assert bgk.KIND == "bgk" and kbc.KIND == "kbc" and mrt.KIND == "mrt"
    assert prop.axisymmetric_type == 0 and sfc.axisymmetric_type == 0
    runner.step()
    assert runner.frame == 1


def test_runner_raises_for_3d():
    p = SimulationParameters(dim=3, simulation_size=(1, 1, 8, 8, 8))
    runner = SimulationRunner(p)
    with pytest.raises(RuntimeError):
        runner.create_propagation()


def test_demo_loop_via_wrappers_matches_scene():
    """The reference demo_2d_LBM loop written against our wrapper API
    must reproduce the shear-layer scene step exactly."""
    cfg = sl.ShearLayerConfig(res=(32, 32), Re=1000.0)
    state, fields = sl.init(cfg)

    runner = SimulationRunner(_params(res=(32, 32), tau=cfg.tau))
    prop = runner.create_propagation()
    macro = runner.create_macro_compute()
    collision = runner.create_collision()

    f = state["f"]
    density = state["rho"]
    vel = state["vel"]
    flags = fields["flags"]
    force = fields["force"]
    for _ in range(10):
        f = prop.propagation(f=f, flags=flags)
        density, vel = macro.macro_compute(f=f, rho=density, vel=vel, flags=flags)
        f = collision.collision(
            f=f, rho=density, vel=vel, flags=flags, force=force, KBC_type=None
        )
        runner.step()

    ref = sl.make_runner(cfg)(state, fields, 10)
    np.testing.assert_allclose(
        np.asarray(f), np.asarray(ref["f"]), rtol=1e-5, atol=1e-7
    )


def test_kbc_wrapper_collision_runs():
    runner = SimulationRunner(_params())
    kbc = runner.create_collision_KBC()
    kbc.preset_KBC(dx=1.0, dt=1.0, tau=0.7)
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.uniform(0.05, 0.2, (9, 16, 16)).astype(np.float32))
    rho = jnp.sum(f, axis=0)
    vel = jnp.zeros((2, 16, 16), jnp.float32)
    flags = jnp.full((16, 16), int(CellType.FLUID), jnp.int32)
    out = kbc.collision(
        f=f, rho=rho, vel=vel, flags=flags, force=None,
        KBC_type=int(KBCType.KBC_C),
    )
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(
        np.asarray(out.sum(0)), np.asarray(rho), rtol=1e-4
    )


def test_propagation_tuple_return_contract():
    """Tuple iff inflow info supplied (`LBM_propagation_2d.py:51-92`)."""
    runner = SimulationRunner(_params())
    prop = runner.create_propagation()
    f = jnp.ones((9, 8, 8), jnp.float32)
    flags = jnp.full((8, 8), int(CellType.FLUID), jnp.int32)
    single = prop.propagation(f=f, flags=flags)
    assert isinstance(single, jnp.ndarray)
    rho = jnp.ones((8, 8), jnp.float32)
    vel = jnp.zeros((2, 8, 8), jnp.float32)
    out = prop.propagation(
        f=f, flags=flags, rho=rho, vel=vel,
        inflow_density=1.0, inflow_vel=np.array([0.0, 0.01], np.float32),
    )
    assert isinstance(out, tuple) and len(out) == 3


def test_rebounce_wrapper():
    runner = SimulationRunner(_params())
    prop = runner.create_propagation()
    f = jnp.arange(9, dtype=jnp.float32)[:, None, None] * jnp.ones((9, 4, 4))
    flags = jnp.full((4, 4), int(CellType.OBSTACLE), jnp.int32)
    out = np.asarray(prop.rebounce_obstacle(f, flags))
    np.testing.assert_allclose(out[:, 0, 0], [0, 3, 4, 1, 2, 7, 8, 5, 6])
