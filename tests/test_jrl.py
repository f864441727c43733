"""End-to-end smoke tests of the JRL tip-approach workloads (tiny configs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from jrl_lbm_tpu.models import jrl


def _tiny_fluid(shape="cylinder"):
    # Large Re so vel_obs is big and total_steps small. vel_obs_real must
    # be consistent with Re (vel_obs_real = Re * visc_real / radius_real,
    # as batch_validation.py computes it), otherwise the Froude-similarity
    # gravity conversion produces enormous lattice gravity.
    Re = 4.0
    visc_real = 0.89e-6
    vel_obs_real = Re * visc_real / 1.25e-5
    return jrl.JRLFluidConfig(
        res=(48, 32), Re=Re, vel_obs_real=vel_obs_real, shape=shape
    )


def test_fluid_config_unit_conversion():
    cfg = _tiny_fluid()
    assert cfg.radius_obs == pytest.approx(6.50000000000001)
    assert cfg.inflow_height_int == 21  # int(20.5000000000001 + 0.5)
    assert cfg.visc == pytest.approx(1.0 / 6.0)
    assert cfg.vel_obs == pytest.approx(4.0 / 6.0 / cfg.radius_obs)
    assert cfg.Rg_radius == int(4 * cfg.radius_obs + 0.5)
    assert cfg.total_steps == int((48 - 1 - cfg.inflow_height_int) / cfg.vel_obs)


@pytest.mark.parametrize(
    "shape", [pytest.param("cylinder", marks=pytest.mark.slow), "45degree"]
)
def test_fluid_phase_runs_and_records(shape):
    cfg = _tiny_fluid(shape)
    snapshots, state = jrl.run_fluid_phase(cfg)
    assert np.all(np.isfinite(np.asarray(state["f"])))
    assert snapshots.shape[1:] == (2, 48, 32)
    assert snapshots.shape[0] == len(jrl.fluid_record_steps(cfg))
    assert np.all(np.isfinite(snapshots))
    # normalized velocities should be O(1) near the moving tip
    assert np.abs(snapshots).max() < 50.0


def test_c_phase_balance_and_approach():
    fcfg = _tiny_fluid("cylinder")
    snapshots, _ = jrl.run_fluid_phase(fcfg)

    ccfg = jrl.JRLCConfig(
        res=(48, 32), balance_time=1.0, Re=4.0, Pe=5.0,
        vel_obs_real=21e-6, shape="cylinder", is_negative=True,
    )
    assert ccfg.vel_obs_conv == pytest.approx(0.1)
    assert 0.5 < ccfg.tau_D <= 1.0

    state, fields, flags = jrl.c_init(ccfg)
    run_bal = jrl.make_balance_runner(ccfg, flags)
    n_bal = min(ccfg.balance_steps, 150)
    state = run_bal(state, fields, n_bal)
    C = np.asarray(state["C"])
    assert np.all(np.isfinite(C))
    assert C.min() >= -1e-3 and C.max() <= 1.0 + 1e-3

    fields_a = dict(fields)
    fields_a["vel_field"] = jnp.asarray(snapshots)
    run_app = jrl.make_approach_runner(ccfg)
    n_app = min(ccfg.total_steps, 60)
    (state, acc) = run_app(state, fields_a, jnp.asarray(0, jnp.int32), n_app)
    assert np.all(np.isfinite(np.asarray(state["C"])))
    assert float(acc["count"]) == n_app
    # tip sink at C=0 next to C=1 reservoir: mean inflow integral must be
    # positive and bounded by the full-disk area
    area_total = ccfg.area_array.sum()
    mean_inflow = float(acc["inflow_sum"]) / n_app
    assert 0.0 < mean_inflow < area_total


def test_c_dump_steps_monotone():
    ccfg = jrl.JRLCConfig(res=(48, 32), Re=4.0, Pe=5.0, shape="cylinder")
    steps = jrl.c_dump_steps(ccfg)
    assert len(steps) > 0
    assert all(b > a for a, b in zip(steps, steps[1:]))
    # one dump per lattice unit of travel
    assert len(steps) <= int((48 - 1 - ccfg.inflow_height_int)) + 1


def test_balance_phase_reaches_steady_state():
    """Balance run: C stays in [0,1] and the tip inflow integral
    converges (the reference logs exactly this to balance.txt as its
    steady-state criterion, `C_ethaline:199-263`)."""
    ccfg = jrl.JRLCConfig(
        res=(48, 32), balance_time=50.0, Re=4.0, Pe=5.0,
        vel_obs_real=21e-6, shape="cylinder", is_negative=True,
    )
    state, fields, flags = jrl.c_init(ccfg)
    run = jrl.make_balance_runner(ccfg, flags)
    area = jnp.asarray(ccfg.area_array)
    wi = ccfg.inflow_height_int

    def inflow(s):
        row = s["C"][wi, : ccfg.radius_obs_int]
        return float(jnp.sum(row * area))

    state = run(state, fields, 400)
    v1 = inflow(state)
    state = run(state, fields, 400)
    v2 = inflow(state)
    state = run(state, fields, 400)
    v3 = inflow(state)
    C = np.asarray(state["C"])
    assert np.isfinite(C).all()
    assert C.min() >= -1e-4 and C.max() <= 1.0 + 1e-4
    # converging: successive changes shrink
    assert abs(v3 - v2) < abs(v2 - v1) + 1e-6
    assert v3 > 0
