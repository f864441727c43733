"""Vmapped Pe sweep vs serial per-Pe runs: record-row parity."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from jrl_lbm_tpu.models import jrl
from jrl_lbm_tpu.parallel import sweep


def _setup():
    Re = 4.0
    visc_real = 0.89e-6
    vel_obs_real = Re * visc_real / 1.25e-5
    fcfg = jrl.JRLFluidConfig(
        res=(48, 32), Re=Re, vel_obs_real=vel_obs_real,
        gravity_strength_real=0.0, shape="cylinder",
    )
    snapshots, _ = jrl.run_fluid_phase(fcfg)
    ccfg = jrl.JRLCConfig(
        res=(48, 32), balance_time=0.5, Re=Re, Pe=1.0,
        vel_obs_real=vel_obs_real, gravity_strength_real=0.0,
        shape="cylinder", is_negative=True,
    )
    state, fields, flags = jrl.c_init(ccfg)
    run_bal = jrl.make_balance_runner(ccfg, flags)
    state = run_bal(state, fields, 100)
    fields = dict(fields)
    fields["vel_field"] = jnp.asarray(snapshots)
    return ccfg, state, fields


def _serial_records(cfg, state, fields):
    run = jrl.make_approach_runner(cfg)
    dumps = jrl.c_dump_steps(cfg)
    rows = []
    cur = 0
    st = dict(state)
    for s in dumps:
        st, acc = run(st, fields, jnp.asarray(cur, jnp.int32), s + 1 - cur)
        cur = s + 1
        cnt = max(float(acc["count"]), 1.0)
        rows.append(
            [
                (s + 1) * cfg.dt_conv_real * cfg.vel_obs_real * 1e6,
                float(acc["inflow_sum"]) / cnt,
                float(acc["current_sum"]) / cnt,
                float(acc["rec_u"]),
                float(acc["rec_v"]),
            ]
        )
    return np.asarray(rows, np.float32)


@pytest.mark.slow
def test_pe_sweep_matches_serial():
    ccfg, state, fields = _setup()
    Pes = [2.0, 5.0]

    # lanes share the initial state
    states = {
        "C": jnp.stack([state["C"]] * len(Pes)),
        "h": jnp.stack([state["h"]] * len(Pes)),
    }
    result = sweep.pe_sweep_approach(ccfg, Pes, states, fields, chunk=64)

    for k, Pe in enumerate(Pes):
        cfg_k = dataclasses.replace(ccfg, Pe=Pe)
        serial = _serial_records(cfg_k, state, fields)
        nd = int(result.n_dumps[k])
        assert nd == len(serial), (nd, len(serial))
        got = result.records[k, :nd]
        np.testing.assert_allclose(got, serial, rtol=2e-4, atol=2e-4)


def test_pe_sweep_lane_sharded_matches_single_device():
    """Cross-device lane sharding (VERDICT r3 #7): 3 Pe lanes sharded
    over 2 CPU devices reproduce the single-device vmapped records
    exactly — incl. the lane padding to a device-count multiple.
    Reference form: one OS process per Pe (`demo/batch_Pe.py:47-52`)."""
    import jax

    ccfg, state, fields = _setup()
    Pes = [2.0, 5.0, 9.0]
    states = {
        "C": jnp.stack([state["C"]] * len(Pes)),
        "h": jnp.stack([state["h"]] * len(Pes)),
    }
    base = sweep.pe_sweep_approach(ccfg, Pes, states, fields, chunk=64)
    shr = sweep.pe_sweep_approach(
        ccfg, Pes, states, fields, chunk=64,
        lane_devices=jax.devices()[:2],
    )
    np.testing.assert_array_equal(shr.n_dumps, base.n_dumps)
    # last-ulp only: sharding changes XLA's reduction tiling for the
    # grid sums inside the step, so bit-exactness across partitionings
    # is not guaranteed (cf. the 2e-4 serial-parity tolerance above)
    np.testing.assert_allclose(shr.records, base.records, rtol=2e-6,
                               atol=2e-6)


def test_write_sweep_records(tmp_path):
    ccfg, state, fields = _setup()
    Pes = [5.0]
    states = {
        "C": jnp.stack([state["C"]]),
        "h": jnp.stack([state["h"]]),
    }
    result = sweep.pe_sweep_approach(ccfg, Pes, states, fields, chunk=64)
    paths = sweep.write_sweep_records(result, ccfg, str(tmp_path), Re=4.0)
    assert len(paths) == 1
    lines = open(paths[0]).read().splitlines()
    assert lines[0] == "Step Inflow Current u, v"
    assert len(lines) == int(result.n_dumps[0]) + 1


@pytest.mark.slow
def test_batch_pe_vmapped_row(tmp_path, monkeypatch):
    """End-to-end wiring of the vmapped lanes into the batch driver
    (`demo/batch_Pe.py::run_re_vmapped`): one Re row = fluid phase +
    one serial lane (seeds the shared balance h5) + the remaining Pe
    lanes as one vmapped device program. Asserts every lane's record
    file lands with the reference's column format and that re-running
    the row is a no-op (skip-if-exists resumability)."""
    import os
    import sys

    ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.setenv("JRL_DEMO_OUT", str(tmp_path))
    monkeypatch.syspath_prepend(os.path.join(ROOT, "demo"))
    import batch_Pe

    Re = 4.0
    vel_obs = Re * 0.89e-6 / 1.25e-5
    Pes = [2.0, 5.0, 9.0]
    n = batch_Pe.run_re_vmapped(
        "water", "cylinder", (48, 32), Re, Pes, True, vel_obs,
        progress=False, balance_time=5e-4, Rg=4, g_real=0.0)
    assert n == 3

    for Pe in Pes:
        rec = batch_Pe.record_file(
            "water", "cylinder", (48, 32), Re, Pe, True, g_real=0.0)
        lines = open(rec).read().splitlines()
        assert lines[0] == "Step Inflow Current u, v"
        rows = np.loadtxt(lines[1:])
        assert rows.shape[0] >= 20 and rows.shape[1] == 5
        assert np.all(np.isfinite(rows))
        # the approach current must be nonzero by the end of travel
        assert abs(rows[-1, 2]) > 0 or abs(rows[-1, 1]) > 0

    # resumable: all records exist, so the row reruns as a no-op
    assert batch_Pe.run_re_vmapped(
        "water", "cylinder", (48, 32), Re, Pes, True, vel_obs,
        progress=False, balance_time=5e-4, Rg=4, g_real=0.0) == 0
