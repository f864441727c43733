"""Vortex-shedding regression gate (slow tier).

Reproduces validation/probe_mini_shedding.py exactly — a CPU-sized
cylinder config (320x160, D=16, Re_D ~ 90, 10% blockage) run to a
saturated shedding limit cycle — and asserts St / Cd / Cl_rms against
the pinned anchor in validation/results/mini_shedding_anchor.json
(St 0.336, Cd 0.8409, Cl_rms 0.7714 at 22k steps).

The blockage inflates St and depresses Cd relative to unconfined
literature values on purpose: the literature-band physics lives in
validation/run_cylinder_shedding*.py (full 800x400 configs on TPU,
blockage-extrapolated in cylinder_shedding_summary.json); THIS test is
the CI tripwire — a regression in streaming, collision, or the
solid-fluid coupling reconstruction (ops/coupling.py) moves these three
numbers far outside the bands below.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from jrl_lbm_tpu.models import cylinder as cyl
from jrl_lbm_tpu.ops.equilibrium import feq
from jrl_lbm_tpu.utils.grid import create_2d_meshgrid

# pinned by validation/probe_mini_shedding.py (validation/results/
# mini_shedding_anchor.json); regenerate the anchor if the config moves
ANCHOR = {"St": 0.336, "Cd_mean": 0.8409, "Cl_rms": 0.7714}


def _perturb_wake(state, cfg, amplitude=0.2):
    """Antisymmetric kick one diameter downstream so the shedding limit
    cycle saturates within the warmup (same as the validation probes)."""
    H, W = cfg.res
    cx, cy = cfg.center
    mesh = create_2d_meshgrid((H, W), dtype=cfg.dtype) + 0.5 * cfg.dx
    x, y = mesh[0], mesh[1]
    r2 = ((x - cx) / cfg.D) ** 2 + ((y - (cy + cfg.D)) / cfg.D) ** 2
    bump = amplitude * cfg.Vmax * jnp.exp(-r2)
    vel = state["vel"].at[0].add(bump.astype(cfg.dtype))
    f = feq(state["rho"], vel, dx=cfg.dx, dt=cfg.dt,
            force=jnp.zeros_like(vel))
    return {"f": f, "rho": state["rho"], "vel": vel}


@pytest.mark.slow
def test_shedding_st_cd_anchor():
    cfg = cyl.CylinderConfig(
        res=(320, 160), Re=1800.0, Vmax=0.1, D=16.0,
        cylinder_center=(80.0, 80.0),
    )
    state, fields = cyl.init(cfg)
    state = _perturb_wake(state, cfg)
    run = cyl.make_runner(cfg)

    warmup, n_samples, every = 12000, 400, 25
    state = run(state, fields, warmup)
    lifts = []
    for _ in range(n_samples):
        state = run(state, fields, every)
        fx, fy = cyl.drag_lift(state, fields, cfg)
        lifts.append((float(fx), float(fy)))
    denom = 0.5 * cfg.density * cfg.Vmax**2 * cfg.D
    cl = np.asarray([l[0] for l in lifts]) / denom
    cd = np.asarray([l[1] for l in lifts]) / denom

    clf = cl - cl.mean()
    spec = np.abs(np.fft.rfft(clf * np.hanning(len(clf)))) ** 2
    freqs = np.fft.rfftfreq(len(clf), d=every)
    st = freqs[int(np.argmax(spec[1:]) + 1)] * cfg.D / cfg.Vmax

    # frequency resolution of the 10000-step window is dSt ~ 0.0064
    assert abs(st - ANCHOR["St"]) <= 0.01, (st, ANCHOR["St"])
    assert abs(cd.mean() - ANCHOR["Cd_mean"]) <= 0.04 * ANCHOR["Cd_mean"], (
        cd.mean(), ANCHOR["Cd_mean"])
    cl_rms = float(np.sqrt((clf**2).mean()))
    assert abs(cl_rms - ANCHOR["Cl_rms"]) <= 0.10 * ANCHOR["Cl_rms"], (
        cl_rms, ANCHOR["Cl_rms"])
    # limit cycle is symmetric: mean lift ~ 0
    assert abs(cl.mean()) < 0.05, cl.mean()
