"""Full-scale JRL water validation case on TPU.

Runs the reference's headline physics workload end-to-end at real
parameters: Re = 3e-4 (vel_obs_real = Re * visc_water / radius, as
batch_validation.py computes), Pe from the water diffusivity, 45-degree
tip with gravity, res 128x64 — the `batch_validation.py` configuration.
Produces the Re_*.h5 artifact and the approach-curve record, then checks
the physics:

* negative-feedback approach curve: current normalized by its far
  plateau must decrease monotonically (after smoothing) as the tip
  approaches the substrate, toward 0 at contact;
* the balance phase must reach a steady inflow integral.

Writes validation/water_Re3e-4/ and prints a one-line JSON verdict.
"""

import json
import os
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "demo"))

os.environ.setdefault("JRL_DEMO_OUT", str(ROOT / "validation" / "water_out"))

import jax

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def main():
    from _jrl_main import c_main, fluid_main
    from plot_utils import load_approach_curve

    visc = 0.89e-6
    D_w = 7.85e-10
    radius = 12.5e-6
    Re = 3e-4
    vel_obs = Re * visc / radius
    Pe = vel_obs * radius / D_w
    print(f"Re={Re} Pe={Pe} vel_obs_real={vel_obs}", flush=True)

    fluid_main(
        shape="45degree", res=(128, 64), Re=Re, vel_obs_real=vel_obs,
        gravity_strength_real=-9.8, Rg=4, progress=True,
    )
    rec = c_main(
        shape="45degree", res=(128, 64), balance_time=600, Re=Re, Pe=Pe,
        vel_obs_real=vel_obs, gravity_strength_real=-9.8, Rg=4,
        is_negative=True, progress=True,
    )
    assert rec is not None

    xs, cur = load_approach_curve(rec, is_negative=True)
    # physics checks: finite, positive plateau, decaying toward contact
    ok_finite = bool(np.isfinite(cur).all())
    plateau = float(np.mean(cur[30:40]))
    near = float(np.mean(cur[:5]))  # closest approach (after flip)
    far = float(np.mean(cur[-10:]))
    # negative feedback: near-contact current far below the plateau
    ok_feedback = near < 0.5 * plateau
    # smoothed monotone rise from contact to plateau region
    k = 7
    sm = np.convolve(cur, np.ones(k) / k, mode="valid")
    rises = np.diff(sm[: len(sm) // 2])
    ok_monotone = float((rises >= -0.02).mean()) > 0.9

    verdict = {
        "record": rec,
        "plateau": round(plateau, 4),
        "near_contact": round(near, 4),
        "far": round(far, 4),
        "finite": ok_finite,
        "negative_feedback": bool(ok_feedback),
        "monotone_rise": bool(ok_monotone),
        "pass": bool(ok_finite and ok_feedback and ok_monotone),
    }
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
