#!/usr/bin/env python
"""Physically-coupled water approach cases for plot_water (round-3
verdict task 1 follow-up).

`demo_plot_water.py` plots the Re series at the PHYSICAL Peclet number
Pe = vel_obs * a / D (reference `demo_plot_water.py:63-66` — the same
float expression is reproduced here so the record tag matches
`find_record` exactly), which the batch_Pe sweep grid does not contain.
The fluid h5s (per Re) and the shared C_balance.h5 are already cached in
validation/sweep_out by run_batch_pe.py, so each case is approach-only.
"""

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "validation", "sweep_out")
os.makedirs(OUT, exist_ok=True)
os.environ.setdefault("JRL_DEMO_OUT", OUT)

sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "demo"))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import batch_Pe

# demo_plot_water.py:43-55 Re lists; Pe derived per-Re from the material
PLOT_RES = {
    "water": [1e-2, 7e-3, 5e-3, 1e-3, 7e-4, 5e-4, 3e-4, 1e-4, 7e-5],
    "ethaline": [1e-4],
}
RADIUS = 12.5e-6


def main(fluid="water"):
    t0 = time.time()
    visc = batch_Pe.viscs[fluid]
    shape = batch_Pe.shapes[fluid]
    D = batch_Pe.Ds[fluid]
    res_list = PLOT_RES[fluid]
    n_done = 0
    for Re in res_list:
        vel_obs = Re * visc / RADIUS
        Pe = vel_obs * RADIUS / D  # demo_plot_water.py:64-65 floats
        rec = batch_Pe.record_file(fluid, shape, (128, 64), Re, Pe, True)
        if os.path.exists(rec):
            n_done += 1
            print(f"[water_cases] skip existing Re={Re} Pe={Pe}", flush=True)
            continue
        t_case = time.time()
        print(f"[water_cases] {fluid} Re={Re} Pe={Pe}", flush=True)
        batch_Pe.fluid_main(shape=shape, res=(128, 64), Re=Re,
                            vel_obs_real=vel_obs,
                            gravity_strength_real=-9.8, Rg=4, fluid=fluid,
                            progress=True)
        batch_Pe.c_main(shape=shape, res=(128, 64), balance_time=600,
                        Re=Re, Pe=Pe, vel_obs_real=vel_obs,
                        gravity_strength_real=-9.8, Rg=4, fluid=fluid,
                        is_negative=True, progress=True)
        n_done += 1
        print(f"[water_cases] done Re={Re} in {time.time() - t_case:.0f}s "
              f"({n_done}/{len(res_list)})", flush=True)
    print(f"[water_cases] all {n_done}/{len(res_list)} in "
          f"{time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "water")
