#!/usr/bin/env python
"""Ethaline sweep slice: the top-3 Re x 7 Pe grid cases plus the two
showcase cases (the reference demo's default Pe=0.01 and the
physically-coupled Pe = vel*a/D = 184).

The shared `_ethaline_g9/C_balance.h5` is seeded by the coarsest-dt
grid case (Re=3e-5, Pe=1e-3), which runs at tau_D = 1.0 — the same
discretization the reference's own batch order (Res descending, Pes
ascending) would produce. Seeding from a vel-clamped high-Pe case
instead would bake an under-converged tau_D=0.51 balance into every
record (D_lat = 0.0035 needs ~4.6e6 steps to relax the 128-cell domain;
the 600-s contract only provides ~1e6 there).

The driver is resumable (skip_existing + the balance h5): pass the Re
values to run as argv floats (`python run_ethaline_cases.py 1e-5 7e-6`)
to complete the remaining reference Res incrementally. Fluid-phase cost
scales as ~0.0145/Re seconds on the tunnel (total_steps ~ 1/Re):
Re=1e-5 ~ 24 min, 7e-6 ~ 35 min, 3e-6 ~ 80 min, 1e-6 ~ 4 h.
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

RES = [1e-4, 7e-5, 3e-5]
PES = [1e-3, 3e-3, 7e-3, 1e-2, 3e-2, 7e-2, 1e-1]
RADIUS = 12.5e-6


def run_case(Re, Pe, need_fluid=True):
    vel = Re * batch_Pe.viscs["ethaline"] / RADIUS
    rec = batch_Pe.record_file("ethaline", "ethaline", (128, 64), Re, Pe,
                               True)
    if os.path.exists(rec):
        print(f"[ethaline] skip existing Re={Re} Pe={Pe}", flush=True)
        return
    t0 = time.time()
    print(f"[ethaline] Re={Re} Pe={Pe}", flush=True)
    if need_fluid:
        batch_Pe.fluid_main(shape="ethaline", res=(128, 64), Re=Re,
                            vel_obs_real=vel, gravity_strength_real=-9.8,
                            Rg=4, fluid="ethaline", progress=True)
    batch_Pe.c_main(shape="ethaline", res=(128, 64), balance_time=600,
                    Re=Re, Pe=Pe, vel_obs_real=vel,
                    gravity_strength_real=-9.8, Rg=4, fluid="ethaline",
                    is_negative=True, progress=True)
    print(f"[ethaline] done Re={Re} Pe={Pe} in {time.time() - t0:.0f}s",
          flush=True)


def main(res_list=None):
    t0 = time.time()
    res_list = res_list or RES
    balance = os.path.join(OUT, "_ethaline_g9", "C_balance.h5")
    if not os.path.exists(balance):
        # seed: coarsest-dt grid case at tau_D = 1.0
        run_case(RES[-1], PES[0])
    for Re in res_list:
        for Pe in PES:
            run_case(Re, Pe)
    if res_list is RES:
        # showcase cases: reference-demo default Pe and the physical Pe
        run_case(1e-4, 0.01)
        vel = 1e-4 * batch_Pe.viscs["ethaline"] / RADIUS
        run_case(1e-4, vel * RADIUS / batch_Pe.Ds["ethaline"])
    print(f"[ethaline] total wall {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main([float(a) for a in sys.argv[1:]] or None)
