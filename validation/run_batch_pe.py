#!/usr/bin/env python
"""Production water Re x Pe sweep driver (round-3 verdict task 1).

Runs `demo/batch_Pe.py` in-process against a dedicated output directory,
resumable via --skip_existing. Artifacts land in
validation/sweep_out/_45degree_g9/: the shared C_balance.h5, per-Re
Re_*.h5 fluid histories, and records/record_res64_Re*_Pe*.txt — the
inputs of demo_plot_Pe/demo_plot_similarity/demo_plot_water.
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


def seed_balance(fluid: str, res=(128, 64), is_negative: bool = True) -> None:
    """Run the cheapest sweep case first so it creates the shared C_balance.h5.

    The balance h5 lives at a per-(shape, fluid, g) path with no Re/Pe in
    it (`demo/_jrl_main.py:182`), mirroring the reference's skip-if-exists
    contract (`/root/reference/demo/demo_2d_LBM_JRL_C_ethaline.py` writes/
    reads one `C_balance.h5` shared by every case the batch loop runs) —
    whichever case runs first discretizes the 600 physical seconds of
    balance with its dt. All 70 water cases cap tau_D at 1.0, so the
    per-step balance map is IDENTICAL across cases; only the step count
    (600 s / dt_real) differs, and every case is >=300x past the ~2e5-step
    grid diffusion time. Seeding with the coarsest-dt case (Re=7e-5,
    Pe=1e-3: 6.1e7 steps, ~2 min) therefore reaches the same steady state
    as the sweep-order default (Re=1e-2: 8.7e9 steps, ~2.8 h) at 1/140th
    the cost. docs/STATUS.md records this choice.
    """
    if is_negative:
        Re, Pe = (7e-5, 1e-3) if fluid == "water" else (1e-6, 1e-3)
    else:
        # positive-feedback water Res list is [3e-3, 1e-3, 7e-4]; the
        # coarsest dt in it with a ~300x converged balance is (7e-4, 1e-2)
        Re, Pe = 7e-4, 1e-2
    vel = Re * batch_Pe.viscs[fluid] / 12.5e-6
    shape = batch_Pe.shapes[fluid]
    rec = batch_Pe.record_file(fluid, shape, tuple(res), Re, Pe, is_negative)
    if os.path.exists(rec):
        print(f"[run_batch_pe] seed case already done: {rec}", flush=True)
        return
    t0 = time.time()
    print(f"[run_batch_pe] seeding balance via Re={Re} Pe={Pe} "
          f"neg={is_negative}", flush=True)
    batch_Pe.fluid_main(shape=shape, res=res, Re=Re, vel_obs_real=vel,
                        gravity_strength_real=-9.8, Rg=4, fluid=fluid,
                        progress=True)
    batch_Pe.c_main(shape=shape, res=res, balance_time=600, Re=Re, Pe=Pe,
                    vel_obs_real=vel, gravity_strength_real=-9.8, Rg=4,
                    fluid=fluid, is_negative=is_negative, progress=True)
    print(f"[run_batch_pe] seed case done in {time.time() - t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    fluid = sys.argv[1] if len(sys.argv) > 1 else "water"
    is_negative = "positive" not in sys.argv[2:]
    t0 = time.time()
    print(f"[run_batch_pe] devices={jax.devices()} fluid={fluid} out={OUT} "
          f"neg={is_negative}", flush=True)
    seed_balance(fluid, is_negative=is_negative)
    batch_Pe.main(fluid=fluid, is_negative=is_negative, res=(128, 64),
                  skip_existing=True, progress=True)
    print(f"[run_batch_pe] total wall {time.time() - t0:.0f}s", flush=True)
