#!/usr/bin/env python
"""Top-up for fluid_k.json: the k=2 lean-split rate at 60% travel.

time_fluid_k.py measures the frontier dependence at k=1 only; the
production runner uses k=2 (best_k). This adds k2_mid_mlups and a
k=2 run-average (harmonic over start / mid / full-kernel fallback,
like k1_run_avg_mlups) and recomputes the wall-clock ladder rows for
the best k. Updates validation/results/fluid_k.json in place.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from jrl_lbm_tpu.models import jrl
from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled as tiled

STEPS = 20_000
RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def main():
    visc = 39.4e-6
    re = 1e-6
    cfg = jrl.JRLFluidConfig(
        res=(128, 64), refine=8, shape="ethaline", Re=re,
        vel_obs_real=re * visc / 12.5e-6, gravity_strength_real=0.0,
    )
    H, W = cfg.eff_res
    cells = H * W
    state, fields = jrl.fluid_init(cfg)
    run = tiled.make_tiled_fluid_runner(cfg, unroll=8, k=2)

    def rate(start):
        def t():
            return float(jnp.sum(
                run(dict(state), fields, start, STEPS)["rho"]))

        t()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            t()
            best = min(best, time.perf_counter() - t0)
        return cells * STEPS / best / 1e6

    mid = rate(int(cfg.total_steps * 0.6))
    print(f"k=2 at 60% travel: {mid:.1f} MLUPS", flush=True)
    late = rate(int(cfg.total_steps * 0.95))  # frontier high: full k=2
    print(f"k=2 at 95% travel: {late:.1f} MLUPS", flush=True)

    path = os.path.join(RESULTS, "fluid_k.json")
    with open(path) as f:
        out = json.load(f)
    out["k2_mid_mlups"] = round(mid, 1)
    out["k2_late_mlups"] = round(late, 1)
    k2_avg = 3.0 / (1.0 / out["k2_mlups"] + 1.0 / mid + 1.0 / late)
    out["k2_run_avg_mlups"] = round(k2_avg, 1)
    for key, row in out["fluid_phase_wall_clock"].items():
        row["hours_k2_run_avg"] = round(
            row["total_steps"] * cells / (k2_avg * 1e6) / 3600.0, 3)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
