#!/usr/bin/env python
"""Real-chip rates for the FLAT-tip JRL fluid phase with the r5
below-tip tile class.

The ethaline A/B (`time_fluid_k.py` -> fluid_k.json) measures the
45-degree wedge, where only the full/lean split applies. Flat tips
(reference `demo_2d_LBM_JRL_fluid_cylinder.py:201-236` /
`infiniteplane`) additionally get the below-tip class: tiles fully
under the tip run lane-static-geometry bodies, which lifts the
mid/late-travel rates the lean class cannot reach. Measures k=2 at
start / 60% / 95% travel on a 1024x512 flat grid and reports the
harmonic run average. Writes validation/results/fluid_flat.json.
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
    # flat tip at the production refine-8 scale: cylinder eff_res
    # ignores `refine`, so the grid is scaled through res directly
    cfg = jrl.JRLFluidConfig(
        res=(1024, 512), refine=1, shape="cylinder", Re=re,
        vel_obs_real=re * visc / 12.5e-6, gravity_strength_real=0.0,
    )
    H, W = cfg.eff_res
    cells = H * W
    state, fields = jrl.fluid_init(cfg)
    out = {"grid": f"cylinder (flat tip) {H}x{W}", "steps": STEPS, "k": 2}

    run = tiled.make_tiled_fluid_runner(cfg, unroll=8, k=2)
    run_ns = tiled.make_tiled_fluid_runner(cfg, unroll=8, k=2,
                                           lean_split=False)

    def rate(r, start):
        def t():
            return float(jnp.sum(
                r(dict(state), fields, start, STEPS)["rho"]))

        t()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            t()
            best = min(best, time.perf_counter() - t0)
        return cells * STEPS / best / 1e6

    total = cfg.total_steps
    raw = {}
    for key, start in (("start", 0), ("mid", int(total * 0.6)),
                       ("late", int(total * 0.95))):
        raw[key] = rate(run, start)
        out[f"k2_{key}_mlups"] = round(raw[key], 1)
        print(f"k=2 {key}: {raw[key]:.1f} MLUPS", flush=True)
    raw["ns"] = rate(run_ns, 0)
    out["k2_nosplit_mlups"] = round(raw["ns"], 1)
    print(f"k=2 nosplit: {raw['ns']:.1f} MLUPS", flush=True)
    avg = 3.0 / (1.0 / raw["start"] + 1.0 / raw["mid"] + 1.0 / raw["late"])
    out["k2_run_avg_mlups"] = round(avg, 1)
    print(f"k=2 run average: {avg:.1f} MLUPS", flush=True)

    path = os.path.join(RESULTS, "fluid_flat.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
