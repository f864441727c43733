#!/usr/bin/env python
"""Real-chip A/B for k-step temporal blocking of the tiled JRL fluid
kernel (verdict r3 #2).

The JRL fluid phase is the production sweep bottleneck (2027 MLUPS at
1024x512 vs ~10k for the cylinder bench — low-Re ethaline phases cost
hours each). `fused_jrl_tiled._make_fluid_k_kernel` chains k steps per
pallas call behind +-2k-row halo groups (a shrinking A/B level pyramid;
the moving tip advances one row per ~1/vel_obs >> k steps, so geometry
is static within a block and recomputed analytically per level from the
in-kernel step index). This measures k in {1, 2, 4} at the production
ethaline refine-8 grid (1024x512, reference
`demo_2d_LBM_JRL_fluid_ethaline.py:201-236` loop) and checks numerical
equivalence vs the k=1 path over >= 24 steps.

Protocol: docs/PERFORMANCE.md #20 — >= 20k steps per sync window,
best of 3. Writes validation/results/fluid_k.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from jrl_lbm_tpu.models import jrl
from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled as tiled

SMOKE = os.environ.get("JRL_SH_SMOKE", "0") == "1"  # CPU flow check
if SMOKE:
    jax.config.update("jax_platforms", "cpu")
REFINE = 1 if SMOKE else 8
UNROLL = 2 if SMOKE else 8
STEPS = 8 if SMOKE else 20_000
EQ_STEPS = 8 if SMOKE else 24
KS = (2,) if SMOKE else (2, 4)


def _sync(x):
    return float(jnp.sum(x))


def _interp(run):
    if not SMOKE:
        return run
    from jax.experimental.pallas import tpu as pltpu

    def wrapped(*a, **kw):
        with pltpu.force_tpu_interpret_mode():
            return run(*a, **kw)

    return wrapped


def _best(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    visc = 39.4e-6  # ethaline (demo/batch_Pe.py material table)
    re = 1e-6
    cfg = jrl.JRLFluidConfig(
        res=(128, 64), refine=REFINE, shape="ethaline", Re=re,
        vel_obs_real=re * visc / 12.5e-6, gravity_strength_real=0.0,
    )
    H, W = cfg.eff_res
    cells = H * W
    out = {"grid": f"ethaline refine {REFINE}", "eff_res": [H, W],
           "steps": STEPS, "unroll": UNROLL}

    state, fields = jrl.fluid_init(cfg)
    runs = {1: _interp(tiled.make_tiled_fluid_runner(cfg, unroll=UNROLL))}
    for k in KS:
        runs[k] = _interp(
            tiled.make_tiled_fluid_runner(cfg, unroll=UNROLL, k=k))
    run_nosplit = _interp(tiled.make_tiled_fluid_runner(
        cfg, unroll=UNROLL, lean_split=False))

    # equivalence vs k=1 over EQ_STEPS (spans several halo refill cycles)
    ref = runs[1](dict(state), fields, 0, EQ_STEPS)
    for k in KS:
        o = runs[k](dict(state), fields, 0, EQ_STEPS)
        dev = max(
            float(jnp.max(jnp.abs(o[key] - ref[key])))
            for key in ("f", "rho", "vel")
        )
        out[f"k{k}_eq_max_abs_dev"] = dev
        print(f"k={k} equivalence over {EQ_STEPS} steps: "
              f"max|dev|={dev:.3g}", flush=True)

    raw = {}

    def rate(run, start=0, key=None):
        def t():
            _sync(run(dict(state), fields, start, STEPS)["rho"])

        t()  # warm compile
        r = cells * STEPS / _best(t) / 1e6
        if key:
            raw[key] = r
        return round(r, 1)

    for k in sorted(runs):
        out[f"k{k}_mlups"] = rate(runs[k], key=f"k{k}")
        print(f"k={k}: {out[f'k{k}_mlups']} MLUPS", flush=True)

    # lean-split frontier dependence (r5): rate at start 0 (the tip low
    # -> most tiles lean), at 60% travel, and with the split disabled.
    # The production number for a whole phase is the time-average over
    # the uniformly-advancing frontier.
    out["k1_nosplit_mlups"] = rate(run_nosplit, key="ns")
    print(f"k=1 nosplit: {out['k1_nosplit_mlups']} MLUPS", flush=True)
    total = cfg.total_steps
    out["k1_mid_mlups"] = rate(runs[1], start=int(total * 0.6), key="mid")
    print(f"k=1 at 60% travel: {out['k1_mid_mlups']} MLUPS", flush=True)

    base = out.get("k1_mlups")
    for k in KS:
        out[f"k{k}_speedup"] = round(out[f"k{k}_mlups"] / base, 3)

    # re-based sweep wall-clock: the fluid phase runs
    # cfg.total_steps = (H - 1 - inflow_h) / vel_obs steps (vel_obs
    # scales with Re, models/jrl.py:116); report hours at the production
    # ethaline Re ladder for k=1 vs the measured best k. The k=1 rate
    # used for the ladder is the run-average over the advancing
    # frontier: 1/rate averaged over {start, 60%, no-split(late)}
    # thirds of the travel.
    best_k = max([1] + list(KS), key=lambda k: out[f"k{k}_mlups"])
    out["best_k"] = best_k
    k1_avg = 3.0 / (1.0 / raw["k1"] + 1.0 / raw["mid"] + 1.0 / raw["ns"])
    out["k1_run_avg_mlups"] = round(k1_avg, 1)
    ladder = {}
    for re_i in (1e-4, 1e-5, 1e-6):
        c_i = jrl.JRLFluidConfig(
            res=(128, 64), refine=REFINE, shape="ethaline", Re=re_i,
            vel_obs_real=re_i * visc / 12.5e-6, gravity_strength_real=0.0,
        )
        ladder[f"Re{re_i:g}"] = {
            "total_steps": c_i.total_steps,
            "hours_k1_run_avg": round(
                c_i.total_steps * cells / (k1_avg * 1e6) / 3600.0, 3),
            f"hours_k{best_k}_at_start": round(
                c_i.total_steps * cells
                / (raw[f"k{best_k}"] * 1e6) / 3600.0, 3),
        }
    out["fluid_phase_wall_clock"] = ladder

    if not SMOKE:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "fluid_k.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
