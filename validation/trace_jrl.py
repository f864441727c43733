#!/usr/bin/env python
"""jax.profiler device trace of the tiled JRL fluid kernel pair.

Companion to `trace_bench.py` (same parsing), aimed at the production
bottleneck: the 1024x512 ethaline refine-8 fluid phase. Splits the
per-step wall between the A kernel (stream+SFC+macro), the B kernel
(axisymmetric BGK) and inter-dispatch gaps, so the next optimization
targets the real cost instead of the jaxpr slot model (which
overpredicted the r5 diet: slots 3421->1758 but measured only
1949.6->2353 MLUPS at k=1). Writes validation/results/trace_jrl.json.
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
from trace_bench import _parse  # same xplane summarizer

TRACE_DIR = "/tmp/trace_jrl"
STEPS = 512
K = int(os.environ.get("JRL_TRACE_K", "2"))


def _hb(msg):
    print(f"[trace_jrl {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    visc = 39.4e-6
    re = 1e-6
    cfg = jrl.JRLFluidConfig(
        res=(128, 64), refine=8, shape="ethaline", Re=re,
        vel_obs_real=re * visc / 12.5e-6, gravity_strength_real=0.0,
    )
    H, W = cfg.eff_res
    state, fields = jrl.fluid_init(cfg)
    run = tiled.make_tiled_fluid_runner(cfg, unroll=8, k=K) if K > 1 else \
        tiled.make_tiled_fluid_runner(cfg, unroll=8)
    _hb(f"warmup ({H}x{W}, k={K})")
    out = run(dict(state), fields, 0, 64)
    float(jnp.sum(out["rho"]))

    _hb(f"tracing {STEPS}-step window")
    jax.profiler.start_trace(TRACE_DIR)
    t0 = time.perf_counter()
    out = run(dict(state), fields, 0, STEPS)
    float(jnp.sum(out["rho"]))
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    mlups = H * W * STEPS / wall / 1e6
    _hb(f"traced window: {mlups:.0f} MLUPS; parsing")

    summary = _parse(TRACE_DIR)
    res = {
        "config": f"ethaline refine 8 {H}x{W}, k={K}, unroll=8",
        "steps": STEPS,
        "window_wall_s": round(wall, 4),
        "window_mlups": round(mlups, 1),
        "note": "traced window includes profiler overhead; fluid_k.json "
                "holds the untraced rates",
        "device_planes": summary,
    }
    tag = os.environ.get("JRL_TRACE_TAG", "")
    name = f"trace_jrl_{tag}.json" if tag else "trace_jrl.json"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", name)
    with open(path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
