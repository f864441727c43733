#!/usr/bin/env python
"""Time the fused cylinder runner at the bench config across temporal
blocking depths and interior tile heights (round-3 verdict task 2).

Usage: python validation/time_bench_variants.py [k:T ...]
Defaults to 2:32 4:32 4:64. One process, sequential variants; each
timed as best-of-3 600-step windows with a single host-fetch sync per
window (docs/PERFORMANCE.md #20).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from jrl_lbm_tpu.models import cylinder as cyl
from jrl_lbm_tpu.ops.pallas import fused_step as fs


def main():
    variants = sys.argv[1:] or ["2:32", "4:32", "4:64"]
    res = (2048, 2048)
    cfg = cyl.CylinderConfig(res=res, D=64.0, Re=5000.0)
    cells = res[0] * res[1]
    steps = 600
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "bench_variants.json")
    results = {}
    if os.path.exists(out):  # accumulate across invocations
        with open(out) as fo:
            results = json.load(fo)
    for v in variants:
        parts = [int(x) for x in v.split(":")]
        (k, t), bt = parts[:2], (parts[2] if len(parts) > 2 else 8)
        state, fields = cyl.init(cfg)
        stepk = fs.make_fused_step2(cfg, tile_rows=bt, interior_rows=t, k=k)
        if stepk is None:
            print(json.dumps({"variant": v, "error": "no split geometry"}),
                  flush=True)
            continue
        step1 = fs.make_fused_step(cfg, tile_rows=bt, interior_rows=t,
                                   write_macro=False)
        refresh = fs.make_macro_refresh(cfg)

        def run(st, n):
            m = n
            while m >= k:
                st = stepk(st, fields)
                m -= k
            for _ in range(m):
                st = step1(st, fields)
            return refresh(st, fields)

        print(f"[variants] compiling k={k} T={t} ...", flush=True)
        t0 = time.time()
        state = run(state, 2 * k)
        float(jnp.sum(state["rho"]))
        print(f"[variants] compiled in {time.time()-t0:.0f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            state = run(state, steps)
            float(jnp.sum(state["rho"]))
            best = min(best, time.perf_counter() - t0)
        mlups = cells * steps / best / 1e6
        results[v] = round(mlups, 1)
        print(json.dumps({"variant": v, "k": k, "T": t, "BT": bt,
                          "us_per_step": round(best / steps * 1e6, 1),
                          "mlups": round(mlups, 1)}), flush=True)
        with open(out, "w") as fo:  # persist incrementally
            json.dump(results, fo, indent=1)
    print(json.dumps({"all": results}), flush=True)


if __name__ == "__main__":
    main()
