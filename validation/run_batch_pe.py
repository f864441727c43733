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

if __name__ == "__main__":
    fluid = sys.argv[1] if len(sys.argv) > 1 else "water"
    t0 = time.time()
    print(f"[run_batch_pe] devices={jax.devices()} fluid={fluid} out={OUT}",
          flush=True)
    batch_Pe.main(fluid=fluid, is_negative=True, res=(128, 64),
                  skip_existing=True, progress=True)
    print(f"[run_batch_pe] total wall {time.time() - t0:.0f}s", flush=True)
