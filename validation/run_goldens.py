#!/usr/bin/env python
"""Generate the committed visual goldens for the basic demos (verdict
r3 #8) — the reference ships 2d_LBM.gif / 2d_LBM_KBC.gif /
2d_LBM_cylinder.gif as expected-output anchors (`readme.md:30-34`).

Runs the demo CLIs in-process at their reference-default configs.
Pass --cpu to force the CPU backend (the default TPU tunnel allows only
one process; gif content is numerically identical either way).
"""

import os
import runpy
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "validation", "goldens")
os.makedirs(OUT, exist_ok=True)
os.environ["JRL_DEMO_OUT"] = OUT

sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "demo"))

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

DEMOS = {
    "2d_LBM": ("demo_2d_LBM.py", []),
    "2d_LBM_KBC": ("demo_2d_LBM_KBC.py", []),
    "2d_LBM_cylinder": ("demo_2d_LBM_cylinder.py", []),
}

if __name__ == "__main__":
    which = sys.argv[1:] or list(DEMOS)
    for name in which:
        script, args = DEMOS[name]
        print(f"[goldens] {name} ...", flush=True)
        sys.argv = [script] + args
        runpy.run_path(os.path.join(ROOT, "demo", script), run_name="__main__")
        print(f"[goldens] {name} done", flush=True)
