#!/usr/bin/env python
"""Bit-exact A/B of the r5 JRL fluid compute diet vs the round-4 kernel.

The diet (`fused_jrl_tiled.py`: CSE'd `_feq9`, single-pass merged
`_TileCtx` reads, shared SFC/noneq/Gq terms) claims bit-exactness via
IEEE sign-symmetry arguments.  This loads the pre-diet module (written
by `git show <r4>:...` to the path given in argv[1]) side by side with
the current one and diffs the tiled fluid runner outputs over 24 steps
at refine 1 in interpret mode (CPU).  Expected: max|dev| == 0.0.

Usage: git show HEAD:jrl_lbm_tpu/ops/pallas/fused_jrl_tiled.py \
           > /tmp/fused_jrl_tiled_r4.py
       python validation/ab_jrl_diet.py /tmp/fused_jrl_tiled_r4.py
"""

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from jrl_lbm_tpu.models import jrl
from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled as new_mod


def _load_old(path):
    spec = importlib.util.spec_from_file_location("fused_jrl_tiled_r4", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    old_mod = _load_old(sys.argv[1])
    worst = 0.0
    for shape, flat in (("ethaline", False), ("cylinder", True)):
        cfg = jrl.JRLFluidConfig(
            res=(128, 64), refine=1, shape=shape, Re=1e-4,
            vel_obs_real=1e-4 * 39.4e-6 / 12.5e-6,
            gravity_strength_real=0.0,
        )
        state, fields = jrl.fluid_init(cfg)
        outs = []
        for mod in (old_mod, new_mod):
            run = mod.make_tiled_fluid_runner(cfg, unroll=2)
            with pltpu.force_tpu_interpret_mode():
                outs.append(run(dict(state), fields, 0, 24))
        dev = max(
            float(jnp.max(jnp.abs(outs[0][k] - outs[1][k])))
            for k in ("f", "rho", "vel")
        )
        worst = max(worst, dev)
        print(f"{shape}: 24-step max|dev| old-vs-diet = {dev}")
    assert worst == 0.0, f"diet is NOT bit-exact: {worst}"
    print("OK: diet bit-exact vs round-4 kernel")


if __name__ == "__main__":
    main()
