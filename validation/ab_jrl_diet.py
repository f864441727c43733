#!/usr/bin/env python
"""Bit-exact A/B of the r5 STRUCTURAL JRL fluid diet vs the round-4
kernel.

The structural diet (commit b311758: CSE'd `_feq9`, single-pass merged
`_TileCtx` reads, shared SFC/noneq/Gq terms) claims bit-exactness vs
the round-4 kernel (commit b62d3bb) via IEEE sign-symmetry arguments.
This loads BOTH module snapshots side by side and diffs the tiled
fluid runner outputs over 24 steps at refine 1 in interpret mode
(CPU). Expected: max|dev| == 0.0.

NOTE: later r5 stages (the divide->reciprocal conversion, commit
53f6977) are ULP-level departures BY DESIGN — do not compare the
current tree against round 4 with this gate; it pins the structural
stage only. The later stages' gate is the oracle-tolerance parity
suite plus the exact split-vs-unsplit chunk tests.

Usage: git show b62d3bb:jrl_lbm_tpu/ops/pallas/fused_jrl_tiled.py \
           > /tmp/tiled_r4.py
       git show b311758:jrl_lbm_tpu/ops/pallas/fused_jrl_tiled.py \
           > /tmp/tiled_diet.py
       python validation/ab_jrl_diet.py /tmp/tiled_r4.py /tmp/tiled_diet.py
If argv[2] is omitted, the CURRENT package module is used (only valid
while the tree is at the structural-diet stage)."""

import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from jrl_lbm_tpu.models import jrl


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    old_mod = _load(sys.argv[1], "fused_jrl_tiled_r4")
    if len(sys.argv) > 2:
        new_mod = _load(sys.argv[2], "fused_jrl_tiled_diet")
    else:
        from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled as new_mod
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
