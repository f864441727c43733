#!/usr/bin/env python
"""Real-TPU Mosaic compile check for the JRL extended-window (xw) kernels.

Interpret-mode CI (CPU meshes, tests/test_fused_jrl_sharded.py) proves
the NUMERICS of the 2D-mesh JRL runners but never runs the Mosaic
lowering — round 3 found a real-TPU lowering rejection in a kernel that
interpret-only CI had passed for two rounds (VERDICT r3 "latent Mosaic
bug"). Multi-chip hardware is out of reach, so this drives the four
xw-mode pallas_calls DIRECTLY (outside shard_map) on the one real chip
with hand-crafted shard offsets and neighbour windows at the
production shard shape (512 x 256 = left-top shard of a (2, 2) mesh on
a 1024 x 512 grid, x_ext = 8, TH = 64 so the tile grid iterates 8
extension-window blocks): every in-kernel lane concat, windowed roll,
global-coordinate mask, and sliced store the 2D mode adds gets a real
Mosaic compile + execution. The shard shape is ASSERTED (round 4 ran
this at 64 x 32 because `JRLCConfig.eff_res` applies `refine` only for
the ethaline shape — ADVICE r4; `shape="cylinder"` is kept because only
the FLAT tip exercises the flat flux form, so the grid is scaled via
`res` instead). Finite outputs are asserted; numerics are CI's job.
Writes validation/results/jrl_2d_compile_check.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from jrl_lbm_tpu.models import jrl
from jrl_lbm_tpu.ops.pallas import fused_jrl_sharded as sh
from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled as T

f32 = jnp.float32
SMOKE = os.environ.get("JRL_2D_SMOKE", "0") == "1"
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

# `refine` scales eff_res only for shape="ethaline" (JRLCConfig); the
# cylinder grid is scaled through `res` directly so the shard really is
# the production 512 x 256 (ADVICE r4: the round-4 run compiled 64 x 32)
RES = (128, 64) if SMOKE else (1024, 512)
visc = 39.4e-6
RE = 1e-6
ccfg = jrl.JRLCConfig(res=RES, refine=1, shape="cylinder",
                      Re=RE, Pe=1.0, vel_obs_real=RE * visc / 12.5e-6)
fcfg = jrl.JRLFluidConfig(res=RES, refine=1, shape="cylinder",
                          Re=RE, vel_obs_real=RE * visc / 12.5e-6,
                          gravity_strength_real=0.0)
H, W = ccfg.eff_res
h, w = H // 2, W // 2  # left-top shard of a (2, 2) mesh
if not SMOKE:
    assert (h, w) == (512, 256), (h, w)
X_EXT = 8
TH = 64 if not SMOKE else 8
assert h % TH == 0
assert h // TH >= 2, "tile grid must iterate the extension-window blocks"
n_t = h // TH
xw = (X_EXT, w)
off = jnp.asarray([0, 0], jnp.int32)  # ring-wrap garbage in the left
# extension is the real runner's situation too: at_x0 masks override it

rng = np.random.default_rng(7)


def rand(shape):
    return jnp.asarray(rng.uniform(0.1, 0.9, size=shape).astype(np.float32))


def zpieces(planes):
    z = jnp.zeros((planes, 8, w), f32)
    return z, z


def wins(planes):
    return rand((n_t, planes, TH + 2, X_EXT))


def fin(name, *arrs):
    for a in arrs:
        assert np.isfinite(np.asarray(a)).all(), f"{name}: non-finite"


def sync(x):
    return float(jnp.sum(x))


out = {"shard": [h, w], "x_ext": X_EXT, "tile_rows": TH,
       "grid": f"cylinder {H}x{W}"}

cfg_cf = T._cfg_consts(fcfg)
cfg_cc = T._c_cfg_consts(ccfg)
step_arr = jnp.zeros((1, 1), f32)


def case(name, fn):
    try:
        fn()
        out[name] = "ok"
        print(f"{name}: OK", flush=True)
    except Exception as e:  # noqa: BLE001
        out[name] = f"fail: {type(e).__name__}"
        print(f"{name}: FAIL {type(e).__name__}: {e}", flush=True)


def fluid_a():
    f = rand((9, h, w))
    vel = rand((2, h, w)) * 0.01
    rho = rand((h, w)) + 0.5
    tpA, btA = zpieces(11)
    r = jax.jit(
        lambda *a: sh._step_a(*a, cfg_cf, TH, h, SMOKE, xw, wins(11),
                              wins(11))
    )(off, step_arr, f, vel, rho, tpA, btA)
    sync(r[0])
    fin("fluid_a", *r)


def fluid_b():
    f1 = rand((9, h, w))
    vel1 = rand((2, h, w)) * 0.01
    rho1 = rand((h, w)) + 0.5
    tpB, btB = zpieces(3)
    r = jax.jit(
        lambda *a: sh._step_b(*a, cfg_cf, TH, h, SMOKE, xw, wins(3),
                              wins(3))
    )(off, step_arr, f1, rho1, vel1, tpB, btB)
    sync(r)
    fin("fluid_b", r)


def ipieces():
    z = jnp.zeros((1, 8, w), jnp.int32)
    return z, z


def iwins():
    return jnp.asarray(
        rng.integers(0, 4, size=(n_t, 1, TH + 2, X_EXT)).astype(np.int32)
    )


def balance():
    flags = jnp.asarray(jrl.c_init(ccfg)[2])[:h, :w]
    h_arr = rand((9, h, w))
    C = rand((h, w))
    tpFl, btFl = ipieces()
    tpH, btH = zpieces(9)
    r = jax.jit(
        lambda *a: sh._step_balance(*a, cfg_cc, TH, h, SMOKE, xw,
                                    iwins(), iwins(), wins(9), wins(9))
    )(off, flags, h_arr, C, tpFl, btFl, tpH, btH)
    sync(r[0])
    fin("balance", *r)


def approach():
    flags = jnp.asarray(jrl.c_init(ccfg)[2])[:h, :w]
    h_arr = rand((9, h, w))
    C = rand((h, w))
    vel = rand((2, h, w)) * 0.01
    tpFl, btFl = ipieces()
    tpH, btH = zpieces(9)
    r = jax.jit(
        lambda *a: sh._step_approach(*a, cfg_cc, TH, h, SMOKE, xw,
                                     iwins(), iwins(), wins(9), wins(9))
    )(off, step_arr, flags, h_arr, C, vel, tpFl, btFl,
      tpH, btH)
    sync(r[0])
    fin("approach", *r)


def fluid_a_lean():
    # r5 sharded lean-split kernels: ROW-mesh only (shard width is the
    # full W — the lean bodies' x-edge masks are global-column lane
    # masks). Same real-compile treatment as the xw family —
    # interpret-only CI ships latent Mosaic crashes (round-3 lesson).
    f = rand((9, h, W))
    z = jnp.zeros((11, 8, W), f32)
    r = jax.jit(
        lambda *a: sh._step_a_lean(*a, cfg_cf, TH, h, W, SMOKE)
    )(f, z, z)
    sync(r[0])
    fin("fluid_a_lean", *r)


def fluid_b_lean():
    f1 = rand((9, h, W))
    vel1 = rand((2, h, W)) * 0.01
    rho1 = rand((h, W)) + 0.5
    z = jnp.zeros((3, 8, W), f32)
    r = jax.jit(
        lambda *a: sh._step_b_lean(*a, cfg_cf, TH, h, W, SMOKE)
    )(f1, rho1, vel1, z, z)
    sync(r)
    fin("fluid_b_lean", r)


case("fluid_a", fluid_a)
case("fluid_b", fluid_b)
case("balance", balance)
case("approach", approach)
case("fluid_a_lean", fluid_a_lean)
case("fluid_b_lean", fluid_b_lean)

if not SMOKE:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "jrl_2d_compile_check.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=1)
print(json.dumps(out))
ok = all(v == "ok" for k, v in out.items()
         if k in ("fluid_a", "fluid_b", "balance", "approach",
                  "fluid_a_lean", "fluid_b_lean"))
sys.exit(0 if ok else 1)
