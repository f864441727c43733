#!/usr/bin/env python
"""Real-chip 1x1-mesh A/B for the sharded row-tiled fused JRL runners.

`ops/pallas/fused_jrl_sharded.py` is the multi-chip production path for
the Re x Pe sweep phases (fluid, C balance, C approach) at refine >= 8.
Multi-chip hardware is out of reach, so — like the cylinder path's
`time_sharded_1x1.py` — this measures the shard_map overhead on a real
1x1 mesh at the production grid (ethaline refine 8 = 1024x512,
`/root/reference/demo/demo_2d_LBM_JRL_C_ethaline.py`) against the
unsharded `fused_jrl_tiled` runners, and checks numerical equivalence
over enough steps that halo rows matter.

Protocol: docs/PERFORMANCE.md #20 — one host-fetch sync per >=20k-step
window (~1-2 s on-device vs the ~50 ms tunnel round trip), best of 3.
Both paths use the same unroll so dispatch amortization is identical.
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
from jax.sharding import Mesh

from jrl_lbm_tpu.models import jrl
from jrl_lbm_tpu.ops.pallas import fused_jrl_sharded as sh
from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled as tiled
from jrl_lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y

SMOKE = os.environ.get("JRL_SH_SMOKE", "0") == "1"  # CPU flow check
if SMOKE:
    jax.config.update("jax_platforms", "cpu")
REFINE = 1 if SMOKE else 8
RE = 1e-6
PE = 1.0
UNROLL = 4 if SMOKE else 32
STEPS = 8 if SMOKE else 20_000
EQ_STEPS = 8 if SMOKE else 24
INTERPRET = SMOKE


def _sync(x):
    return float(jnp.sum(x))


def _interp(run):
    if not INTERPRET:
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
    out = {"grid": f"ethaline refine {REFINE}", "steps": STEPS,
           "unroll": UNROLL}
    dev = jax.devices()[0]
    mesh = Mesh(np.asarray([dev]).reshape(1, 1), (AXIS_Y, AXIS_X))

    visc = 39.4e-6  # ethaline (demo/batch_Pe.py material table)
    ccfg = jrl.JRLCConfig(
        res=(128, 64), refine=REFINE, shape="ethaline", Re=RE, Pe=PE,
        vel_obs_real=RE * visc / 12.5e-6,
    )
    H, W = ccfg.eff_res
    cells = H * W
    out["eff_res"] = [H, W]

    state, fields, flags = jrl.c_init(ccfg)

    # --- C balance ---------------------------------------------------
    run_u0 = tiled.make_tiled_balance_runner(ccfg, flags, unroll=UNROLL)
    run_u = _interp(run_u0)
    run_s = sh.make_sharded_tiled_balance_runner(ccfg, flags, mesh,
                                                 unroll=UNROLL,
                                                 interpret=INTERPRET)

    su = run_u(dict(state), fields, EQ_STEPS)
    ss = run_s(dict(state), fields, EQ_STEPS)
    dev_c = float(jnp.max(jnp.abs(su["C"] - ss["C"])))
    dev_h = float(jnp.max(jnp.abs(su["h"] - ss["h"])))
    out["balance_eq_max_abs_dev"] = max(dev_c, dev_h)
    print(f"balance equivalence over {EQ_STEPS} steps: "
          f"max|dC|={dev_c:.3g} max|dh|={dev_h:.3g}", flush=True)

    def tb_u():
        _sync(run_u(dict(state), fields, STEPS)["C"])

    def tb_s():
        _sync(run_s(dict(state), fields, STEPS)["C"])

    tb_u()  # warm compile
    tb_s()
    t_u = _best(tb_u)
    t_s = _best(tb_s)
    out["balance_unsharded_mlups"] = round(cells * STEPS / t_u / 1e6, 1)
    out["balance_sharded_mlups"] = round(cells * STEPS / t_s / 1e6, 1)
    print(f"balance: unsharded {out['balance_unsharded_mlups']} / "
          f"sharded {out['balance_sharded_mlups']} MLUPS", flush=True)

    # --- C approach ----------------------------------------------------
    rng = np.random.default_rng(3)
    vel_field = (0.05 * rng.standard_normal((4, 2, H, W))).astype(np.float32)
    afields = dict(fields)
    afields["vel_field"] = jnp.asarray(vel_field)

    arun_u = _interp(
        tiled.make_tiled_approach_runner(ccfg, vel_field, unroll=UNROLL))
    arun_s = sh.make_sharded_tiled_approach_runner(ccfg, vel_field, mesh,
                                                   unroll=UNROLL,
                                                   interpret=INTERPRET)
    au, acc_u = arun_u(dict(state), afields, 0, EQ_STEPS)
    as_, acc_s = arun_s(dict(state), afields, 0, EQ_STEPS)
    dev_c = float(jnp.max(jnp.abs(au["C"] - as_["C"])))
    dev_acc = max(
        abs(float(acc_u[k]) - float(acc_s[k]))
        for k in ("inflow_sum", "current_sum", "rec_u", "rec_v")
    )
    out["approach_eq_max_abs_dev"] = dev_c
    out["approach_eq_max_acc_dev"] = dev_acc
    print(f"approach equivalence: max|dC|={dev_c:.3g} "
          f"max|dacc|={dev_acc:.3g}", flush=True)

    def ta_u():
        _sync(arun_u(dict(state), afields, 0, STEPS)[0]["C"])

    def ta_s():
        _sync(arun_s(dict(state), afields, 0, STEPS)[0]["C"])

    ta_u()
    ta_s()
    t_u = _best(ta_u)
    t_s = _best(ta_s)
    out["approach_unsharded_mlups"] = round(cells * STEPS / t_u / 1e6, 1)
    out["approach_sharded_mlups"] = round(cells * STEPS / t_s / 1e6, 1)
    print(f"approach: unsharded {out['approach_unsharded_mlups']} / "
          f"sharded {out['approach_sharded_mlups']} MLUPS", flush=True)

    # --- fluid (kernel A + B, two halo rounds/step) --------------------
    fcfg = jrl.JRLFluidConfig(
        res=(128, 64), refine=REFINE, shape="ethaline", Re=RE,
        vel_obs_real=RE * visc / 12.5e-6, gravity_strength_real=0.0,
    )
    fstate, ffields = jrl.fluid_init(fcfg)
    frun_u = _interp(tiled.make_tiled_fluid_runner(fcfg, unroll=UNROLL))
    frun_s = sh.make_sharded_tiled_fluid_runner(fcfg, mesh, unroll=UNROLL,
                                                interpret=INTERPRET)

    fu = frun_u(dict(fstate), ffields, 0, EQ_STEPS)
    fs_ = frun_s(dict(fstate), ffields, 0, EQ_STEPS)
    dev_f = max(
        float(jnp.max(jnp.abs(fu[k] - fs_[k]))) for k in ("f", "rho", "vel")
    )
    out["fluid_eq_max_abs_dev"] = dev_f
    print(f"fluid equivalence: max|dev|={dev_f:.3g}", flush=True)

    fsteps = STEPS // 2  # two kernels per step
    out["fluid_steps"] = fsteps

    def tf_u():
        _sync(frun_u(dict(fstate), ffields, 0, fsteps)["rho"])

    def tf_s():
        _sync(frun_s(dict(fstate), ffields, 0, fsteps)["rho"])

    tf_u()
    tf_s()
    t_u = _best(tf_u)
    t_s = _best(tf_s)
    out["fluid_unsharded_mlups"] = round(cells * fsteps / t_u / 1e6, 1)
    out["fluid_sharded_mlups"] = round(cells * fsteps / t_s / 1e6, 1)
    print(f"fluid: unsharded {out['fluid_unsharded_mlups']} / "
          f"sharded {out['fluid_sharded_mlups']} MLUPS", flush=True)

    for ph in ("balance", "approach", "fluid"):
        u = out[f"{ph}_unsharded_mlups"]
        out[f"{ph}_overhead_ratio"] = (
            round(out[f"{ph}_sharded_mlups"] / u, 3) if u else None
        )

    if not SMOKE:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "jrl_sharded_1x1.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
