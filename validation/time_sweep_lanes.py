#!/usr/bin/env python
"""Real-chip overhead of lane-sharding the vmapped Pe sweep (VERDICT r4 #5).

`parallel/sweep.py::pe_sweep_approach(lane_devices=...)` is the
cross-chip form of the reference's one-process-per-Pe sweep
(`demo/batch_Pe.py:47-52`). Its CI is a 3-lane/2-CPU-device smoke test
and the dryrun caps at 2 steps, so no measurement existed of what the
NamedSharding path costs per lane even on a 1-chip mesh (the vmap-vs-
sharded overhead that the multichip sweep projection rests on). This
times a production-shaped row — 7 Pe lanes of the water grid (128x64,
the batch_Pe production lane count per Re row) — as (a) plain vmap and
(b) lane-sharded over a 1-device mesh, same step budget, and records
the ratio next to jrl_sharded_1x1.json.

Protocol: docs/PERFORMANCE.md #20 — one sync per sweep call (the chunk
loop dispatches without host syncs), >= 20k steps per call, best of 3.
Writes validation/results/sweep_lanes_1x1.json.
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
import numpy as np

from jrl_lbm_tpu.models import jrl
from jrl_lbm_tpu.parallel import sweep

SMOKE = os.environ.get("JRL_SH_SMOKE", "0") == "1"
if SMOKE:
    jax.config.update("jax_platforms", "cpu")
STEPS = 200 if SMOKE else 20_000
CHUNK = 64 if SMOKE else 256


def main():
    # production water row (batch_Pe.py): 7 Pe lanes per Re
    Re = 7e-5
    vel_obs = Re * 0.89e-6 / 1.25e-5
    Pes = [1e-3, 3e-3, 1e-2, 3e-2, 1e-1, 3e-1, 1.0]
    ccfg = jrl.JRLCConfig(
        res=(128, 64), Re=Re, Pe=Pes[0], vel_obs_real=vel_obs,
        gravity_strength_real=0.0, shape="cylinder", is_negative=True,
    )
    state, fields, flags = jrl.c_init(ccfg)
    # seed a few balance steps for realistic (non-constant) fields
    state = jrl.make_balance_runner(ccfg, flags)(state, fields, 8)
    fields = dict(fields)
    H, W = ccfg.eff_res
    fields["vel_field"] = jnp.zeros((2, 2, H, W), jnp.float32)

    states = {
        "C": jnp.stack([state["C"]] * len(Pes)),
        "h": jnp.stack([state["h"]] * len(Pes)),
    }

    def run(lane_devices):
        return sweep.pe_sweep_approach(
            ccfg, Pes, states, fields, chunk=CHUNK,
            lane_devices=lane_devices, max_steps=STEPS,
        )

    def timed(lane_devices):
        run(lane_devices)  # warm (jit + persistent cache)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = run(lane_devices)
            best = min(best, time.perf_counter() - t0)
        return best, r

    t_vmap, r_vmap = timed(None)
    t_sh, r_sh = timed(jax.devices()[:1])

    dev = float(np.max(np.abs(r_sh.records - r_vmap.records)))
    cells = len(Pes) * H * W
    out = {
        "grid": f"water 7-Pe row {H}x{W}", "steps": STEPS,
        "vmap_s": round(t_vmap, 4), "sharded_1dev_s": round(t_sh, 4),
        "vmap_mlups": round(cells * STEPS / t_vmap / 1e6, 1),
        "sharded_mlups": round(cells * STEPS / t_sh / 1e6, 1),
        "sharded_over_vmap": round(t_vmap / t_sh, 4),
        "records_max_abs_dev": dev,
    }
    if not SMOKE:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "results", "sweep_lanes_1x1.json")
        with open(path, "w") as fo:
            json.dump(out, fo, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
