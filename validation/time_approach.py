#!/usr/bin/env python
"""Time the fused JRL approach kernel at sweep-realistic configs.

Asymptotic protocol (docs/PERFORMANCE.md #20): >=200k steps per timed
region, host-fetch sync only at region edges. Reports us/step for the
short-interval (high Pe; previously serialized at 23.7 us/step) and
long-interval (low Pe) frame-pick regimes.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jrl_lbm_tpu.models import jrl
from jrl_lbm_tpu.ops.pallas import fused_jrl


def time_case(Pe, n_steps, label):
    visc = 0.89e-6
    Re = 1e-3
    cfg = jrl.JRLCConfig(
        res=(128, 64), Re=Re, Pe=Pe, vel_obs_real=Re * visc / 12.5e-6,
        shape="45degree", is_negative=True,
    )
    H, W = cfg.eff_res
    n_frames = int(cfg.total_steps * cfg.vel_obs_conv / 0.1) + 1
    rng = np.random.default_rng(0)
    vel_field = (0.05 * rng.standard_normal((n_frames, 2, H, W))).astype(
        np.float32
    )
    state, fields, _flags = jrl.c_init(cfg)
    run = fused_jrl.make_fused_approach_runner(cfg, vel_field)

    # warmup/compile
    out, acc = run(dict(state), fields, 0, 1024)
    float(jnp.sum(out["C"]))

    t0 = time.perf_counter()
    out, acc = run(dict(state), fields, 0, n_steps)
    s = float(jnp.sum(out["C"])) + float(acc["inflow_sum"])
    dt = time.perf_counter() - t0
    us = dt / n_steps * 1e6
    print(
        json.dumps(
            {
                "label": label,
                "Pe": Pe,
                "steps_per_frame": 0.1 / cfg.vel_obs_conv,
                "n_steps": n_steps,
                "us_per_step": round(us, 3),
                "checksum": s,
            }
        )
    )
    return us


if __name__ == "__main__":
    print("devices:", jax.devices())
    time_case(0.1, 30000, "hiPe-short-intervals(39/frame)")
    time_case(0.03, 100000, "midPe(130/frame)")
    time_case(0.001, 500000, "loPe-long-intervals(3900/frame)")
