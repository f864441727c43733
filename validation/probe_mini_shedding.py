#!/usr/bin/env python
"""Measure converged St/Cd/Cl_rms of a CPU-sized shedding config to pin
the slow-tier regression test bands (verdict r3 #7).

Config: 320x160, D=16, Re_D ~ 90 (10% blockage — raises St/Cd above the
unconfined literature values; the point is a PINNED regression anchor at
THIS config, the literature-band physics lives in
validation/run_cylinder_shedding*.py on the full configs).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from jrl_lbm_tpu.models import cylinder as cyl
from run_cylinder_shedding import perturb_wake


def main():
    cfg = cyl.CylinderConfig(
        res=(320, 160), Re=1800.0, Vmax=0.1, D=16.0,
        cylinder_center=(80.0, 80.0),
    )
    nu = (cfg.tau - 0.5) / 3.0
    re_d = cfg.Vmax * cfg.D / nu
    print(f"tau={cfg.tau:.4f} Re_D={re_d:.1f}", flush=True)
    state, fields = cyl.init(cfg)
    state = perturb_wake(state, cfg)
    run = cyl.make_runner(cfg)

    t0 = time.time()
    warmup, n_samples, every = 12000, 400, 25
    state = run(state, fields, warmup)
    print(f"warmup done {time.time()-t0:.0f}s", flush=True)
    lifts = []
    for k in range(n_samples):
        state = run(state, fields, every)
        fx, fy = cyl.drag_lift(state, fields, cfg)
        lifts.append((float(fx), float(fy)))
        if k % 50 == 0:
            print(f"sample {k} ({time.time()-t0:.0f}s): "
                  f"fx={lifts[-1][0]:.4f} fy={lifts[-1][1]:.4f}", flush=True)
    fx = np.asarray([l[0] for l in lifts])
    fy = np.asarray([l[1] for l in lifts])
    denom = 0.5 * cfg.density * cfg.Vmax**2 * cfg.D
    cl = fx / denom
    cd = fy / denom
    # St from the dominant lift frequency
    clf = cl - cl.mean()
    spec = np.abs(np.fft.rfft(clf * np.hanning(len(clf)))) ** 2
    freqs = np.fft.rfftfreq(len(clf), d=every)
    kpk = int(np.argmax(spec[1:]) + 1)
    st = freqs[kpk] * cfg.D / cfg.Vmax
    out = {
        "re_d": round(float(re_d), 2),
        "St": round(float(st), 4),
        "Cd_mean": round(float(cd.mean()), 4),
        "Cl_rms": round(float(np.sqrt((clf ** 2).mean())), 4),
        "Cl_mean": round(float(cl.mean()), 4),
        "steps": warmup + n_samples * every,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results", "mini_shedding_anchor.json"), "w") as fo:
        json.dump(out, fo, indent=1)


if __name__ == "__main__":
    main()
