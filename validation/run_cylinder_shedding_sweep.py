"""Blockage + grid-refinement sweep for the cylinder shedding validation.

Adds two points to the 5% (round-1) and 2.5% (run_cylinder_shedding_lowblock)
studies so St/Cd can be shown converging to the unbounded-flow literature
values as blockage -> 0 and the cylinder resolution doubles:

* "b0125": blockage 1.25% (1600x1600, D=20) — same nu, same resolution;
* "refine": blockage 2.5% at doubled resolution (3200x1600, D=40) —
  separates blockage error from the O(dx) curved-boundary error.

Usage: python run_cylinder_shedding_sweep.py <case>
"""

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))

import numpy as np

from jrl_lbm_tpu.models import cylinder as cyl
from jrl_lbm_tpu.ops.pallas import fused_step as fs
from run_cylinder_shedding import perturb_wake
from run_cylinder_shedding_lowblock import williamson_st

CASES = {
    # same nu = 0.008 as the 800x400 and 1600x800 runs
    "b0125": dict(res=(1600, 1600), Re=10000.0, D=20.0,
                  cylinder_center=(800.0, 200.0), warmup=150000, every=50),
    # D doubled at fixed blockage; nu doubled to keep Re_D = 125, so the
    # shedding period in steps doubles -> sample every 100
    "refine": dict(res=(3200, 1600), Re=10000.0, D=40.0,
                   cylinder_center=(800.0, 400.0), warmup=300000, every=100),
    # bf16 deviation-storage physics gate: identical physics to the 2.5%
    # lowblock case; St/Cd must match the f32 run
    "b025_bf16": dict(res=(1600, 800), Re=10000.0, D=20.0,
                      cylinder_center=(400.0, 200.0), warmup=150000,
                      every=50, bf16_dev=True),
    # stochastic-rounding physics gate: round-to-nearest bf16 suppressed
    # the limit cycle (cylinder_shedding_b025_bf16.json); SR's unbiased
    # rounding must restore it (St/Cd matching the f32 lowblock run)
    "b025_bf16sr": dict(res=(1600, 800), Re=10000.0, D=20.0,
                        cylinder_center=(400.0, 200.0), warmup=150000,
                        every=50, bf16_dev="sr"),
}


def main(case: str):
    p = CASES[case]
    warmup, every = p.pop("warmup"), p.pop("every")
    bf16_dev = p.pop("bf16_dev", False)
    cfg = cyl.CylinderConfig(**p)
    nu = (cfg.tau - 0.5) / 3.0
    re_d = cfg.Vmax * cfg.D / nu
    blockage = cfg.D / cfg.res[1]
    print(f"case={case} tau={cfg.tau} Re_D_nominal={re_d:.0f} "
          f"blockage={blockage:.4f} bf16_dev={bf16_dev}", flush=True)
    state, fields = cyl.init(cfg)
    state = perturb_wake(state, cfg)
    run = fs.make_fused_cylinder_runner(cfg, bf16_dev=bf16_dev)
    if bf16_dev:
        state = dict(state, f=fs.f_to_storage(state["f"], bf16_dev))

    n_samples = 1000
    state = run(state, fields, warmup)
    float(np.asarray(state["rho"][0, 0]))  # force completion (axon tunnel)
    print("warmup done", flush=True)

    lifts, probes = [], []
    cx, cy = cfg.center
    px, py = int(cx), int(cy + 4 * cfg.D)
    for k in range(n_samples):
        state = run(state, fields, every)
        dstate = (dict(state, f=fs.f_from_storage(state["f"], bf16_dev))
                  if bf16_dev else state)
        fx, fy = cyl.drag_lift(dstate, fields, cfg)
        lifts.append((float(fx), float(fy)))
        probes.append(float(state["vel"][0, py, px]))
        if k % 200 == 0:
            print(f"sample {k}: Fl={lifts[-1][0]:.4f} Fd={lifts[-1][1]:.4f}",
                  flush=True)

    fx = np.asarray([l[0] for l in lifts])
    fy = np.asarray([l[1] for l in lifts])
    ux = np.asarray(probes)

    vel_np = np.asarray(state["vel"])
    y0, y1 = int(cy - 8 * cfg.D), int(cy - 6 * cfg.D)
    x0, x1 = int(cx - 5 * cfg.D), int(cx + 5 * cfg.D)
    u_eff = float(vel_np[1, y0:y1, x0:x1].mean())
    re_eff = u_eff * cfg.D / nu

    denom = 0.5 * cfg.density * u_eff**2 * cfg.D
    cl = fx / denom
    cd = fy / denom

    def dominant_freq(sig):
        z = sig - sig.mean()
        spec = np.abs(np.fft.rfft(z * np.hanning(len(z)))) ** 2
        freqs = np.fft.rfftfreq(len(z), d=every)
        return float(freqs[int(spec[1:].argmax()) + 1])

    clz = cl - cl.mean()
    st_eff = dominant_freq(cl) * cfg.D / u_eff
    st_lit = williamson_st(re_eff)
    np.savez(ROOT / "validation" / "results" / f"cylinder_shedding_{case}_series.npz",
             cl=cl, cd=cd, u_probe=ux, every=every, warmup=warmup)
    out = {
        "case": case,
        "res": list(cfg.res),
        "D": cfg.D,
        "blockage": blockage,
        "u_eff": round(u_eff, 5),
        "re_cylinder_effective": round(re_eff, 1),
        "cd_mean": round(float(cd.mean()), 3),
        "cl_rms": round(float(np.sqrt((clz**2).mean())), 4),
        "strouhal": round(st_eff, 4),
        "strouhal_williamson_at_re_eff": round(st_lit, 4),
        "shedding": bool(np.sqrt((clz**2).mean()) > 0.01),
    }
    print(json.dumps(out))
    with open(ROOT / "validation" / "results" / f"cylinder_shedding_{case}.json", "w") as fo:
        fo.write(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1])
