"""Vortex-shedding validation at the reference demo's own configuration.

Runs `demo_2d_LBM_cylinder.py`'s exact physics (800x400, Re_domain=5000,
Vmax=0.05, D=20) on the fused TPU path for 50k steps, samples the lift
force, and extracts the Strouhal number St = f D / U from the dominant
lift frequency. 2D cylinder shedding at this cylinder Reynolds number
(Re_D = U D / nu = 5000/40 = 125 on the domain-based viscosity) has
St ~ 0.18-0.22 (Roshko); blockage ~5% raises it slightly.
"""

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax

jax.config.update("jax_compilation_cache_dir", str(ROOT / ".jax_cache"))

import jax.numpy as jnp
import numpy as np

from jrl_lbm_tpu.models import cylinder as cyl
from jrl_lbm_tpu.ops.pallas import fused_step as fs


def perturb_wake(state, cfg, amplitude=0.2):
    """Seed an antisymmetric transverse-velocity bump just downstream of
    the cylinder to skip the slow linear-growth phase of the shedding
    instability (symmetric ICs take ~200k steps to saturate at Re_D=125;
    a finite kick reaches the same limit cycle directly)."""
    import jax.numpy as jnp

    from jrl_lbm_tpu.ops.equilibrium import feq
    from jrl_lbm_tpu.utils.grid import create_2d_meshgrid

    H, W = cfg.res
    cx, cy = cfg.center
    mesh = create_2d_meshgrid((H, W), dtype=cfg.dtype) + 0.5 * cfg.dx
    x, y = mesh[0], mesh[1]
    # Gaussian blob of +x velocity centered one diameter downstream (+y)
    r2 = ((x - cx) / cfg.D) ** 2 + ((y - (cy + cfg.D)) / cfg.D) ** 2
    bump = amplitude * cfg.Vmax * jnp.exp(-r2)
    vel = state["vel"].at[0].add(bump.astype(cfg.dtype))
    f = feq(state["rho"], vel, dx=cfg.dx, dt=cfg.dt,
            force=jnp.zeros_like(vel))
    return {"f": f, "rho": state["rho"], "vel": vel}


def main():
    cfg = cyl.CylinderConfig(res=(800, 400))  # reference defaults
    nu = (cfg.tau - 0.5) / 3.0
    re_d = cfg.Vmax * cfg.D / nu
    print(f"tau={cfg.tau} Re_D={re_d:.0f}", flush=True)
    state, fields = cyl.init(cfg)
    state = perturb_wake(state, cfg)
    run = fs.make_fused_cylinder_runner(cfg)

    warmup, n_samples, every = 80000, 800, 50
    state = run(state, fields, warmup)
    lifts = []
    probes = []  # transverse velocity in the wake: the standard St probe
    cx, cy = cfg.center
    px, py = int(cx), int(cy + 4 * cfg.D)
    for k in range(n_samples):
        state = run(state, fields, every)
        fx, fy = cyl.drag_lift(state, fields, cfg)
        lifts.append((float(fx), float(fy)))
        probes.append(float(state["vel"][0, py, px]))
        if k % 100 == 0:
            print(f"sample {k}: Cl={lifts[-1][0]:.4f} Cd_raw={lifts[-1][1]:.4f}"
                  f" u_probe={probes[-1]:.5f}", flush=True)

    fx = np.asarray([l[0] for l in lifts])
    fy = np.asarray([l[1] for l in lifts])
    ux = np.asarray(probes)
    denom = 0.5 * cfg.density * cfg.Vmax**2 * cfg.D
    cl = fx / denom
    cd = fy / denom

    def dominant_freq(sig):
        z = sig - sig.mean()
        spec = np.abs(np.fft.rfft(z * np.hanning(len(z)))) ** 2
        freqs = np.fft.rfftfreq(len(z), d=every)  # cycles per step
        return float(freqs[int(spec[1:].argmax()) + 1])

    clz = cl - cl.mean()
    f_shed = dominant_freq(cl)
    st = f_shed * cfg.D / cfg.Vmax
    st_probe = dominant_freq(ux) * cfg.D / cfg.Vmax
    np.savez(ROOT / "validation" / "results" / "cylinder_shedding_series.npz",
             cl=cl, cd=cd, u_probe=ux, every=every, warmup=warmup)

    # The reference's INFLOW BC (feq(rho=1, Vmax) overwrite each step)
    # admits less flux than nominal: the interior settles at a higher
    # density and a lower free-stream velocity. Normalize by the MEASURED
    # incident velocity for literature comparison.
    u_eff = float(np.asarray(state["vel"])[1, 50, 1:-1].mean())
    scale = cfg.Vmax / u_eff
    nu = (cfg.tau - 0.5) / 3.0
    re_eff = u_eff * cfg.D / nu
    out = {
        "re_domain": cfg.Re,
        "re_cylinder_nominal": round(re_d, 1),
        "u_eff": round(u_eff, 5),
        "re_cylinder_effective": round(re_eff, 1),
        "cd_mean_nominal": round(float(cd.mean()), 3),
        "cd_mean_effective": round(float(cd.mean()) * scale * scale, 3),
        "cl_rms": round(float(np.sqrt((clz**2).mean())), 4),
        "strouhal_nominal": round(st, 4),
        "strouhal_wake_probe_nominal": round(st_probe, 4),
        "strouhal_effective": round(st * scale, 4),
        "shedding": bool(np.sqrt((clz**2).mean()) > 0.01),
        "note": "wake-perturbed IC, 80k warmup + 40k sampling; saturated "
                "limit cycle. The reference's INFLOW equilibrium BC admits "
                "u_eff < Vmax (density piles up ~4%), so literature "
                "comparison uses the measured incident velocity: at "
                "Re_eff~90 expect St~0.16-0.17 and Cd~1.35-1.45 (5% "
                "blockage). Cl_rms from the control-surface balance "
                "includes the unsteady volume term and overestimates.",
    }
    print(json.dumps(out))
    with open(ROOT / "validation" / "results" / "cylinder_shedding.json", "w") as fo:
        fo.write(json.dumps(out))


if __name__ == "__main__":
    main()
