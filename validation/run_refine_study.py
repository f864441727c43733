#!/usr/bin/env python
"""Grid-convergence study of the approach curve (near-contact theory
deviation).

The round-3 theory gate measures a systematic near-contact deviation
from the Cornut-Lefrou embedded-disk expression (max 0.20 at L < 1.5,
identical across all ten Re) and attributes it to GEOMETRY: the
45-degree cone's sidewall feeds the thin gap in a way the disk theory
cannot represent. This study tests that attribution: rerun one sweep
case at refine=2 (256x128, a = 12.5 lattice cells instead of 6.5). If
the deviation is geometric, the refine-2 curve must REPRODUCE the
refine-1 curve (grid-converged); if it were discretization error of the
thin gap, it would shrink toward the disk theory.

Case: water, Re = 7e-5, Pe = 1e-3 (the coarsest-dt sweep case — the
only one whose refine-2 balance phase is tractable: 2.2e8 steps vs
3.2e10 for Re = 1e-2). The ethaline-shape pipeline (identical 45-degree
geometry at refine 1, refine-capable — `models/jrl.py::radius_obs`)
runs it with water properties; outputs land in a dedicated
`validation/sweep_out/refine_study/` tree so the refine-2 `Re_*.h5` /
`C_balance.h5` cannot collide with refine-1 artifacts.

Writes validation/results/refine_convergence.json.
"""

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "validation", "sweep_out", "refine_study")
os.makedirs(OUT, exist_ok=True)
os.environ["JRL_DEMO_OUT"] = OUT

sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "demo"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

RE, PE = 7e-5, 1e-3
VISC_WATER = 0.89e-6
RADIUS = 12.5e-6
REF1_RECORD = os.path.join(
    ROOT, "validation", "sweep_out", "_45degree_g9", "records",
    "record_res64_Re7e-05_Pe10.txt",
)
RESULTS = os.path.join(ROOT, "validation", "results")


def sim_curve(path, inflow_lat, h_lat, radius_lat):
    """(L, normalized current) from a record file — tip position from
    the record's own traveled-distance column (um), like
    validation/run_theory_gate.py (index-based mappings drift by up to
    ~5 cells across duplicate/skipped dumps)."""
    import run_theory_gate as gate

    xs, cur = gate.load_record(path)
    n = len(cur)
    cell_um = 12.5 / radius_lat  # radius_obs_real = 12.5e-6 m
    walks = inflow_lat + xs / cell_um
    L = ((h_lat - 1) - walks) / radius_lat
    idx_from_contact = (n - 1) - np.arange(n)
    norm_mask = (idx_from_contact >= 30) & (idx_from_contact < 40)
    return L, cur / np.mean(cur[norm_mask]), norm_mask


def main():
    from _jrl_main import c_main, fluid_main
    from jrl_lbm_tpu.models import jrl

    import run_theory_gate as gate

    vel_obs_real = RE * VISC_WATER / RADIUS
    analyze_only = "--analyze-only" in sys.argv
    common = dict(
        shape="ethaline", res=[128, 64], Re=RE,
        vel_obs_real=vel_obs_real, gravity_strength_real=-9.8, Rg=4,
        fluid="water", refine=2,
    )
    t0 = time.time()
    if not analyze_only:
        fluid_main(**common, progress=True)
        t_fluid = time.time() - t0
        print(f"fluid phase: {t_fluid:.0f} s", flush=True)
        c_main(balance_time=600, Pe=PE, is_negative=True, progress=True,
               **common)
    t_total = time.time() - t0
    print(f"pipeline total: {t_total:.0f} s", flush=True)

    ccfg = jrl.JRLCConfig(
        res=(128, 64), Re=RE, Pe=PE, vel_obs_real=vel_obs_real,
        gravity_strength_real=-9.8, Rg=4, shape="ethaline", refine=2,
    )
    rec2 = os.path.join(
        OUT, "_water_g9", "records",
        f"record_res{min(ccfg.eff_res)}_Re{RE}_Pe{int(PE * 10000)}.txt",
    )
    L2, sim2, _ = sim_curve(
        rec2, float(ccfg.inflow_height), ccfg.eff_res[0],
        float(ccfg.radius_obs),
    )
    L1, sim1, _ = sim_curve(REF1_RECORD, gate.INFLOW_LAT, gate.H_LAT,
                            gate.RADIUS_LAT)

    # COMMON-physical-window normalization for the grid comparison: the
    # reference's "dumps 30-39 from contact" window sits at a DIFFERENT
    # physical L per refine (dumps are one lattice cell apart, so half
    # the physical spacing at refine 2) and the curve still rises there
    # — normalizing each grid at its own window would fabricate an
    # offset. Both curves (and the theory) are renormalized by their
    # mean over the same L in [3, 4].
    def renorm(L, sim):
        m = (L >= 3.0) & (L <= 4.0)
        return sim / np.mean(sim[m])

    sim1n = renorm(L1, sim1)
    sim2n = renorm(L2, sim2)

    # refine-2 curve interpolated onto the refine-1 L grid (descending L)
    lo, hi = 0.4, 4.0
    mask1 = (L1 >= lo) & (L1 <= hi)
    s2_on_1 = np.interp(L1[mask1], L2[::-1], sim2n[::-1])
    dev_sim = np.abs(sim1n[mask1] - s2_on_1)
    by_region = {}
    for rlo, rhi in ((0.4, 1.5), (1.5, 4.0)):
        rm = (L1[mask1] >= rlo) & (L1[mask1] <= rhi)
        by_region[f"L{rlo}-{rhi}"] = {
            "max_abs_diff": float(dev_sim[rm].max()),
            "mean_abs_diff": float(dev_sim[rm].mean()),
        }

    # near-contact theory deviation per refine (same L-window norm)
    theo = gate.nf_theory
    out_cases = {}
    for tag, (L, sim) in (("refine1", (L1, sim1n)),
                          ("refine2", (L2, sim2n))):
        t = theo(np.clip(L, 1e-3, None))
        t = renorm(L, t)
        near = (L >= 0.4) & (L <= 1.5)
        far = (L >= 1.5) & (L <= 4.0)
        out_cases[tag] = {
            "near_max_abs_dev_vs_theory": float(np.abs(sim - t)[near].max()),
            "far_max_abs_dev_vs_theory": float(np.abs(sim - t)[far].max()),
            "n_dumps": int(len(sim)),
        }

    tol = 0.05
    out = {
        "case": {"fluid": "water", "Re": RE, "Pe": PE, "shape": "45degree "
                 "cone (ethaline pipeline)", "grids": ["128x64 a=6.5",
                 "256x128 a=12.5"]},
        "claim_under_test": "the approach curve is grid-converged; the "
                            "residual near-contact deviation vs the "
                            "embedded-disk theory is geometric (cone "
                            "sidewall), not discretization error",
        "note": "this study exposed that index-based dump->position "
                "mappings drift up to ~5 cells over duplicate/skipped "
                "dumps; positions now come from the record's "
                "traveled-distance column (also fixed in "
                "run_theory_gate.py, where it shrank the apparent "
                "near-contact deviation 0.20 -> 0.056)",
        "sim_vs_sim": {
            "L_range": [lo, hi],
            "max_abs_diff": float(dev_sim.max()),
            "mean_abs_diff": float(dev_sim.mean()),
            "by_region": by_region,
            "tol": tol,
            "grid_converged": bool(dev_sim.max() <= tol),
        },
        "theory_deviation_by_refine": out_cases,
        "wall_clock_s": round(t_total, 1),
    }
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, "refine_convergence.json"), "w") as fo:
        json.dump(out, fo, indent=1)
    print(json.dumps(out, indent=1))

    # overlay plot: the two grids vs the disk theory
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    Lg = np.linspace(0.3, 4.2, 300)
    tg = theo(Lg)
    tg = tg / np.mean(tg[(Lg >= 3.0) & (Lg <= 4.0)])
    fig, ax = plt.subplots(figsize=(6.0, 4.2))
    ax.plot(Lg, tg, "k--", lw=1.2,
            label="Cornut-Lefrou 2007 (disk, Rg=4)")
    ax.plot(L1, sim1n, "-", color="#1f77b4", lw=1.5,
            label="refine 1 (128x64, a=6.5)")
    ax.plot(L2, sim2n, "-", color="#d62728", lw=1.2,
            label="refine 2 (256x128, a=12.5)")
    ax.set_xlim(0, 4.2)
    ax.set_xlabel("L = gap / a")
    ax.set_ylabel("normalized current")
    ax.set_title(f"Approach-curve grid convergence (water, Re={RE}, "
                 f"Pe={PE})")
    ax.legend(frameon=False, fontsize=9)
    ax.grid(alpha=0.25, lw=0.5)
    fig.tight_layout()
    fig.savefig(os.path.join(RESULTS, "refine_convergence.png"), dpi=130)
    print("wrote refine_convergence.png")


if __name__ == "__main__":
    main()
