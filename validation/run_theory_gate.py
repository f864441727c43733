#!/usr/bin/env python
"""Quantitative theory gate for the approach curves (verdict r3 #6).

The reference overlays theoretical negative-feedback curves from
user-supplied `NF/Rg*.txt` files (`demo_plot_validation.py:96-120`,
files not shipped). This gate computes the published analytic
approximation in-repo instead: the Cornut-Lefrou expression for the
normalized SECM negative-feedback (insulating substrate) approach curve

    N(L, Rg) = (2.08/Rg^0.358 (L - 0.145/Rg) + 1.585)
             / (2.08/Rg^0.358 (L + 0.0023 Rg) + 1.57
                + ln(Rg)/L + (2/(pi Rg)) ln(1 + pi Rg / (2 L)))

[Cornut & Lefrou, J. Electroanal. Chem. 608 (2007) 59, eq. (17);
accuracy stated < 3% for Rg >= 2, 0.1 <= L <= inf], against the
low-Pe (diffusion-dominated) sweep records, using the same
normalization window the reference plot uses (mean over the 10 dumps
starting 30 dumps from contact, `demo_plot_validation.py:59-62`).

It also gates the POSITIVE-feedback records (substrate held at bulk
concentration: the reference flips the top wall OBSTACLE -> INFLOW_2,
`demo_2d_LBM_JRL_C_45degree.py:165` — the perfectly regenerating
conducting-substrate case) against the Cornut-Lefrou conducting
approximation

    N(L, Rg) = a(Rg) + pi / (4 b(Rg) arctan L)
             + (1 - a(Rg) - 1/(2 b(Rg))) (2/pi) arctan L
    a(Rg) = ln2 [1 + (1 - 2/pi arccos(1/Rg)) - (1 - (2/pi arccos(1/Rg))^2)]
    b(Rg) = 1 + 0.639 (1 - 2/pi arccos(1/Rg))
              - 0.186 (1 - (2/pi arccos(1/Rg))^2)

[Cornut & Lefrou, J. Electroanal. Chem. 621 (2008) 178, fast-kinetics
limit; N(L->inf) = 1 exactly].

The tip here is a 45-degree cone with Rg = 4 rather than the flat
embedded disk of the theory, and Pe is small-but-finite, so systematic
geometric offsets are expected where the gap is thin; the gate asserts
the curves agree within per-region tolerances (REGIONS: tight in the
far field, looser near contact), which a wrong convection rate, broken
INFLOW head, or broken frame interpolation would violate by far more.

Writes validation/results/theory_gate.json.
"""

import json
import math
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP = os.path.join(ROOT, "validation", "sweep_out", "_45degree_g9",
                     "records")
SWEEP_POS = os.path.join(ROOT, "validation", "sweep_out", "_45degree_g9",
                         "records_positive")
# ethaline tip at refine 1 has the same lattice geometry as the
# 45-degree water tip (radius 6.5, inflow height 40.5, H=128, Rg=4 —
# models/jrl.py:74-86), so the identical NF gate applies to its records
SWEEP_ETH = os.path.join(ROOT, "validation", "sweep_out", "_ethaline_g9",
                         "records")
RESULTS = os.path.join(ROOT, "validation", "results")

RADIUS_LAT = 6.5  # lattice radius a (JRLCConfig.radius_obs at refine 1)
H_LAT = 128
INFLOW_LAT = 40.5  # 45degree inflow height
RG = 4.0
# Two-region gate: far-field (theory stated <3%-accurate for the
# embedded DISK; our 45-degree cone with capped tau_D tracks it within
# ~1% there — measured worst 0.0104 across the 20 records) and
# near-contact (L < 1.5: the cone's sidewall keeps feeding the gap by
# diffusion, a geometry effect the disk theory cannot represent —
# measured <= 0.056, identical across all ten Re AND grid-converged to
# <1% between refine 1 and refine 2, validation/run_refine_study.py,
# i.e. a geometry offset, not a transport bug). A broken convection
# rate / INFLOW head / frame interpolation breaks BOTH regions by far
# more than these bands. (Historical: with the index-based dump->L
# mapping these read 0.068/0.203 — that was mapping drift, not physics.)
REGIONS = [
    {"L_range": (1.5, 4.0), "tol": 0.03},
    {"L_range": (0.4, 1.5), "tol": 0.10},
]
# Positive feedback: the theory current diverges ~pi/(4L) at contact and
# the cone's thin-gap feeding differs there; measured far <= 0.0078,
# near (0.7 <= L <= 1.5) <= 0.080.
REGIONS_POS = [
    {"L_range": (1.5, 4.0), "tol": 0.03},
    {"L_range": (0.7, 1.5), "tol": 0.12},
]
L_RANGE = (0.4, 4.0)  # reported-deviation window (diagnostics)
TOL = 0.15  # legacy single-window tolerance (kept for the JSON record)


def nf_theory(L, Rg=RG):
    """Cornut-Lefrou 2007 eq. 17 (insulating substrate)."""
    L = np.asarray(L, np.float64)
    num = 2.08 / Rg**0.358 * (L - 0.145 / Rg) + 1.585
    den = (
        2.08 / Rg**0.358 * (L + 0.0023 * Rg)
        + 1.57
        + math.log(Rg) / L
        + (2.0 / (math.pi * Rg)) * np.log(1.0 + math.pi * Rg / (2.0 * L))
    )
    return num / den


def pf_theory(L, Rg=RG):
    """Cornut-Lefrou 2008 (JEAC 621, 178), conducting substrate.

    Fast-substrate-kinetics limit of the unified approximation; exact
    limits: N -> 1 as L -> inf, N ~ pi/(4 b L) as L -> 0.
    """
    L = np.asarray(L, np.float64)
    t = (2.0 / math.pi) * math.acos(1.0 / Rg)
    alpha = math.log(2.0) * (1.0 + (1.0 - t) - (1.0 - t**2))
    beta = 1.0 + 0.639 * (1.0 - t) - 0.186 * (1.0 - t**2)
    return (
        alpha
        + (1.0 / beta) * (math.pi / (4.0 * np.arctan(L)))
        + (1.0 - alpha - 1.0 / (2.0 * beta)) * (2.0 / math.pi) * np.arctan(L)
    )


def load_record(path):
    xs, cur = [], []
    with open(path) as fo:
        fo.readline()
        for line in fo:
            parts = line.split()
            if len(parts) < 3:
                break
            xs.append(float(parts[0]))
            cur.append(float(parts[2]))
    return np.asarray(xs), np.asarray(cur)


def gate_case(path, theory_fn=nf_theory, regions=REGIONS):
    xs_um, cur = load_record(path)
    if len(cur) < 45:
        return None
    # Tip position from the record's own x column (traveled distance in
    # um; cell size = radius_real / radius_lat): dumps are NOMINALLY one
    # lattice cell apart, but real records contain duplicate dumps and
    # occasional multi-cell jumps — an index-based mapping (INFLOW + 1 +
    # arange(n), used before) drifts by up to ~3.5 cells = 0.5 L by
    # contact, which near-contact deviations are very sensitive to.
    n = len(cur)
    cell_um = 12.5 / RADIUS_LAT  # radius_obs_real = 12.5e-6 m
    walks = INFLOW_LAT + xs_um / cell_um
    L = ((H_LAT - 1) - walks) / RADIUS_LAT
    # reference normalization: mean of the 10 dumps starting 30 dumps
    # from contact (flipped indexing), demo_plot_validation.py:59-62
    idx_from_contact = (n - 1) - np.arange(n)
    norm_mask = (idx_from_contact >= 30) & (idx_from_contact < 40)
    sim = cur / np.mean(cur[norm_mask])
    theo = theory_fn(np.clip(L, 1e-3, None))
    theo = theo / np.mean(theo[norm_mask])
    region_out = []
    ok = True
    for reg in regions:
        lo, hi = reg["L_range"]
        mask = (L >= lo) & (L <= hi)
        dev = np.abs(sim[mask] - theo[mask])
        r_ok = bool(dev.max() <= reg["tol"])
        ok = ok and r_ok
        region_out.append({
            "L_range": [lo, hi],
            "tol": reg["tol"],
            "max_abs_dev": float(dev.max()),
            "mean_abs_dev": float(dev.mean()),
            "pass": r_ok,
        })
    mask = (L >= L_RANGE[0]) & (L <= L_RANGE[1])
    dev = np.abs(sim[mask] - theo[mask])
    return {
        "file": os.path.basename(path),
        "n_dumps": int(n),
        "max_abs_dev": float(dev.max()),
        "mean_abs_dev": float(dev.mean()),
        "L_range": list(L_RANGE),
        "regions": region_out,
        "pass": ok,
    }


def gate_dir(sweep_dir, theory_fn, regions):
    pe_tags = [int(pe * 10000) for pe in (1e-3, 3e-3)]
    cases = []
    for fn in sorted(os.listdir(sweep_dir)):
        if not fn.endswith(".txt"):
            continue
        if not any(fn.endswith(f"_Pe{t}.txt") for t in pe_tags):
            continue
        r = gate_case(os.path.join(sweep_dir, fn), theory_fn, regions)
        if r:
            cases.append(r)
    return cases


def main():
    if not os.path.isdir(SWEEP):
        print(f"no sweep records at {SWEEP}; run validation/run_batch_pe.py")
        return 1
    cases = gate_dir(SWEEP, nf_theory, REGIONS)
    pos_cases = (
        gate_dir(SWEEP_POS, pf_theory, REGIONS_POS)
        if os.path.isdir(SWEEP_POS)
        else []
    )
    eth_cases = (
        gate_dir(SWEEP_ETH, nf_theory, REGIONS)
        if os.path.isdir(SWEEP_ETH)
        else []
    )
    out = {
        "theory": "Cornut-Lefrou 2007 eq.17, insulating substrate, Rg=4",
        "tolerance": TOL,
        "normalization": "mean of dumps 30-39 from contact (ref plot)",
        "regions": REGIONS,
        "cases": cases,
        "n_pass": sum(c["pass"] for c in cases),
        "n_total": len(cases),
        "positive": {
            "theory": (
                "Cornut-Lefrou 2008 (JEAC 621, 178), conducting substrate,"
                " fast kinetics, Rg=4"
            ),
            "regions": REGIONS_POS,
            "cases": pos_cases,
            "n_pass": sum(c["pass"] for c in pos_cases),
            "n_total": len(pos_cases),
            "pass": bool(pos_cases) and all(c["pass"] for c in pos_cases),
        },
        "ethaline": {
            "theory": "Cornut-Lefrou 2007 eq.17 (same tip geometry at "
                      "refine 1: radius 6.5, inflow 40.5, Rg=4)",
            "regions": REGIONS,
            "cases": eth_cases,
            "n_pass": sum(c["pass"] for c in eth_cases),
            "n_total": len(eth_cases),
            "pass": bool(eth_cases) and all(c["pass"] for c in eth_cases),
        },
        "pass": bool(cases)
        and all(c["pass"] for c in cases)
        and (not pos_cases or all(c["pass"] for c in pos_cases))
        and (not eth_cases or all(c["pass"] for c in eth_cases)),
    }
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, "theory_gate.json"), "w") as fo:
        json.dump(out, fo, indent=1)
    try:
        plot_overlay()
    except Exception as e:  # plot is evidence, not the gate
        print(f"overlay plot skipped: {e}", file=sys.stderr)
    print(json.dumps(out, indent=1))
    return 0 if out["pass"] else 2


def _curve(path):
    xs_um, cur = load_record(path)
    n = len(cur)
    # position from the record's own traveled-distance column — the same
    # mapping gate_case uses (index-based walks drift by up to ~0.5 L
    # near contact on records with duplicate dumps / multi-cell jumps)
    cell_um = 12.5 / RADIUS_LAT
    walks = INFLOW_LAT + xs_um / cell_um
    L = ((H_LAT - 1) - walks) / RADIUS_LAT
    idx_from_contact = (n - 1) - np.arange(n)
    norm_mask = (idx_from_contact >= 30) & (idx_from_contact < 40)
    return L, cur / np.mean(cur[norm_mask]), norm_mask


def plot_overlay():
    """theory_gate.png: simulated low-Pe curves vs the two analytic
    Cornut-Lefrou expressions (the quantitative version of the
    reference's demo_plot_validation overlay, whose NF/*.txt theory
    files are user data it does not ship)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(10, 4), sharex=True)
    Lt = np.linspace(0.3, 5.0, 300)
    for ax, (sweep_dir, theory_fn, title) in zip(
        axes,
        [
            (SWEEP, nf_theory, "negative feedback (insulating)"),
            (SWEEP_POS, pf_theory, "positive feedback (conducting)"),
        ],
    ):
        theo = theory_fn(Lt)
        for fn in sorted(os.listdir(sweep_dir)):
            if not (fn.endswith("_Pe10.txt") or fn.endswith("_Pe30.txt")):
                continue
            L, sim, norm_mask = _curve(os.path.join(sweep_dir, fn))
            tnorm = np.mean(theory_fn(np.clip(L, 1e-3, None))[norm_mask])
            ax.plot(L, sim * tnorm, lw=0.8, alpha=0.7,
                    label=fn[len("record_res64_"):-len(".txt")])
        ax.plot(Lt, theo, "k--", lw=2, label="Cornut-Lefrou")
        ax.set_xlim(0.3, 5.0)
        ax.set_xlabel("L = d / a")
        ax.set_ylabel("I / I$_\\infty$")
        ax.set_title(title)
        ax.legend(fontsize=6)
    fig.tight_layout()
    fig.savefig(os.path.join(RESULTS, "theory_gate.png"), dpi=130)


if __name__ == "__main__":
    sys.exit(main())
