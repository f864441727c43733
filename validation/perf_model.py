#!/usr/bin/env python
"""Analytic multi-chip performance model (verdict r3 #9).

Real multi-chip hardware is unavailable in this environment (one v5e
chip via the axon tunnel), so the scaling story is made quantitative
instead: per-step halo bytes over ICI vs the measured single-chip
kernel rate, giving a projected weak-scaling efficiency curve for the
production 2048^2-per-chip cylinder scene.

Model
-----
Sharded step = fused per-shard kernel rate (MEASURED on a real 1x1 mesh,
lean-split path: x_whole variant for 1-wide row meshes, generic
lane-patched variant for 2D meshes) + halo exchange (modelled).

Halo traffic per chip per step (fused_sharded.py:27 — one 1-cell halo
of f[9] + vel[2] + flags[1] = 12 f32 planes, O(surface)):
    to each y-neighbour: 12 * 4B * w        bytes (one row)
    to each x-neighbour: 12 * 4B * (h + 2)  bytes (one column, row-ext)
On a 2D mesh every chip sends/receives on up to 4 neighbours in
parallel over distinct ICI links, so the serial comm term is the MAX
single-link transfer, plus a fixed per-collective latency. The model
conservatively assumes ZERO compute/comm overlap (the kernel needs the
halo before it starts; temporal blocking could hide it — headroom, not
assumed).

Constants (public numbers for TPU v5e; jax-ml.github.io/scaling-book):
    ICI_BW   = 4.5e10 B/s one-way per link
    ICI_LAT  = 1e-6 s per ppermute hop (order-of-magnitude)
    DCN_BW   = 3.125e9 B/s per host (25 Gbps) — multi-host rows
Writes validation/results/multichip_model.json.
"""

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(ROOT, "validation", "results")

ICI_BW = 4.5e10
ICI_LAT = 1e-6
DCN_BW = 3.125e9
PLANES = 12  # f[9] + vel[2] + flags (fused_sharded.py docstring)
BYTES = 4


def halo_time_s(h, w, ny, nx, bw=ICI_BW, lat=ICI_LAT, k=1, x_halo=1,
                planes=PLANES):
    """Serial halo time for an (h, w) f32 shard on an (ny, nx) mesh.
    ``k`` > 1 models k-step temporal blocking: one k-row-deep y halo
    (and, on 2D meshes, one ``x_halo``-lane-wide x edge block — the
    extended-window transfer width, >= k) per k-step super-step (call
    once per super-step and divide by k)."""
    transfers = []
    if ny > 1:
        transfers.append(planes * BYTES * w * k)
    if nx > 1:
        transfers.append(planes * BYTES * (h + 2 * k) * x_halo)
    if not transfers:
        return 0.0
    # y and x phases are sequential (corner correctness: x pieces are
    # exchanged on the row-extended block), each phase's two directions
    # ride distinct links in parallel:
    n_phases = (ny > 1) + (nx > 1)
    return sum(t / bw for t in transfers) + n_phases * lat


def model(per_chip=(2048, 2048), row_mesh_mlups=5500.0,
          mesh_2d_mlups=3000.0, row_mesh_k=1, mesh_2d_k=1, x_halo=8,
          meshes=((1, 1), (2, 1), (4, 1), (8, 1),
                  (16, 1), (2, 2), (2, 4), (4, 4),
                  (4, 8), (8, 8), (8, 16))):
    """Weak scaling: every chip keeps `per_chip` cells; the domain grows
    with the mesh. The per-shard compute rate is MEASURED on the real
    chip: ``row_mesh_mlups`` for 1-wide (ny, 1) meshes — the natural
    decomposition for the channel scene, where the x_whole lean kernels
    run with ``row_mesh_k``-step temporal blocking (one k-row-deep halo
    exchange per k steps; sharded_1x1_overhead.json) — and
    ``mesh_2d_mlups`` for 2D meshes (extended-window lean kernels at
    ``mesh_2d_k`` steps per pass exchanging ``x_halo``-lane edge
    blocks, sharded_1x1_ext.json; the k=1 generic lane-patched variant
    when no ext measurement exists)."""
    h, w = per_chip
    cells = h * w
    rows = []
    for ny, nx in meshes:
        if nx == 1:
            rate, k, xh = row_mesh_mlups, row_mesh_k, 1
        else:
            rate, k, xh = mesh_2d_mlups, mesh_2d_k, (x_halo if
                                                     mesh_2d_k > 1 else 1)
        t_comp = cells / (rate * 1e6)
        t_comm = halo_time_s(h, w, ny, nx, k=k, x_halo=xh) / k
        t_step = t_comp + t_comm
        chips = ny * nx
        rows.append({
            "mesh": [ny, nx],
            "chips": chips,
            "domain": [h * ny, w * nx],
            "halo_us": round(t_comm * 1e6, 2),
            "step_us": round(t_step * 1e6, 2),
            "mlups_per_chip": round(cells / t_step / 1e6, 1),
            "mlups_total": round(chips * cells / t_step / 1e6, 1),
            "weak_scaling_eff": round(t_comp / t_step, 4),
        })
    return rows


def jrl_model(rates, per_chip=(1024, 512),
              meshes=((1, 1), (2, 1), (4, 1), (8, 1), (16, 1))):
    """Row-mesh weak scaling of the sharded JRL phase runners
    (ops/pallas/fused_jrl_sharded.py) from the real-1x1-mesh rates in
    jrl_sharded_1x1.json, at the production ethaline refine-8 shard.
    Halo planes per step: C balance/approach exchange h[9] (the flags
    pieces are fixed per phase and hoisted); the fluid step exchanges
    f[9]+vel[2] before kernel A and rho+vel[2] before kernel B."""
    h, w = per_chip
    cells = h * w
    phases = {"balance": 9, "approach": 9, "fluid": 14}
    out = {}
    for ph, planes in phases.items():
        rate = rates.get(f"{ph}_sharded_mlups")
        if not rate:
            continue
        rows = []
        for ny, nx in meshes:
            t_comp = cells / (rate * 1e6)
            t_comm = halo_time_s(h, w, ny, nx, planes=planes)
            if ph == "fluid":
                t_comm += ICI_LAT  # two exchange rounds per step
            t_step = t_comp + t_comm
            rows.append({
                "mesh": [ny, nx], "chips": ny * nx,
                "halo_us": round(t_comm * 1e6, 2),
                "mlups_per_chip": round(cells / t_step / 1e6, 1),
                "weak_scaling_eff": round(t_comp / t_step, 4),
            })
        out[ph] = rows
    return out


def main():
    bench = {}
    bench_path = os.path.join(ROOT, "BENCH_r02.json")
    for cand in (
        "BENCH_r04.json",
        "BENCH_r03.json",
        os.path.join("validation", "results", "bench_current.json"),
        "BENCH_r02.json",
    ):
        p = os.path.join(ROOT, cand)
        if os.path.exists(p):
            with open(p) as fo:
                bench = json.load(fo)
            bench_path = cand
            break
    rate = float(bench.get("parsed", bench).get("value", 7300.0))

    overhead_path = os.path.join(RESULTS, "sharded_1x1_overhead.json")
    row_rate, rate_2d, row_k, k_2d = 5500.0, 3000.0, 1, 1
    overhead = None
    overhead_src = "assumed (no measurement)"
    rate_2d_src = "assumed"
    if os.path.exists(overhead_path):
        with open(overhead_path) as fo:
            ov = json.load(fo)
        row_rate = float(ov["sharded_mlups"])
        if "sharded_k4_mlups" in ov:  # k=4 temporal blocking, row meshes
            row_rate, row_k = float(ov["sharded_k4_mlups"]), 4
        rate_2d = float(ov.get("sharded_generic_x_mlups", rate_2d))
        rate_2d_src = "sharded_1x1_overhead.json generic-x k=1"
        overhead = float(ov["unsharded_mlups"]) / float(ov["sharded_mlups"])
        overhead_src = "sharded_1x1_overhead.json (measured on the real chip)"
    ext_path = os.path.join(RESULTS, "sharded_1x1_ext.json")
    if os.path.exists(ext_path):  # extended-window k-blocking, 2D meshes
        with open(ext_path) as fo:
            ex = json.load(fo)
        for kk in (4, 2):
            key = f"ext_k{kk}_mlups"
            if key in ex and float(ex[key]) > rate_2d:
                rate_2d, k_2d = float(ex[key]), kk
                rate_2d_src = f"sharded_1x1_ext.json ext k={kk}"
                break

    out = {
        "model": "t_step = cells / measured_per_shard_rate + max-link halo bytes / ICI_BW + latency; zero overlap assumed",
        "constants": {"ici_bw_Bps": ICI_BW, "ici_lat_s": ICI_LAT,
                      "halo_planes": PLANES, "dcn_bw_Bps": DCN_BW},
        "inputs": {
            "single_chip_unsharded_mlups": rate,
            "bench_source": bench_path,
            "per_shard_row_mesh_mlups": row_rate,
            "per_shard_row_mesh_k": row_k,
            "per_shard_2d_mesh_mlups": rate_2d,
            "per_shard_2d_mesh_k": k_2d,
            "per_shard_2d_mesh_rate_source": rate_2d_src,
            "shard_overhead_1x1_vs_unsharded_k1": (
                round(overhead, 3) if overhead else None),
            "rate_source": overhead_src,
            "note": (
                "row-mesh rate is the measured k=4 temporally-blocked "
                "lean-split kernel (one k-row-deep halo per 4 steps, "
                "bit-exact vs the k=1 path over 24 steps on the real "
                "chip); the 2D-mesh rate is the extended-window "
                "k-blocked kernel when measured (x pulls ride ppermuted "
                "8-lane neighbour edge blocks zero-padded to the "
                "128-lane alignment extension), else the k=1 generic "
                "lane-patched kernel"
            ),
        },
        "weak_scaling_2048sq_per_chip": model(
            per_chip=(2048, 2048), row_mesh_mlups=row_rate,
            mesh_2d_mlups=rate_2d, row_mesh_k=row_k, mesh_2d_k=k_2d),
        "weak_scaling_1024sq_per_chip": model(
            per_chip=(1024, 1024), row_mesh_mlups=row_rate,
            mesh_2d_mlups=rate_2d, row_mesh_k=row_k, mesh_2d_k=k_2d),
        "jrl_row_mesh_weak_scaling_1024x512_per_chip": None,
        "multi_host_note": (
            "across hosts the same halos ride DCN at ~3.1e9 B/s per "
            "host: a 2048-wide shard edge is 98 KB -> 32 us, so "
            "host-boundary shards need >= 4096 rows per chip or "
            "temporal-blocked halo depth k to stay >95% efficient; "
            "jax.distributed wiring validated in tests/test_multihost.py"
        ),
    }
    jrl_path = os.path.join(RESULTS, "jrl_sharded_1x1.json")
    if os.path.exists(jrl_path):
        with open(jrl_path) as fo:
            jrl = json.load(fo)
        out["jrl_row_mesh_weak_scaling_1024x512_per_chip"] = {
            "rate_source": "jrl_sharded_1x1.json (real 1x1 mesh, "
                           "ethaline refine 8)",
            **jrl_model(jrl),
        }
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, "multichip_model.json"), "w") as fo:
        json.dump(out, fo, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
