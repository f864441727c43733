#!/usr/bin/env python
"""Analytic multi-chip performance model (verdict r3 #9).

Real multi-chip hardware is unavailable in this environment (one v5e
chip via the axon tunnel), so the scaling story is made quantitative
instead: per-step halo bytes over ICI vs the measured single-chip
kernel rate, giving a projected weak-scaling efficiency curve for the
production 2048^2-per-chip cylinder scene.

Model
-----
Sharded step = fused per-shard kernel (measured) + halo exchange
(modelled) + per-call shard_map overhead (measured on a 1x1 mesh).

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


def halo_time_s(h, w, ny, nx, bw=ICI_BW, lat=ICI_LAT):
    """Serial halo time for an (h, w) f32 shard on an (ny, nx) mesh."""
    transfers = []
    if ny > 1:
        transfers.append(PLANES * BYTES * w)
    if nx > 1:
        transfers.append(PLANES * BYTES * (h + 2))
    if not transfers:
        return 0.0
    # y and x phases are sequential (corner correctness: x columns are
    # exchanged on the row-extended block), each phase's two directions
    # ride distinct links in parallel:
    n_phases = (ny > 1) + (nx > 1)
    return sum(t / bw for t in transfers) + n_phases * lat


def model(per_chip=(2048, 2048), single_chip_mlups=7300.0,
          shard_overhead=1.0, meshes=((1, 1), (1, 2), (2, 2), (2, 4),
                                      (4, 4), (4, 8), (8, 8), (8, 16))):
    """Weak scaling: every chip keeps `per_chip` cells; the domain grows
    with the mesh. `shard_overhead` is the measured 1x1-mesh shard_map
    slowdown factor of the per-shard kernel (1.0 = none)."""
    h, w = per_chip
    cells = h * w
    t_comp = cells / (single_chip_mlups * 1e6) * shard_overhead
    rows = []
    for ny, nx in meshes:
        t_comm = halo_time_s(h, w, ny, nx)
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


def main():
    bench = {}
    bench_path = os.path.join(ROOT, "BENCH_r02.json")
    for cand in ("BENCH_r03.json", "BENCH_r02.json"):
        p = os.path.join(ROOT, cand)
        if os.path.exists(p):
            with open(p) as fo:
                bench = json.load(fo)
            bench_path = cand
            break
    rate = float(bench.get("parsed", bench).get("value", 7300.0))

    overhead_path = os.path.join(RESULTS, "sharded_1x1_overhead.json")
    overhead = 1.0
    overhead_src = "assumed 1.0 (no measurement)"
    if os.path.exists(overhead_path):
        with open(overhead_path) as fo:
            ov = json.load(fo)
        overhead = float(ov["unsharded_mlups"]) / float(ov["sharded_mlups"])
        overhead_src = "sharded_1x1_overhead.json (measured on the real chip)"

    out = {
        "model": "t_step = t_kernel * overhead_1x1 + max-link halo bytes / ICI_BW + latency; zero overlap assumed",
        "constants": {"ici_bw_Bps": ICI_BW, "ici_lat_s": ICI_LAT,
                      "halo_planes": PLANES, "dcn_bw_Bps": DCN_BW},
        "inputs": {
            "single_chip_mlups": rate, "bench_source": bench_path,
            "shard_overhead_1x1": round(overhead, 3),
            "overhead_source": overhead_src,
        },
        "weak_scaling_2048sq_per_chip": model(
            per_chip=(2048, 2048), single_chip_mlups=rate,
            shard_overhead=overhead),
        "weak_scaling_1024sq_per_chip": model(
            per_chip=(1024, 1024), single_chip_mlups=rate,
            shard_overhead=overhead),
        "multi_host_note": (
            "across hosts the same halos ride DCN at ~3.1e9 B/s per "
            "host: a 2048-wide shard edge is 98 KB -> 32 us, so "
            "host-boundary shards need >= 4096 rows per chip or "
            "temporal-blocked halo depth k to stay >95% efficient; "
            "jax.distributed wiring validated in tests/test_multihost.py"
        ),
    }
    os.makedirs(RESULTS, exist_ok=True)
    with open(os.path.join(RESULTS, "multichip_model.json"), "w") as fo:
        json.dump(out, fo, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
