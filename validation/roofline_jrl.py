#!/usr/bin/env python
"""VPU slot count for the tiled JRL fluid kernel pair (verdict r4 #2).

Sizes the "compute diet" before coding it: traces `_fluid_a_update` and
`_fluid_b_update` (the window-parametric bodies every tiled/sharded/k
variant shares) at the production refine-8 shape (1024x512, TH=64) with
`jax.make_jaxpr`, weights each primitive by output elements, and charges
divides 8 slots (same methodology + constants as roofline.py). Writes
validation/results/roofline_jrl.json.

Run with --tag <name> to write roofline_jrl_<name>.json (for before /
after A/B of the diet).
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_platforms", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(ROOT, "validation", "results")

from roofline import VPU_PEAK, count_ops  # noqa: E402  (same dir)


def main():
    tag = None
    if "--tag" in sys.argv:
        tag = sys.argv[sys.argv.index("--tag") + 1]

    from jrl_lbm_tpu.models import jrl
    from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled as tiled

    # production refine-8 ethaline grid (fluid_k.json geometry)
    cfg = jrl.JRLFluidConfig(
        res=(128, 64), Re=1e-4, vel_obs_real=0.2848,
        gravity_strength_real=-9.8, shape="ethaline", refine=8,
    )
    H, W = cfg.eff_res
    TH = tiled.pick_tile_rows(cfg)
    cfg_c = tiled._cfg_consts(cfg)
    R = TH
    f32 = jnp.float32

    walks = jnp.asarray(cfg_c["inflow_h"], f32)
    walks_int = jnp.asarray(int(cfg_c["inflow_h"]), jnp.int32)

    def body_a(f_pad, vel_pad, rho_mid):
        return tiled._fluid_a_update(
            cfg_c, R, 2 * TH, walks, walks_int, list(f_pad),
            (vel_pad[0], vel_pad[1]), rho_mid)

    def body_b(fq, rho_pad, vel_pad):
        return tiled._fluid_b_update(
            cfg_c, R, 2 * TH, walks, walks_int, list(fq), rho_pad,
            (vel_pad[0], vel_pad[1]))

    f_pad = [jnp.zeros((R + 2, W), f32) for _ in range(9)]
    vel_pad = [jnp.zeros((R + 2, W), f32) for _ in range(2)]
    rho_mid = jnp.zeros((R, W), f32)
    fq = [jnp.zeros((R, W), f32) for _ in range(9)]
    rho_pad = jnp.zeros((R + 2, W), f32)

    jx_a = jax.make_jaxpr(body_a)(f_pad, vel_pad, rho_mid)
    jx_b = jax.make_jaxpr(body_b)(fq, rho_pad, vel_pad)
    cells = R * W
    per_a, prim_a = count_ops(jx_a, cells)
    per_b, prim_b = count_ops(jx_b, cells)
    tot_a = sum(per_a.values())
    tot_b = sum(per_b.values())
    div_a = prim_a.get("div", 0.0)
    div_b = prim_b.get("div", 0.0)

    # lean interior-tile bodies (r5 split)
    def body_la(f_pad):
        return tiled._fluid_a_lean(cfg_c, R, list(f_pad))

    def body_lb(fq, rho_pad, vel_pad):
        return tiled._fluid_b_lean(cfg_c, R, list(fq), rho_pad,
                                   (vel_pad[0], vel_pad[1]))

    per_la, _ = count_ops(jax.make_jaxpr(body_la)(f_pad), cells)
    per_lb, _ = count_ops(
        jax.make_jaxpr(body_lb)(fq, rho_pad, vel_pad), cells)
    lean_total = sum(per_la.values()) + sum(per_lb.values())

    measured = None
    fk = os.path.join(RESULTS, "fluid_k.json")
    if os.path.exists(fk):
        with open(fk) as fo:
            measured = json.load(fo).get("k1_mlups")

    slots = tot_a + tot_b
    out = {
        "kernel": f"fused_jrl_tiled A+B pair ({H}x{W}, TH={TH})",
        "method": "jax.make_jaxpr over _fluid_a_update/_fluid_b_update; "
                  "elems-weighted issue slots; div charged 8x; lower "
                  "bound (no Mosaic loop/addressing overhead)",
        "ops_per_cell_step": {
            "A": {**{k: round(v, 1) for k, v in per_a.items()},
                  "total": round(tot_a, 1)},
            "B": {**{k: round(v, 1) for k, v in per_b.items()},
                  "total": round(tot_b, 1)},
            "total_slots": round(slots, 1),
            "divides_per_cell_step": round(div_a + div_b, 1),
            "lean_pair_total": round(lean_total, 1),
        },
        "top_primitives_A": {k: round(v, 1)
                             for k, v in list(prim_a.items())[:14]},
        "top_primitives_B": {k: round(v, 1)
                             for k, v in list(prim_b.items())[:14]},
        "measured": {"k1_mlups": measured, "source": "fluid_k.json"},
    }
    if measured:
        ach = measured * 1e6 * slots
        out["vpu"] = {
            "peak_lane_ops_s": VPU_PEAK,
            "achieved_lane_ops_s": round(ach, -9),
            "utilization": round(ach / VPU_PEAK, 3),
            "speed_of_light_mlups_at_73pct": round(
                0.73 * VPU_PEAK / slots / 1e6, 0),
        }
    name = f"roofline_jrl_{tag}.json" if tag else "roofline_jrl.json"
    path = os.path.join(RESULTS, name)
    with open(path, "w") as fo:
        json.dump(out, fo, indent=1)
    print(json.dumps(out, indent=1))
    print(f"\nwrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
