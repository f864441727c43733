#!/usr/bin/env python
"""Measure the row-tiled SHARDED fused cylinder step on a real 1x1 mesh
vs the single-device fused step (round-3 verdict task 4 'Done' check:
within ~15% after removing the per-step 12-plane stacked copy).

Both paths run k=1 (no temporal blocking) with per-step macro writes
skipped where their default does so; the sharded path always writes
macro, so the unsharded comparator uses write_macro=True for a fair
per-step traffic comparison.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from jrl_lbm_tpu.models import cylinder as cyl
from jrl_lbm_tpu.ops.pallas import fused_sharded as fsh
from jrl_lbm_tpu.ops.pallas import fused_step as fs
from jrl_lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y


def timeit(run, state, fields, steps, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(state, fields, steps)
        float(jnp.sum(out["rho"]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    only_ext = "ext" in sys.argv[1:]
    res = (2048, 2048)
    cfg = cyl.CylinderConfig(res=res, D=64.0, Re=5000.0)
    state, fields = cyl.init(cfg)
    cells = res[0] * res[1]
    # one sync per window: >= 600 steps keeps the ~50 ms tunnel
    # round-trip under ~10% of the window (docs/PERFORMANCE.md #20)
    steps = 600

    dev = jax.devices()[0]
    mesh = Mesh(np.asarray([dev]).reshape(1, 1), (AXIS_Y, AXIS_X))

    # pre-split comparator: the full-boundary kernel on every row
    # (lean_split=False keeps the round-2/3 behavior for the A/B)
    full_run = fsh.make_sharded_fused_cylinder_runner(
        cfg, mesh, tile_rows=64, lean_split=False
    )
    print("compiling sharded (full-boundary)...", flush=True)
    _ = full_run(state, fields, 1)
    float(jnp.sum(_["rho"]))
    t_fb = timeit(full_run, state, fields, steps)
    mlups_fb = cells * steps / t_fb / 1e6
    print(json.dumps({"path": "sharded-1x1-tiled64-full-boundary",
                      "us_per_step": t_fb / steps * 1e6,
                      "mlups": round(mlups_fb, 1)}), flush=True)

    if only_ext:
        # EXTENDED-WINDOW mode forced on the 1x1 mesh (the ring ppermute
        # wraps the shard's own edge blocks back — the periodic values
        # x_whole reproduces with rolls, so the full-boundary path is a
        # valid numerics reference): the representative per-shard rate
        # for k-step temporal blocking on nx > 1 (2D) meshes, which the
        # column-patched generic variant cannot do.
        chk_steps = 24
        ref_out = full_run(state, fields, chk_steps)
        ref_np = {kk: np.asarray(v) for kk, v in ref_out.items()}
        from jrl_lbm_tpu.utils.types import CellType

        fluid = np.asarray(fields["flags"]) != int(CellType.OBSTACLE)
        out = {"full_boundary_mlups": round(mlups_fb, 1),
               "k_check_steps": chk_steps, "x_ext": 128}
        for kk in (1, 2, 4):
            e_run = fsh.make_sharded_fused_cylinder_runner(
                cfg, mesh, tile_rows=64, lean_k=kk, lean_x_ext=128
            )
            print(f"compiling sharded (ext x128, k={kk})...", flush=True)
            out_k = e_run(state, fields, chk_steps)
            dmax = 0.0
            for key in ("f", "rho", "vel"):
                a, b = np.asarray(out_k[key]), ref_np[key]
                m = fluid if a.ndim == 2 else np.broadcast_to(fluid, a.shape)
                dmax = max(dmax, float(np.max(np.abs(a[m] - b[m]))))
            print(json.dumps({"check": f"ext-k{kk}-vs-full-boundary",
                              "steps": chk_steps, "max_abs_dev": dmax}),
                  flush=True)
            t_e = timeit(e_run, state, fields, steps)
            mlups_e = cells * steps / t_e / 1e6
            print(json.dumps({"path": f"sharded-1x1-lean-ext128-k{kk}",
                              "us_per_step": t_e / steps * 1e6,
                              "mlups": round(mlups_e, 1)}), flush=True)
            out[f"ext_k{kk}_mlups"] = round(mlups_e, 1)
            out[f"ext_k{kk}_max_abs_dev_vs_full_boundary"] = dmax
        print(json.dumps(out), flush=True)
        with open(os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "results", "sharded_1x1_ext.json"), "w") as fo:
            json.dump(out, fo, indent=1)
        return

    # shipping sharded path: lean interior sweep + cond-gated band-fix
    # windows (auto-selected; tile_rows sets the lean tile height). On a
    # 1-wide mesh (incl. this 1x1) the x_whole variant runs: no
    # cross-shard x columns at all.
    sh_run = fsh.make_sharded_fused_cylinder_runner(cfg, mesh, tile_rows=64)
    print("compiling sharded (lean split)...", flush=True)
    _ = sh_run(state, fields, 1)
    float(jnp.sum(_["rho"]))
    t_sh = timeit(sh_run, state, fields, steps)
    mlups_sh = cells * steps / t_sh / 1e6
    print(json.dumps({"path": "sharded-1x1-lean-split-tiled64",
                      "us_per_step": t_sh / steps * 1e6,
                      "mlups": round(mlups_sh, 1)}), flush=True)

    # k-step temporal blocking on the lean path (row meshes only).
    # Besides timing, check k-chain NUMERICS here: interpret-mode CPU
    # compiles are superlinear in k (>600 s at k=4), so CI only covers
    # k<=2 — this real-chip A/B vs the full-boundary path (itself
    # CI-equivalence-tested against the unsharded step) is the k=4
    # correctness evidence.
    chk_steps = 24
    ref_out = full_run(state, fields, chk_steps)
    ref_np = {kk: np.asarray(v) for kk, v in ref_out.items()}
    from jrl_lbm_tpu.utils.types import CellType

    fluid = np.asarray(fields["flags"]) != int(CellType.OBSTACLE)
    k_mlups = {}
    k_maxdev = {}
    for kk in (2, 4):
        k_run = fsh.make_sharded_fused_cylinder_runner(
            cfg, mesh, tile_rows=64, lean_k=kk
        )
        print(f"compiling sharded (lean split, k={kk})...", flush=True)
        out_k = k_run(state, fields, chk_steps)
        dmax = 0.0
        for key in ("f", "rho", "vel"):
            a, b = np.asarray(out_k[key]), ref_np[key]
            m = fluid if a.ndim == 2 else np.broadcast_to(fluid, a.shape)
            dmax = max(dmax, float(np.max(np.abs(a[m] - b[m]))))
        k_maxdev[kk] = dmax
        print(json.dumps({"check": f"k{kk}-vs-full-boundary",
                          "steps": chk_steps, "max_abs_dev": dmax}),
              flush=True)
        t_k = timeit(k_run, state, fields, steps)
        k_mlups[kk] = cells * steps / t_k / 1e6
        print(json.dumps({"path": f"sharded-1x1-lean-split-k{kk}",
                          "us_per_step": t_k / steps * 1e6,
                          "mlups": round(k_mlups[kk], 1)}), flush=True)

    # generic (2D-mesh) lean variant forced on the same 1x1 mesh: x
    # pulls patch shard-edge lanes from cross-shard halo columns — the
    # representative per-shard rate for nx > 1 meshes
    gen_run = fsh.make_sharded_fused_cylinder_runner(
        cfg, mesh, tile_rows=64, lean_x_whole=False
    )
    print("compiling sharded (lean split, generic x)...", flush=True)
    _ = gen_run(state, fields, 1)
    float(jnp.sum(_["rho"]))
    t_gen = timeit(gen_run, state, fields, steps)
    mlups_gen = cells * steps / t_gen / 1e6
    print(json.dumps({"path": "sharded-1x1-lean-split-generic-x",
                      "us_per_step": t_gen / steps * 1e6,
                      "mlups": round(mlups_gen, 1)}), flush=True)

    step1 = fs.make_fused_step(cfg, write_macro=True)

    def un_run(st, fl, n):
        for _ in range(n):
            st = step1(st, fl)
        return st

    print("compiling unsharded...", flush=True)
    _ = un_run(state, fields, 1)
    float(jnp.sum(_["rho"]))
    t_un = timeit(un_run, state, fields, steps)
    mlups_un = cells * steps / t_un / 1e6
    print(json.dumps({"path": "unsharded-k1-write_macro",
                      "us_per_step": t_un / steps * 1e6,
                      "mlups": round(mlups_un, 1)}), flush=True)
    ratio = t_sh / t_un
    out = {
        "sharded_mlups": round(mlups_sh, 1),
        "sharded_path": "lean-split tiled64, x_whole (shipping default "
                        "on 1-wide meshes)",
        "sharded_k2_mlups": round(k_mlups[2], 1),
        "sharded_k4_mlups": round(k_mlups[4], 1),
        "k_check_steps": chk_steps,
        "k2_max_abs_dev_vs_full_boundary": k_maxdev[2],
        "k4_max_abs_dev_vs_full_boundary": k_maxdev[4],
        "sharded_generic_x_mlups": round(mlups_gen, 1),
        "sharded_full_boundary_mlups": round(mlups_fb, 1),
        "unsharded_mlups": round(mlups_un, 1),
        "overhead_ratio": round(ratio, 3),
        "within_15pct": bool(ratio <= 1.15),
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "results", "sharded_1x1_overhead.json"), "w") as fo:
        json.dump(out, fo, indent=1)


if __name__ == "__main__":
    main()
