"""Shared implementation of the eight JRL demo CLIs.

`fluid_main` ports `demo/demo_2d_LBM_JRL_fluid_{cylinder,45degree,
InfinitePlane,ethaline}.py` and `c_main` ports the four
`demo_2d_LBM_JRL_C_*.py` scripts: same unit-conversion banner, file
layout (Re_*.h5 with dataset "vel", C_balance*.h5 with "C"/"h",
balance.txt and record_res*_Re*_Pe*.txt with the reference's column
formats), skip-if-exists checkpoint semantics, and per-record Tecplot/
PNG dumps. The physics runs on the device-resident fori_loop scenes in
`jrl_lbm_tpu.models.jrl`.
"""

from __future__ import annotations

import math
import os

import numpy as np
import jax.numpy as jnp

from _common import demo_path

from jrl_lbm_tpu.models import jrl
from jrl_lbm_tpu.utils.grid import get_staggered
from jrl_lbm_tpu.utils.io import (
    dump_2d_plt_file_C_rho,
    load_balance_h5,
    load_fluid_h5,
    mkdir,
    save_balance_h5,
    save_fluid_h5,
    save_img,
)

_FLUID_PREFIX = {
    "cylinder": "",
    "45degree": "_45degree",
    "infiniteplane": "_InfinitePlane",
}


def _fluid_prefix(shape: str, fluid: str, g_real: float) -> str:
    if shape == "ethaline":
        return f"_{fluid}_g{int(abs(g_real))}"
    return f"{_FLUID_PREFIX[shape]}_g{int(abs(g_real))}"


def _c_prefix(shape: str, fluid: str, g_real: float) -> str:
    if shape == "ethaline":
        return f"_{fluid}_g{int(abs(g_real))}"
    return {
        "cylinder": "_cylinder",
        "45degree": "_45degree",
        "infiniteplane": "_InfinitePlane",
    }[shape] + f"_g{int(abs(g_real))}"


def fluid_main(
    shape: str,
    res,
    Re: float,
    vel_obs_real: float,
    gravity_strength_real: float,
    Rg: float,
    fluid: str = "ethaline",
    refine: int = 1,
    progress: bool = True,
):
    """Fluid phase: run the moving-tip flow and write Re_{Re}.h5."""
    if shape == "ethaline" and Re <= 1e-5:
        Re = 1e-5  # `fluid_ethaline:66`

    path = demo_path()
    prefix = _fluid_prefix(shape, fluid, gravity_strength_real)
    mkdir(f"{path}/{prefix}")
    h5name = f"{path}/{prefix}/Re_{Re}.h5"
    if os.path.exists(h5name):
        print("The fluid field is already all set")
        return h5name

    cfg = jrl.JRLFluidConfig(
        res=tuple(res),
        Re=Re,
        vel_obs_real=vel_obs_real,
        gravity_strength_real=gravity_strength_real,
        Rg=Rg,
        shape=shape,
        refine=refine,
    )

    print("=========== Parameters in real world ===========")
    print("velocity of pin (Real) = {}".format(vel_obs_real))
    print("radius of pin (Real) = {}".format(cfg.radius_obs_real))
    print("time step (Real) = {}".format(cfg.dt_real))
    print("g = {}".format(gravity_strength_real))
    print("=========== Parameters in Computational world ===========")
    print("velocity of pin = {}".format(cfg.vel_obs))
    print("radius of pin = {}".format(cfg.radius_obs))
    print("viscosity = {}".format(cfg.visc))
    print("g = {}".format(cfg.gravity_strength))
    print("tau = {}".format(cfg.tau))
    print("total_steps = {}".format(cfg.total_steps))

    data_dir = f"{path}/{prefix}/demo_data_Re{Re}/"
    mkdir(data_dir)

    snapshots, state = jrl.run_fluid_phase(cfg, progress=progress)

    # per-record Tecplot dumps (`fluid_cylinder:252-261`)
    record_steps = jrl.fluid_record_steps(cfg)
    for k in (0, len(record_steps) - 1) if record_steps else ():
        vel_mac = get_staggered(jnp.asarray(snapshots[k]))
        dump_2d_plt_file_C_rho(
            os.path.join(data_dir, f"{record_steps[k]}.dat"),
            np.zeros(state["rho"].shape, np.float32),
            state["rho"],
            vel_mac[0],
            vel_mac[1],
        )

    save_fluid_h5(h5name, snapshots)
    return h5name


def c_main(
    shape: str,
    res,
    balance_time: float,
    Re: float,
    Pe: float,
    vel_obs_real: float,
    gravity_strength_real: float,
    Rg: float,
    fluid: str = "ethaline",
    refine: int = 1,
    is_negative: bool = True,
    progress: bool = True,
):
    """Concentration phase: balance run + approach run with records."""
    positive_fix = "" if is_negative else "_positive"
    path = demo_path()
    prefix = _c_prefix(shape, fluid, gravity_strength_real)
    mkdir(f"{path}/{prefix}")

    # fluid artifact name: the ethaline variant floors Re at 3e-5
    # (`C_ethaline:69`); the others use Re verbatim
    re_name = Re if (shape != "ethaline" or Re > 3e-5) else 3e-5
    fluid_prefix = _fluid_prefix(shape, fluid, gravity_strength_real)
    h5_fluid = f"{path}/{fluid_prefix}/Re_{re_name}.h5"
    if not os.path.exists(h5_fluid):
        print("Error: We cannot find this fluid field")
        return None

    cfg = jrl.JRLCConfig(
        res=tuple(res),
        balance_time=balance_time,
        Re=Re,
        Pe=Pe,
        vel_obs_real=vel_obs_real,
        gravity_strength_real=gravity_strength_real,
        Rg=Rg,
        shape=shape,
        refine=refine,
        is_negative=is_negative,
    )
    print("vel_obs_conv = {}, tau_D = {}, D = {}".format(
        cfg.vel_obs_conv, cfg.tau_D, cfg.D_coeff))
    print("total_steps = {}".format(cfg.total_steps))

    dir_path = (
        f"{path}/{prefix}/demo_data_LBM_2d{positive_fix}_res{min(cfg.eff_res)}"
        f"_Re{Re}_Pe{int(Pe * 10000)}/"
    )
    mkdir(dir_path)
    record_path = f"{path}/{prefix}/records{positive_fix}/"
    mkdir(record_path)

    state, fields, flags = jrl.c_init(cfg)
    area = np.asarray(cfg.area_array)

    # ---- phase A: balance (checkpointed) ----
    h5_C = f"{path}/{prefix}/C_balance{positive_fix}.h5"
    balance_name = dir_path + "balance.txt"

    if os.path.exists(h5_C):
        with open(balance_name, "w") as fo:
            fo.write("Step Inflow\n")
        C_np, h_np = load_balance_h5(h5_C)
        state = {"C": jnp.asarray(C_np), "h": jnp.asarray(h_np)}
    else:
        # partial checkpoint: production balance phases run for 1e9+
        # steps; persist state every ~10 intervals so an interrupted run
        # (preemption, tunnel failure) resumes instead of restarting
        import json as _json

        partial = h5_C + ".partial"
        pmeta = partial + ".json"
        start_done = 0
        if os.path.exists(partial) and os.path.exists(pmeta):
            with open(pmeta) as fo:
                start_done = int(_json.load(fo)["done"])
            C_np, h_np = load_balance_h5(partial)
            state = {"C": jnp.asarray(C_np), "h": jnp.asarray(h_np)}
            print(f"resuming balance from step {start_done}")
        else:
            with open(balance_name, "w") as fo:
                fo.write("Step Inflow\n")

        run_bal = jrl.pick_balance_runner(cfg, flags)
        steps = cfg.balance_steps
        interval = max(1, steps // 100)
        done = start_done
        walks_int = cfg.inflow_height_int
        rng_it = range(start_done, steps, interval)
        if progress:
            from tqdm import tqdm

            rng_it = tqdm(rng_it)
        k = 0
        for s0 in rng_it:
            n = min(interval, steps - done)
            state = run_bal(state, fields, n)
            done += n
            C_np = np.asarray(state["C"])
            inflow = float(
                (C_np[walks_int, : cfg.radius_obs_int] * area).sum()
            )
            with open(balance_name, "a+") as fo:
                fo.write("{} {}\n".format(done * cfg.dt_conv_real, inflow))
            k += 1
            if k % 10 == 0 and done < steps:
                save_balance_h5(partial, C_np, np.asarray(state["h"]))
                with open(pmeta, "w") as fo:
                    _json.dump({"done": done}, fo)
        save_balance_h5(h5_C, np.asarray(state["C"]), np.asarray(state["h"]))
        for p in (partial, pmeta):
            if os.path.exists(p):
                os.remove(p)

    save_img(np.asarray(state["C"]), dir_path + "C_000.png")

    # ---- phase B: approach ----
    record_name = record_path + (
        f"record_res{min(cfg.eff_res)}_Re{Re}_Pe{int(Pe * 10000)}.txt"
    )
    with open(record_name, "w") as fo:
        fo.write("Step Inflow Current u, v\n")

    vel_field = jnp.asarray(load_fluid_h5(h5_fluid))
    fields_a = dict(fields)
    fields_a["vel_field"] = vel_field

    run_app = jrl.pick_approach_runner(cfg, vel_field)
    dumps = jrl.c_dump_steps(cfg)
    cur = 0
    it = dumps
    if progress:
        from tqdm import tqdm

        it = tqdm(dumps)
    for s in it:
        # run through step s inclusive; record with the running means
        # accumulated since the last dump (`C_ethaline:364-416`)
        n = s + 1 - cur
        state, acc = run_app(state, fields_a, jnp.asarray(cur, jnp.int32), n)
        cur = s + 1
        cnt = max(float(acc["count"]), 1.0)
        inflow = float(acc["inflow_sum"]) / cnt
        current = float(acc["current_sum"]) / cnt
        rec_u = float(acc["rec_u"])
        rec_v = float(acc["rec_v"])
        with open(record_name, "a+") as fo:
            fo.write(
                "{} {} {} {} {}\n".format(
                    (s + 1) * cfg.dt_conv_real * vel_obs_real * 1e6,
                    inflow,
                    current,
                    rec_u,
                    rec_v,
                )
            )
        save_img(np.asarray(state["C"]), dir_path + "C_{:03}.png".format(s + 1))
        # per-dump Tecplot (phi recomputed at the dump position)
        walks = cfg.inflow_height + s * cfg.vel_obs_conv
        phi = jrl._c_tip_phi(cfg, fields["mesh"], walks)
        dump_2d_plt_file_C_rho(
            dir_path + "{:03}.dat".format(s + 1),
            np.asarray(state["C"]),
            np.asarray(phi),
            np.asarray(state["C"]) * 0.0,
            np.asarray(state["C"]) * 0.0,
        )
    # run out any remaining steps after the last dump
    if cur < cfg.total_steps:
        state, _ = run_app(
            state, fields_a, jnp.asarray(cur, jnp.int32), cfg.total_steps - cur
        )
    return record_name
