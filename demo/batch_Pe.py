"""Re x Pe sweep for the approach-curve study.

Port of `demo/batch_Pe.py` with the reference's water/ethaline property
tables and Re/Pe lists (`/root/reference/demo/batch_Pe.py:9-52`). Runs
in-process on the fused TPU kernels instead of the reference's
`os.system` per-case subprocess loop.

`--skip_existing` makes the sweep resumable: a case whose record file is
already on disk is skipped (the same skip-if-exists contract the
reference applies to the fluid h5 and balance h5 artifacts, extended to
the records so an interrupted production run restarts where it stopped).
"""

import argparse
import os
import time

from _common import demo_path
from _jrl_main import _c_prefix, c_main, fluid_main

mus = {"water": 0.89e-3, "ethaline": 45.23e-3}
rhos = {"water": 1e3, "ethaline": 1.11614e3}
Ds = {"water": 7.85e-10, "ethaline": 0.22e-10}
viscs = {"water": 0.89e-6, "ethaline": mus["ethaline"] / rhos["ethaline"]}
shapes = {"water": "45degree", "ethaline": "ethaline"}


def record_file(fluid, shape, res, Re, Pe, is_negative, g_real=-9.8):
    """Record path for a case (must mirror `_jrl_main.c_main`)."""
    positive_fix = "" if is_negative else "_positive"
    prefix = _c_prefix(shape, fluid, g_real)
    eff_min = min(res)
    return (
        f"{demo_path()}/{prefix}/records{positive_fix}/"
        f"record_res{eff_min}_Re{Re}_Pe{int(Pe * 10000)}.txt"
    )


def run_re_vmapped(fluid, shape, res, Re, Pes, is_negative, vel_obs,
                   progress=True, balance_time=600, Rg=4, g_real=-9.8):
    """One Re row with its remaining Pe lanes vmapped on device.

    Replaces the reference's per-(Re, Pe) `os.system` loop
    (`/root/reference/demo/batch_Pe.py:40-52`) with ONE device program
    per Re: the first missing Pe runs through the serial `c_main` (which
    also produces the shared C_balance h5 and that lane's PNG/Tecplot
    dumps), then the remaining lanes run simultaneously as vmapped lanes
    of `parallel.sweep.pe_sweep_approach` — each lane differs only in
    two traced scalars (vel_obs_conv, tau_D) and its trip count. The
    vmapped lanes emit record files only; the per-dump media of the
    serial path is per-case scratch the plot layer never reads.
    """
    import jax.numpy as jnp
    import numpy as np
    from jrl_lbm_tpu.models import jrl
    from jrl_lbm_tpu.parallel import sweep
    from jrl_lbm_tpu.utils.io import load_balance_h5, load_fluid_h5

    from _jrl_main import _fluid_prefix

    missing = [
        Pe for Pe in Pes
        if not os.path.exists(
            record_file(fluid, shape, tuple(res), Re, Pe, is_negative,
                        g_real=g_real))
    ]
    if not missing:
        return 0

    fluid_main(shape=shape, res=res, Re=Re, vel_obs_real=vel_obs,
               gravity_strength_real=g_real, Rg=Rg, fluid=fluid,
               progress=progress)

    # first lane serial: seeds/loads the shared balance h5 (and writes
    # the reference's per-dump media for one representative case)
    c_main(shape=shape, res=res, balance_time=balance_time, Re=Re,
           Pe=missing[0], vel_obs_real=vel_obs, gravity_strength_real=g_real,
           Rg=Rg, fluid=fluid, is_negative=is_negative, progress=progress)
    rest = missing[1:]
    if not rest:
        return 1

    path = demo_path()
    positive_fix = "" if is_negative else "_positive"
    prefix = _c_prefix(shape, fluid, g_real)
    cfg_base = jrl.JRLCConfig(
        res=tuple(res), balance_time=balance_time, Re=Re, Pe=rest[0],
        vel_obs_real=vel_obs, gravity_strength_real=g_real, Rg=Rg,
        shape=shape, is_negative=is_negative,
    )
    _, fields, _ = jrl.c_init(cfg_base)
    C_np, h_np = load_balance_h5(
        f"{path}/{prefix}/C_balance{positive_fix}.h5")
    L = len(rest)
    states = {
        "C": jnp.asarray(np.broadcast_to(C_np, (L,) + C_np.shape)),
        "h": jnp.asarray(np.broadcast_to(h_np, (L,) + h_np.shape)),
    }
    re_name = Re if (shape != "ethaline" or Re > 3e-5) else 3e-5
    fluid_prefix = _fluid_prefix(shape, fluid, g_real)
    fields = dict(fields)
    fields["vel_field"] = jnp.asarray(
        load_fluid_h5(f"{path}/{fluid_prefix}/Re_{re_name}.h5"))

    result = sweep.pe_sweep_approach(cfg_base, rest, states, fields)
    sweep.write_sweep_records(
        result, cfg_base, f"{path}/{prefix}/records{positive_fix}", Re)
    return len(missing)


def main(fluid: str, is_negative: bool, res=(128, 64), skip_existing=False,
         progress=True, vmap_pe=False):
    visc = viscs[fluid]
    shape = shapes[fluid]
    radius_obs = 12.5e-6
    if fluid == "water":
        Res = [1e-2, 7e-3, 5e-3, 3e-3, 1e-3, 7e-4, 5e-4, 3e-4, 1e-4, 7e-5]
        Pes = [1e-3, 3e-3, 7e-3, 1e-2, 3e-2, 7e-2, 1e-1]
        if not is_negative:
            Res = [3e-3, 1e-3, 7e-4]
    elif fluid == "ethaline":
        Res = [1e-4, 7e-5, 3e-5, 1e-5, 7e-6, 3e-6, 1e-6]
        Pes = [1e-3, 3e-3, 7e-3, 1e-2, 3e-2, 7e-2, 1e-1]
    else:
        raise NotImplementedError(f"Not implemented for fluid {fluid}")

    t_sweep = time.time()
    n_done = 0
    n_total = len(Res) * len(Pes)
    if vmap_pe:
        for Re in Res:
            vel_obs = Re * visc / radius_obs
            t_row = time.time()
            n = run_re_vmapped(fluid, shape, res, Re, Pes, is_negative,
                               vel_obs, progress=progress)
            n_done += n
            print(f"[batch_Pe] Re={Re}: {n} lanes in "
                  f"{time.time() - t_row:.0f}s ({n_done} new, "
                  f"total {time.time() - t_sweep:.0f}s)", flush=True)
        print(f"[batch_Pe] vmapped sweep complete: {n_done} new cases, "
              f"{time.time() - t_sweep:.0f}s wall", flush=True)
        return
    for Re in Res:
        for Pe in Pes:
            vel_obs = Re * visc / radius_obs
            t_case = time.time()
            rec = record_file(fluid, shape, tuple(res), Re, Pe, is_negative)
            if skip_existing and os.path.exists(rec):
                n_done += 1
                print(f"[batch_Pe] skip existing Re={Re} Pe={Pe} "
                      f"({n_done}/{n_total})", flush=True)
                continue
            print(f"[batch_Pe] Re={Re} Pe={Pe} ({n_done + 1}/{n_total}, "
                  f"t={time.time() - t_sweep:.0f}s)", flush=True)
            fluid_main(
                shape=shape, res=res, Re=Re, vel_obs_real=vel_obs,
                gravity_strength_real=-9.8, Rg=4, fluid=fluid,
                progress=progress,
            )
            c_main(
                shape=shape, res=res, balance_time=600, Re=Re, Pe=Pe,
                vel_obs_real=vel_obs, gravity_strength_real=-9.8, Rg=4,
                fluid=fluid, is_negative=is_negative, progress=progress,
            )
            n_done += 1
            print(f"[batch_Pe] done Re={Re} Pe={Pe} in "
                  f"{time.time() - t_case:.0f}s "
                  f"({n_done}/{n_total}, total {time.time() - t_sweep:.0f}s)",
                  flush=True)
    print(f"[batch_Pe] sweep complete: {n_done}/{n_total} cases, "
          f"{time.time() - t_sweep:.0f}s wall", flush=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter, allow_abbrev=False
    )
    parser.add_argument("--fluid", type=str, default="water")
    parser.add_argument("--res", type=int, nargs="+", default=[128, 64])
    parser.add_argument("--is_negative", dest="is_negative", action="store_true")
    parser.add_argument("--no-is_negative", dest="is_negative", action="store_false")
    parser.add_argument("--skip_existing", action="store_true")
    parser.add_argument("--vmap_pe", action="store_true",
                        help="run each Re row's Pe lanes as one vmapped "
                             "device program (implies skip_existing)")
    parser.add_argument("--no-progress", dest="progress", action="store_false")
    parser.set_defaults(is_negative=True, progress=True)
    opt = vars(parser.parse_args())
    print(opt)
    main(**opt)
