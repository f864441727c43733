"""Flow past a cylinder in a channel (inflow/outflow + MRT + coupling).

CLI-compatible port of the reference `demo/demo_2d_LBM_cylinder.py`
(same flags and outputs: PNG frames every 1000 steps, a final Tecplot
.plt of staggered velocity, 2d_LBM_cylinder.mp4). Uses the fused Pallas
step on TPU (`--no-fused` to force the unfused jnp ops).
"""

import argparse
from typing import List

import jax

from _common import demo_path, write_video

from jrl_lbm_tpu.models import cylinder as cyl
from jrl_lbm_tpu.ops.macro import get_vort
from jrl_lbm_tpu.utils.grid import get_staggered
from jrl_lbm_tpu.utils.io import dump_2d_plt_file_single, mkdir, save_img


def main(
    res: List[int] = [800, 400],
    total_steps: int = 50000,
    dt: float = 1.0,
    dx: float = 1.0,
    D: float = 20.0,
    fused: bool = True,
):
    cfg = cyl.CylinderConfig(res=tuple(res), dt=dt, dx=dx, D=D)
    print("Re = {}, tau = {}".format(cfg.Re, cfg.tau))
    state, fields = cyl.init(cfg)

    run = None
    if fused and jax.default_backend() != "cpu":
        try:
            from jrl_lbm_tpu.ops.pallas import fused_step as fs

            run = fs.make_fused_cylinder_runner(cfg)
        except Exception as e:
            print(f"fused path unavailable ({e}); falling back to jnp ops")
    if run is None:
        run = cyl.make_runner(cfg)

    path = demo_path()
    out_dir = f"{path}/demo_data_LBM_cylinder_2d/"
    mkdir(out_dir)
    file_list = []

    dump_every = 1000
    step = 0
    while step < total_steps:
        n = min(dump_every, total_steps - step)
        state = run(state, fields, n)
        step += n
        vort = get_vort(state["vel"], dx=dx)
        filename = out_dir + "{:03}.png".format(step + 1)
        save_img(vort, filename)
        file_list.append(filename)

    vel_mac = get_staggered(state["vel"])
    dump_2d_plt_file_single(
        out_dir + "{:03}.plt".format(step + 1),
        state["rho"],
        vel_mac[0],
        vel_mac[1],
    )
    write_video(file_list, f"{path}/2d_LBM_cylinder.mp4")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter, allow_abbrev=False
    )
    parser.add_argument("--res", type=int, nargs="+", default=[800, 400])
    parser.add_argument("--total_steps", type=int, default=50000)
    parser.add_argument("--dt", type=float, default=1.0)
    parser.add_argument("--dx", type=float, default=1.0)
    parser.add_argument(
        "--D", type=float, default=20.0,
        help="cylinder diameter in cells (center stays at (10D, 10D))")
    parser.add_argument("--no-fused", dest="fused", action="store_false")
    parser.set_defaults(fused=True)
    opt = vars(parser.parse_args())
    print(opt)
    main(**opt)
