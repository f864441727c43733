"""Doubly-periodic double shear layer, BGK collision.

CLI-compatible port of the reference `demo/demo_2d_LBM.py` (same flags,
output layout: demo_data_LBM_2d/NNN.png + 2d_LBM.mp4), running on the
framework's device-resident fori_loop scene.
"""

import argparse
import math
from typing import List

from _common import demo_path, write_video

from jrl_lbm_tpu.models import shear_layer as sl
from jrl_lbm_tpu.utils.io import mkdir, save_img


def main(
    res: List[int] = [130, 130],
    total_steps: int = 1000,
    dt: float = 1.0,
    dx: float = 1.0,
    collision: str = "bgk",
    dump_every: int = 10,
):
    cfg = sl.ShearLayerConfig(
        res=tuple(res), dt=dt, dx=dx, collision=collision,
        contact_angle=0.5 * math.pi,
    )
    state, fields = sl.init(cfg)
    run = None
    import jax

    if (
        jax.default_backend() != "cpu"
        and collision in ("bgk", "mrt", "kbc")
        and res[0] % 8 == 0
    ):
        try:
            from jrl_lbm_tpu.ops.pallas import fused_periodic as fp

            run = fp.make_fused_periodic_runner(cfg)
        except Exception as e:
            print(f"fused periodic kernel unavailable ({e}); using jnp ops")
    if run is None:
        run = sl.make_runner(cfg)

    path = demo_path()
    out_dir = f"{path}/demo_data_LBM_2d/"
    mkdir(out_dir)
    file_list = []

    step = 0
    while step < total_steps:
        n = min(dump_every, total_steps - step)
        state = run(state, fields, n)
        step += n
        vort = sl.vorticity(state, cfg)
        filename = out_dir + "{:03}.png".format(step + 1)
        save_img(vort, filename)
        file_list.append(filename)

    suffix = "" if collision == "bgk" else "_KBC"
    write_video(file_list, f"{path}/2d_LBM{suffix}.mp4")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter, allow_abbrev=False
    )
    parser.add_argument("--res", type=int, nargs="+", default=[130, 130])
    parser.add_argument("--total_steps", type=int, default=1000)
    parser.add_argument("--dt", type=float, default=1.0)
    parser.add_argument("--dx", type=float, default=1.0)
    opt = vars(parser.parse_args())
    print(opt)
    main(**opt)
