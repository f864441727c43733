"""Approach curves of a Re sweep (inflow integral) vs experiment + theory.

Port of `demo/demo_plot_water.py`: reads the record files of the chosen
fluid's Re list, plots the INFLOW column (column 1) plateau-normalized,
overlays experiment/theory files when present, writes
plot_{fluid}{posneg}.png.
"""

import argparse
import os
import pathlib

from _common import demo_path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from plot_utils import find_record, read_record, read_two_column

mus = {"water": 0.89e-3, "water40": 6.06e-3, "ethaline": 45.23e-3}
rhos = {"water": 1e3, "water40": 1.07819e3, "ethaline": 1.11614e3}
Ds = {"water": 7.85e-10, "water40": 1.53e-10, "ethaline": 0.22e-10}
viscs = {
    "water": 0.89e-6,
    "water40": mus["water40"] / rhos["water40"],
    "ethaline": mus["ethaline"] / rhos["ethaline"],
}


def main(fluid: str = "water", is_negative: bool = True):
    posneg_prefix = "" if is_negative else "_positive"
    path = demo_path()
    visc = viscs[fluid]
    radius_obs = 12.5e-6
    D = Ds[fluid]

    prefix = "_45degree_g9" if fluid == "water" else f"_{fluid}_g9"
    experiment_file = "100water_normalized_Pe0.3184713376.txt"
    experiment_vel = "21 um/s"
    Res = [1e-2, 7e-3, 5e-3, 1e-3, 7e-4, 5e-4, 3e-4, 1e-4, 7e-5]
    if not is_negative:
        prefix = "_ppp_g9"
        experiment_file = "100water_normalized_Pe0.0079617834.txt"
        experiment_vel = "0.5 um/s"
    if fluid == "ethaline":
        Res = [1e-4]
        experiment_file = "0water_normalized_Pe11.3636363636.txt"
        experiment_vel = "30 um/s"
    elif fluid == "water40":
        Res = [1e-4]
        experiment_file = "0water_normalized_Pe11.3636363636.txt"
        experiment_vel = "30 um/s"

    dir_path = f"{path}/{prefix}/records{posneg_prefix}/"
    norm_index = 10
    p0 = 35 if is_negative else 40

    plt.figure()
    plt.title(f"fluid = {fluid}")
    for Re in Res:
        vel_obs = Re * visc / radius_obs
        Pe = vel_obs * radius_obs / D
        rec = find_record(dir_path, Re, Pe)
        if rec is None:
            print(f"Case {prefix}, no Re={Re}, Pe={Pe} example was found")
            continue
        xs, inflows, _, _, _ = read_record(rec)
        x = xs[:-1] / 12.5
        cur = np.flip(inflows[:-1])
        denom = np.mean(cur[p0 : p0 + norm_index])
        cur = cur / denom if denom != 0 else cur
        line = "--" if Pe == 0.01 else "-"
        plt.plot(x, cur, line, label="vel={:.2f}um/s".format(vel_obs * 1e6), linewidth=2)
        plt.scatter(x, cur, s=5)

    exp_path = os.path.join(f"{path}/experiments{posneg_prefix}", experiment_file)
    if os.path.exists(exp_path):
        ex, ec = read_two_column(exp_path, "\t")
        ec = ec / ec[60]
        plt.plot(ex, ec, "--", label=f"experiment ({experiment_vel})")

    for Rg in (5,):
        theoretical_dir = "NF" if is_negative else "PF"
        rg_path = os.path.join(path, f"{theoretical_dir}/Rg{Rg}.txt")
        if not os.path.exists(rg_path):
            continue
        rx, rc = read_two_column(rg_path, " ")
        rc = rc / rc[60]
        plt.plot(rx, rc, "-.", label=f"Rg {Rg}")
        if is_negative:
            plt.plot(rx, [1.0] * len(rx), ".", color="black")

    plt.xlabel("D / a")
    if is_negative:
        plt.xlim(0, 6)
        plt.ylim(0, 2)
    else:
        plt.xlim(0, 9)
        plt.ylim(0.9, 2.5)
    plt.legend(loc="upper right")
    plt.savefig(str(path) + f"/plot_{fluid}{posneg_prefix}.png")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser.add_argument("--fluid", type=str, default="water")
    parser.add_argument("--is_negative", dest="is_negative", action="store_true")
    parser.add_argument("--no-is_negative", dest="is_negative", action="store_false")
    parser.set_defaults(is_negative=True)
    opt = vars(parser.parse_args())
    main(**opt)
