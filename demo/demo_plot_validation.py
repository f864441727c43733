"""Overlay the simulated approach curves of the four shape/gravity cases
against experiment + Rg theory.

Port of `demo/demo_plot_validation.py`: reads the record files produced
by batch_validation.py, plateau-normalizes (`:57-62`), overlays
experiment (`experiments/100water_normalized_Pe*.txt`, tab-separated) and
theory (`NF/Rg*.txt`/`PF/Rg*.txt`) when present, and writes
plot_validation.png.
"""

import argparse
import os
import pathlib

from _common import demo_path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from plot_utils import find_record, load_approach_curve, read_two_column


def main(Re: float = 3e-4, Pe: float = 0.3401,
         experiment_file: str = "100water_normalized_Pe0.3184713376.txt",
         experiment_offset: float = -0.1, is_negative: bool = True):
    posneg_prefix = "" if is_negative else "_positive"
    path = demo_path()

    prefixs = ["_45degree_g9", "_45degree_g0", "_cylinder_g9", "_InfinitePlane_g9"]
    labels = [
        r"45$^{\circ}$, g=9.8", r"45$^{\circ}$, g=0",
        r"0$^{\circ}$, g=9.8", r"90$^{\circ}$, g=9.8",
    ]

    plt.figure()
    plt.title(f"Re={Re}")
    for label, prefix in zip(labels, prefixs):
        rec = find_record(f"{path}/{prefix}/records{posneg_prefix}/", Re, Pe)
        if rec is None:
            print(f"Case {prefix}, no Re={Re} example was found")
            continue
        xs, cur = load_approach_curve(rec, is_negative=is_negative)
        line = "--" if Pe == 0.01 else "-"
        plt.plot(xs, cur, line, label=label)

    exp_path = os.path.join(f"{path}/experiments", experiment_file)
    if os.path.exists(exp_path):
        ex, ec = read_two_column(exp_path, "\t")
        ex = ex + experiment_offset
        ec = ec / ec[60]
        plt.plot(ex, ec, "--", label="experiment")

    if is_negative:
        for Rg in (5,):
            rg_path = os.path.join(path, f"NF/Rg{Rg}.txt")
            if not os.path.exists(rg_path):
                continue
            rx, rc = read_two_column(rg_path, " ")
            rc = rc / rc[60]
            plt.plot(rx, rc, "-.", label=f"Rg {Rg}")
            plt.plot(rx, [1.0] * len(rx), ".", color="black")

    plt.xlabel("D / a")
    plt.xlim(0, 7)
    plt.ylim(0, 1.1)
    plt.legend()
    plt.savefig(str(path) + "/plot_validation.png")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter, allow_abbrev=False
    )
    parser.add_argument("--Re", type=float, default=3e-4)
    parser.add_argument("--Pe", type=float, default=0.3401)
    parser.add_argument(
        "--experiment_file", type=str,
        default="100water_normalized_Pe0.3184713376.txt",
    )
    parser.add_argument("--experiment_offset", type=float, default=-0.1)
    parser.add_argument("--is_negative", dest="is_negative", action="store_true")
    parser.add_argument("--no-is_negative", dest="is_negative", action="store_false")
    parser.set_defaults(is_negative=True)
    opt = vars(parser.parse_args())
    print(opt)
    main(**opt)
