"""Pe-sweep approach-curve overlay; port of `demo/demo_plot_Pe.py`."""

import argparse
import pathlib

from _common import demo_path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from plot_utils import find_record, read_record

viscs = {"water": 0.89e-6, "ethaline": 45.23e-3 / 1.11614e3}


def main(fluid: str = "water", is_negative: bool = True):
    posneg_prefix = "" if is_negative else "_positive"
    path = demo_path()
    prefix = "_45degree_g9" if fluid == "water" else "_ethaline_g9"
    if fluid == "water":
        Res = [1e-2, 7e-3, 5e-3, 3e-3, 1e-3, 7e-4, 5e-4, 3e-4, 1e-4, 7e-5]
    else:
        Res = [1e-4, 7e-5, 3e-5, 1e-5, 7e-6, 3e-6, 1e-6]
    Pes = [1e-3, 3e-3, 7e-3, 1e-2, 3e-2, 7e-2, 1e-1]
    colors = plt.cm.viridis(np.linspace(0, 1, len(Pes)))

    dir_path = f"{path}/{prefix}/records{posneg_prefix}/"
    norm_index = 10
    p0 = 30 if is_negative else 40

    plt.figure()
    plt.title(f"fluid = {fluid}")
    labeled = set()
    for i, Re in enumerate(Res):
        for j, Pe in enumerate(Pes):
            rec = find_record(dir_path, Re, Pe)
            if rec is None:
                continue
            xs, inflows, _, _, _ = read_record(rec)
            x = xs[:-1] / 12.5
            cur = np.flip(inflows[:-1])
            denom = np.mean(cur[p0 : p0 + norm_index])
            cur = cur / denom if denom != 0 else cur
            if j not in labeled:
                labeled.add(j)
                plt.plot(x, cur, "-", label="Pe={:.3f}".format(Pe),
                         linewidth=1, color=colors[j])
            else:
                plt.plot(x, cur, "-", linewidth=1, color=colors[j])

    plt.xlabel("D / a")
    if is_negative:
        plt.xlim(0, 6)
        plt.ylim(0, 1)
    else:
        plt.xlim(0, 9)
        plt.ylim(0.9, 2.5)
    plt.legend(loc="upper right")
    plt.savefig(str(path) + "/plot_Pe.png")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser.add_argument("--fluid", type=str, default="water")
    parser.add_argument("--is_negative", dest="is_negative", action="store_true")
    parser.add_argument("--no-is_negative", dest="is_negative", action="store_false")
    parser.set_defaults(is_negative=True)
    opt = vars(parser.parse_args())
    main(**opt)
