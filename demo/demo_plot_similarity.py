"""Similarity overlay of two cases with matched Pe from different fluids.

Port of `demo/demo_plot_similarity.py`: overlays the inflow approach
curves of two record files (defaults follow the reference's
water-positive vs water40-negative pairing) after plateau normalization.
"""

import argparse
import os
import pathlib

from _common import demo_path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from plot_utils import read_record


def main(records=None, labels=None, p0: int = 50, norm_index: int = 10):
    path = demo_path()
    if records is None:
        records = [
            "_45degree_g9/records_positive/record_res64_Re7e-05_Pe793.txt",
            "_water40_g9/records/record_res128_Re7e-05_Pe25714.txt",
        ]
    if labels is None:
        labels = ["water + pos + low vel", r"$60\%$ET + neg + high vel"]

    plt.figure()
    for rec, label in zip(records, labels):
        full = os.path.join(path, rec)
        if not os.path.exists(full):
            print(f"missing record {rec}")
            continue
        xs, inflows, _, _, _ = read_record(full)
        x = xs[:-1] / 12.5
        cur = np.flip(inflows[:-1])
        denom = np.mean(cur[p0 : p0 + norm_index])
        cur = cur / denom if denom != 0 else cur
        plt.plot(x, cur, "-", label=label, linewidth=2)

    plt.xlabel("D / a")
    plt.legend(loc="upper right")
    plt.savefig(str(path) + "/plot_similarity.png")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser.add_argument("--records", type=str, nargs="+", default=None)
    parser.add_argument("--labels", type=str, nargs="+", default=None)
    opt = vars(parser.parse_args())
    main(**opt)
