"""Rewrite the .dat files of a run directory in place.

Port of `demo/demo_plt_rewrite.py` (a maintenance script that re-reads
and re-writes each Tecplot file, normalizing the format).
"""

import argparse
import os

from tqdm import tqdm

from _common import demo_path  # noqa: F401  (installs the repo sys.path)
from jrl_lbm_tpu.utils.io import dump_2d_plt_file_C_rho, read_2d_plt_file_C_rho


def main(data_path: str):
    if not os.path.isabs(data_path):
        data_path = os.path.join(demo_path(), data_path)
    files = [f for f in os.listdir(data_path) if f.endswith(".dat")]
    print(files)
    for fn in tqdm(files):
        fp = os.path.join(data_path, fn)
        np_C, np_density, np_u, np_v = read_2d_plt_file_C_rho(fp)
        dump_2d_plt_file_C_rho(fp, np_C, np_density, np_u, np_v, B=0, C=0)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser.add_argument(
        "--data_path",
        type=str,
        default="_InfinitePlane_g9/demo_data_LBM_2d_res64_Re0.0003_Pe3401",
    )
    opt = vars(parser.parse_args())
    main(**opt)
