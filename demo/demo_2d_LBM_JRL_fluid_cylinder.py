"""JRL fluid phase — flat (0-degree) tip.

CLI-compatible port of the reference `demo/demo_2d_LBM_JRL_fluid_cylinder.py`.
"""

import argparse

from _jrl_main import fluid_main

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter, allow_abbrev=False
    )
    parser.add_argument("--res", type=int, nargs="+", default=[128, 64])
    parser.add_argument("--Re", type=float, default=1e-4)
    parser.add_argument("--vel_obs_real", type=float, default=28e-6)
    parser.add_argument("--gravity_strength_real", type=float, default=-9.8)
    parser.add_argument("--Rg", type=float, default=4)

    opt = vars(parser.parse_args())
    print(opt)
    fluid_main(shape="cylinder", **opt)
