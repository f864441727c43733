"""JRL fluid phase — ethaline (45-degree, refined) tip.

CLI-compatible port of the reference `demo/demo_2d_LBM_JRL_fluid_ethaline.py`.
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
    parser.add_argument("--fluid", type=str, default="ethaline")
    parser.add_argument("--refine", type=int, default=1)
    opt = vars(parser.parse_args())
    print(opt)
    fluid_main(shape="ethaline", **opt)
