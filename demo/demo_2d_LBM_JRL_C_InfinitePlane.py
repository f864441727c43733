"""JRL concentration phase — infinite-plane (90-degree) tip.

CLI-compatible port of the reference `demo/demo_2d_LBM_JRL_C_InfinitePlane.py`.
"""

import argparse

from _jrl_main import c_main

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter, allow_abbrev=False
    )
    parser.add_argument("--res", type=int, nargs="+", default=[128, 64])
    parser.add_argument("--balance_time", type=float, default=6000)
    parser.add_argument("--Re", type=float, default=1e-4)
    parser.add_argument("--Pe", type=float, default=0.01)
    parser.add_argument("--vel_obs_real", type=float, default=21e-6)
    parser.add_argument("--gravity_strength_real", type=float, default=-9.8)
    parser.add_argument("--Rg", type=float, default=200)

    parser.add_argument("--is_negative", dest="is_negative", action="store_true")
    parser.add_argument("--no-is_negative", dest="is_negative", action="store_false")
    parser.set_defaults(is_negative=True)
    opt = vars(parser.parse_args())
    print(opt)
    c_main(shape="infiniteplane", **opt)
