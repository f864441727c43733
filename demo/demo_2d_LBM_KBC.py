"""Double shear layer with the MRT operator.

Port of the reference `demo/demo_2d_LBM_KBC.py`, which — despite its
name — constructs the MRT collision (`demo_2d_LBM_KBC.py:76-77`,
reference quirk SURVEY §5.4). True KBC is available via
`--collision kbc` for users who want the entropic operator the file name
promises.
"""

import argparse

from demo_2d_LBM import main as shear_main

if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter, allow_abbrev=False
    )
    parser.add_argument("--res", type=int, nargs="+", default=[130, 130])
    parser.add_argument("--total_steps", type=int, default=1000)
    parser.add_argument("--dt", type=float, default=1.0)
    parser.add_argument("--dx", type=float, default=1.0)
    parser.add_argument(
        "--collision", type=str, default="mrt", choices=["mrt", "kbc"],
        help="mrt matches the reference demo's actual behaviour",
    )
    opt = vars(parser.parse_args())
    print(opt)
    shear_main(**opt)
