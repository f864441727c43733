"""Shape/gravity validation sweep.

Port of `demo/batch_validation.py`: runs the same Re through four
obstacle/gravity configurations (45deg +- gravity, flat, infinite plane);
agreement across shapes is the validation (paper claim: shape/gravity
(in)dependence). Calls the demo mains in-process instead of the
reference's `os.system` round-trips.
"""

import argparse

from _jrl_main import c_main, fluid_main

mus = {"water": 0.89e-3, "ethaline": 45.23e-3}
rhos = {"water": 1e3, "ethaline": 1.11614e3}
Ds = {"water": 7.85e-10, "ethaline": 0.22e-10}
viscs = {"water": 0.89e-6, "ethaline": mus["ethaline"] / rhos["ethaline"]}


def main(fluid: str, is_negative: bool, Re: float = 3e-4, res=(128, 64)):
    visc = viscs[fluid]
    D = Ds[fluid]
    radius_obs = 12.5e-6
    vel_obs = Re * visc / radius_obs
    Pe = vel_obs * radius_obs / D

    configs = [
        ("45degree", -9.8),
        ("45degree", 0.0),
        ("cylinder", -9.8),
        ("infiniteplane", -9.8),
    ]
    for shape, g in configs:
        rg = 200 if shape == "infiniteplane" else 4
        fluid_main(
            shape=shape, res=res, Re=Re, vel_obs_real=vel_obs,
            gravity_strength_real=g, Rg=rg,
        )
        c_main(
            shape=shape, res=res, balance_time=600, Re=Re, Pe=Pe,
            vel_obs_real=vel_obs, gravity_strength_real=g, Rg=rg,
            is_negative=is_negative,
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter, allow_abbrev=False
    )
    parser.add_argument("--fluid", type=str, default="water")
    parser.add_argument("--Re", type=float, default=3e-4)
    parser.add_argument("--res", type=int, nargs="+", default=[128, 64])
    parser.add_argument("--is_negative", dest="is_negative", action="store_true")
    parser.add_argument("--no-is_negative", dest="is_negative", action="store_false")
    parser.set_defaults(is_negative=True)
    opt = vars(parser.parse_args())
    print(opt)
    main(**opt)
