"""Re x Pe sweep for the approach-curve study.

Port of `demo/batch_Pe.py` with the reference's water/ethaline property
tables and Re/Pe lists. Runs in-process.
"""

import argparse

from _jrl_main import c_main, fluid_main

mus = {"water": 0.89e-3, "ethaline": 45.23e-3}
rhos = {"water": 1e3, "ethaline": 1.11614e3}
Ds = {"water": 7.85e-10, "ethaline": 0.22e-10}
viscs = {"water": 0.89e-6, "ethaline": mus["ethaline"] / rhos["ethaline"]}
shapes = {"water": "45degree", "ethaline": "ethaline"}


def main(fluid: str, is_negative: bool, res=(128, 64)):
    visc = viscs[fluid]
    shape = shapes[fluid]
    radius_obs = 12.5e-6
    if fluid == "water":
        Res = [1e-2, 7e-3, 5e-3, 3e-3, 1e-3, 7e-4, 5e-4, 3e-4, 1e-4, 7e-5]
        Pes = [1e-3, 3e-3, 7e-3, 1e-2, 3e-2, 7e-2, 1e-1]
        if not is_negative:
            Res = [3e-3, 1e-3, 7e-4]
    elif fluid == "ethaline":
        Res = [1e-4, 7e-5, 3e-5, 1e-5, 7e-6, 3e-6, 1e-6]
        Pes = [1e-3, 3e-3, 7e-3, 1e-2, 3e-2, 7e-2, 1e-1]
    else:
        raise NotImplementedError(f"Not implemented for fluid {fluid}")

    for Re in Res:
        for Pe in Pes:
            vel_obs = Re * visc / radius_obs
            print(f"Re={Re} Pe={Pe}")
            fluid_main(
                shape=shape, res=res, Re=Re, vel_obs_real=vel_obs,
                gravity_strength_real=-9.8, Rg=4, fluid=fluid,
            )
            c_main(
                shape=shape, res=res, balance_time=600, Re=Re, Pe=Pe,
                vel_obs_real=vel_obs, gravity_strength_real=-9.8, Rg=4,
                fluid=fluid, is_negative=is_negative,
            )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter, allow_abbrev=False
    )
    parser.add_argument("--fluid", type=str, default="water")
    parser.add_argument("--res", type=int, nargs="+", default=[128, 64])
    parser.add_argument("--is_negative", dest="is_negative", action="store_true")
    parser.add_argument("--no-is_negative", dest="is_negative", action="store_false")
    parser.set_defaults(is_negative=True)
    opt = vars(parser.parse_args())
    print(opt)
    main(**opt)
