"""Re sweep over fluids (water / diluted-water / ethaline property table).

Port of `demo/batch_fluid.py` with the reference's extended property
table (water80/60/40 mixtures) and per-fluid Re lists. Runs in-process.
"""

import argparse

from _jrl_main import c_main, fluid_main

mus = {
    "water": 0.89e-3, "water80": 1.57e-3, "water60": 3.99e-3,
    "water40": 6.06e-3, "ethaline": 45.23e-3,
}
rhos = {
    "water": 1e3, "water80": 1.0239e3, "water60": 1.05329e3,
    "water40": 1.07819e3, "ethaline": 1.11614e3,
}
Ds = {
    "water": 7.85e-10, "water80": 5.64e-10, "water60": 3.33e-10,
    "water40": 1.53e-10, "ethaline": 0.22e-10,
}
viscs = {k: mus[k] / rhos[k] for k in mus}
viscs["water"] = 0.89e-6
shapes = {
    "water": "45degree", "water40": "ethaline", "water60": "ethaline",
    "water80": "ethaline", "ethaline": "ethaline",
}


def main(fluid: str, refine: int, is_negative: bool, res=(128, 64)):
    visc = viscs[fluid]
    D = Ds[fluid]
    shape = shapes[fluid]
    radius_obs = 12.5e-6
    if fluid == "water":
        Res = [1e-2, 7e-3, 5e-3, 3e-3, 1e-3, 7e-4, 5e-4, 3e-4, 1e-4, 7e-5]
        if not is_negative:
            Res = [3e-3, 1e-3, 7e-4]
    elif fluid == "ethaline":
        Res = [1e-3]
    elif fluid == "water40":
        Res = [7e-5]
    elif fluid == "water80":
        Res = [1e-2, 7e-3, 5e-3, 3e-3, 1e-3, 7e-4, 5e-4, 3e-4, 1e-4, 7e-5]
    else:
        raise NotImplementedError(f"Not implemented for fluid {fluid}")

    for Re in Res:
        vel_obs = Re * visc / radius_obs
        Pe = vel_obs * radius_obs / D
        print(Pe)
        fluid_main(
            shape=shape, res=res, Re=Re, vel_obs_real=vel_obs,
            gravity_strength_real=-9.8, Rg=4, fluid=fluid, refine=refine,
        )
        c_main(
            shape=shape, res=res, balance_time=600, Re=Re, Pe=Pe,
            vel_obs_real=vel_obs, gravity_strength_real=-9.8, Rg=4,
            fluid=fluid, refine=refine, is_negative=is_negative,
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter, allow_abbrev=False
    )
    parser.add_argument("--fluid", type=str, default="water")
    parser.add_argument("--refine", type=int, default=1)
    parser.add_argument("--res", type=int, nargs="+", default=[128, 64])
    parser.add_argument("--is_negative", dest="is_negative", action="store_true")
    parser.add_argument("--no-is_negative", dest="is_negative", action="store_false")
    parser.set_defaults(is_negative=True)
    opt = vars(parser.parse_args())
    print(opt)
    main(**opt)
