"""Revolve 2D (r, z) fields into a 3D volume and export pbrt smoke +
marching-cubes OBJ of the tip.

Port of `demo/demo_dump_smoke_render.py`: reads the per-record Tecplot
.dat files of a JRL run, revolves the axisymmetric half-plane around the
axis by bilinear sampling in (r, y) space (the reference uses
`F.grid_sample`, `demo_dump_smoke_render.py:59-97`; here
`jax.scipy.ndimage.map_coordinates`), and writes render/render_i.pbrt +
geom_i.obj.
"""

import argparse
import os
import pathlib

import numpy as np

from _common import demo_path

from jrl_lbm_tpu.utils.io import (
    dump_smoke_pbrt,
    export_asset,
    mkdir,
    read_2d_plt_file_C_rho,
)


def _revolve(field_2d: np.ndarray) -> np.ndarray:
    """Revolve a [H, W2] half-plane field about the r=0 axis -> [D, H, W]
    with D = W = 2*W2, matching the reference's sampling geometry."""
    from scipy.ndimage import map_coordinates

    H, W2 = field_2d.shape
    D = W = 2 * W2
    z, y, x = np.meshgrid(
        np.arange(D), np.arange(H), np.arange(W), indexing="ij"
    )
    # radius in the (x, z) plane from the domain axis
    r = np.sqrt((x - W // 2) ** 2 + (z - D // 2) ** 2)
    # map to 2D sample coordinates: row = y, col = r (clamped)
    rows = y.astype(np.float64)
    cols = np.clip(r, 0, W2 - 1)
    return map_coordinates(
        field_2d, [rows.ravel(), cols.ravel()], order=1, mode="nearest"
    ).reshape(D, H, W)


def main(case_name: str):
    path = demo_path()
    dir_path = os.path.join(path, case_name)
    dat_files = [f for f in os.listdir(dir_path) if f.endswith(".dat")]
    dat_numbers = sorted(int(f[:-4]) for f in dat_files)
    dat_files = ["{:03}.dat".format(nb) for nb in dat_numbers]

    save_dir = os.path.join(dir_path, "render")
    mkdir(save_dir)
    try:
        import mcubes
    except ImportError:
        mcubes = None
        print("mcubes unavailable; skipping OBJ export")

    from tqdm import tqdm

    for i, fn in enumerate(tqdm(dat_files)):
        np_C, np_phi, _, _ = read_2d_plt_file_C_rho(os.path.join(dir_path, fn))
        C2 = np.flip(np_C[0, 0], axis=-2).copy()
        phi2 = np.flip(np_phi[0, 0], axis=-2).copy()
        C2[phi2 < 0] = 1.0  # tip reads as far-away...
        C2 = 1.0 - C2  # ...then invert: 1 = tip plume, 0 = far away

        C3 = _revolve(C2)
        phi3 = _revolve(phi2)

        dump_smoke_pbrt(os.path.join(save_dir, f"render_{i}.pbrt"), C3)

        if mcubes is not None:
            verts, faces = mcubes.marching_cubes(-phi3, 0)
            verts = verts / max(C3.shape)
            export_asset(
                os.path.join(save_dir, f"geom_{i}.obj"),
                verts,
                np.asarray(faces, np.int64),
            )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(allow_abbrev=False)
    parser.add_argument(
        "--case_name",
        type=str,
        default="_45degree_g9/demo_data_LBM_2d_res64_Re0.0003_Pe3401",
    )
    opt = vars(parser.parse_args())
    main(**opt)
