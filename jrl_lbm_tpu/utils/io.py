"""I/O: normalized PNG dumps, Tecplot ASCII .dat/.plt, HDF5 checkpoints,
pbrt smoke volumes, OBJ mesh export.

Port of `src/LBM/utils/io.py` with the same file formats (the plot
scripts parse the record/Tecplot files by whitespace, so the writers stay
line-compatible). Arrays are the framework's batch-free [H, W] /
[C, H, W] convention; an optional leading batch axis is accepted for
reference-code compatibility (B/C select as in the reference writers).

Line-format compatibility is tested against `read_*` round-trips in
tests/test_io.py.
"""

from __future__ import annotations

import os

import numpy as np


def _np2d(a, B=0, C=0):
    """Accept [H,W], [C,H,W] or [B,C,H,W]; return [H,W] numpy."""
    a = np.asarray(a)
    if a.ndim == 4:
        return a[B, C]
    if a.ndim == 3:
        return a[C]
    return a


def tensor2numpy_2d_(img) -> np.ndarray:
    """Normalize to [0,255]; port of `io.py:12-20` ([H,W] -> [H,W,1])."""
    img = np.asarray(img, dtype=np.float64)
    if img.ndim == 4:  # reference layout [B,C,H,W]
        img = np.transpose(img[0], (1, 2, 0))
    elif img.ndim == 2:
        img = img[..., None]
    mn, mx = img.min(), img.max()
    rng = mx - mn if mx > mn else 1.0
    return (img - mn) / rng * 255.0


def save_img(tensor_input, filename: str):
    """Normalized, y-flipped PNG; port of `io.py:23-29`."""
    import cv2

    np_img = tensor2numpy_2d_(tensor_input).astype(np.uint8)
    cv2.imwrite(filename, cv2.flip(np_img, 0))


def mkdir(path: str):
    if not os.path.exists(path):
        os.makedirs(path)


# ---------------------------------------------------------------------------
# Tecplot ASCII
# ---------------------------------------------------------------------------

def _stagger_to_center(np_u, np_v, ref_shape):
    # keep float32: the writers format values as numpy scalars, and the
    # reference's tensors are f32 (a float64 cast would change the text)
    np_u = np.asarray(np_u, dtype=np.float32)
    np_v = np.asarray(np_v, dtype=np.float32)
    if np_u.shape[-1] == ref_shape[-1] + 1:
        np_u = 0.5 * (np_u[..., 1:] + np_u[..., :-1])
    if np_v.shape[-2] == ref_shape[-2] + 1:
        np_v = 0.5 * (np_v[..., 1:, :] + np_v[..., :-1, :])
    return np_u, np_v


def dump_2d_plt_file_single(filename, np_density, np_u, np_v, B=0, C=0):
    """Port of `io.py:336-352` ('X Y RHO U V' zone)."""
    rho = _np2d(np_density, B, C).astype(np.float32)
    H, W = rho.shape
    u = np.asarray(np_u, dtype=np.float32)
    v = np.asarray(np_v, dtype=np.float32)
    u = 0.5 * (u[..., 1:] + u[..., :-1])
    v = 0.5 * (v[..., 1:, :] + v[..., :-1, :])
    u = _np2d(u, B, C)
    v = _np2d(v, B, C)
    from jrl_lbm_tpu.utils import native_io

    if native_io.write_single(str(filename), rho, u, v):
        return
    with open(filename, "w") as fo:
        fo.write('TITLE ="Magnetic internal force"\n')
        fo.write('VARIABLES = "X" "Y" "RHO" "U" "V" \n')
        fo.write("ZONE I={}, J={}\n".format(W, H))
        fo.write("F=POINT\n")
        for j in range(H):
            for i in range(W):
                fo.write(
                    "{} {} {} {} {}\n".format(i, j, rho[j, i], u[j, i], v[j, i])
                )


def dump_2d_plt_file_C_rho(filename, np_C, np_density, np_u, np_v, B=0, C=0):
    """Port of `io.py:308-333` ('X Y C RHO U V NormX NormY' zone)."""
    c_f = _np2d(np_C, B, C).astype(np.float32)
    rho = _np2d(np_density, B, C).astype(np.float32)
    H, W = rho.shape
    u, v = _stagger_to_center(np_u, np_v, rho.shape)
    u = _np2d(u, B, C)
    v = _np2d(v, B, C)
    from jrl_lbm_tpu.utils import native_io

    if native_io.write_c_rho(str(filename), c_f, rho, u, v):
        return
    with open(filename, "w") as fo:
        fo.write('TITLE ="Magnetic internal force"\n')
        fo.write('VARIABLES = "X" "Y" "C" "RHO" "U" "V" "NormX" "NormY"\n')
        fo.write("ZONE I={}, J={}\n".format(W, H))
        fo.write("F=POINT\n")
        for j in range(H):
            for i in range(W):
                fo.write(
                    "{} {} {} {} {} {} {} {}\n".format(
                        i, j, c_f[j, i], rho[j, i], u[j, i], v[j, i],
                        i / 12.5, j / 12.5,
                    )
                )


def read_2d_plt_file_C_rho(filename):
    """Port of `io.py:281-305`; returns [np_C, np_density, np_u, np_v]
    with the reference's [1,1,H,W] shape."""
    from jrl_lbm_tpu.utils import native_io

    native = native_io.read_c_rho(str(filename))
    if native is not None:
        return native
    with open(filename) as fo:
        fo.readline()
        fo.readline()
        line = fo.readline()
        i1 = line.find("I=")
        i2 = line.find(", J=")
        W = int(line[i1 + 2 : i2])
        H = int(line[i2 + 4 : -1])
        fo.readline()
        np_C = np.zeros((1, 1, H, W), np.float32)
        np_density = np.zeros((1, 1, H, W), np.float32)
        np_u = np.zeros((1, 1, H, W), np.float32)
        np_v = np.zeros((1, 1, H, W), np.float32)
        for j in range(H):
            for i in range(W):
                parts = fo.readline().rstrip("\n").split(" ")
                np_C[0, 0, j, i] = float(parts[2])
                np_density[0, 0, j, i] = float(parts[3])
                np_u[0, 0, j, i] = float(parts[4])
                np_v[0, 0, j, i] = float(parts[5])
    return [np_C, np_density, np_u, np_v]


def dump_2d_plt_file_balance(filename, np_C, np_vel, np_h, B=0):
    """Port of `io.py:222-251` ('X Y C U V F0..F8' zone).

    Note: the reference writer reads vel channels 1 and 2 of a
    [B,3,H,W]-shaped array (`io.py:238-239`); here vel is [2,H,W] (or the
    reference layout) and channels 0/1 are written, which is what the
    matching reader (`read_2d_plt_file_balance`) restores.
    """
    c_f = _np2d(np_C, B, 0)
    H, W = c_f.shape
    vel = np.asarray(np_vel, dtype=np.float64)
    if vel.ndim == 4:
        vel = vel[B]
    h = np.asarray(np_h, dtype=np.float64)
    if h.ndim == 4:
        h = h[B]
    with open(filename, "w") as fo:
        fo.write('TITLE ="Magnetic internal force"\n')
        fo.write(
            'VARIABLES = "X" "Y" "C" "U" "V" "F0" "F1" "F2" "F3" "F4" "F5" "F6" "F7" "F8"\n'
        )
        fo.write("ZONE I={}, J={}\n".format(W, H))
        fo.write("F=POINT\n")
        for j in range(H):
            for i in range(W):
                vals = [i, j, c_f[j, i], vel[0, j, i], vel[1, j, i]] + [
                    h[q, j, i] for q in range(9)
                ]
                fo.write(" ".join(str(x) for x in vals) + "\n")


def read_2d_plt_file_balance(filename, np_C, np_vel, np_h, B=0):
    """Port of `io.py:254-278`; fills the provided arrays in place."""
    H, W = np_C.shape[-2:]
    with open(filename) as fo:
        for _ in range(4):
            fo.readline()
        for j in range(H):
            for i in range(W):
                parts = fo.readline().split(" ")
                np_C[..., j, i] = float(parts[2])
                np_vel[..., 0, j, i] = float(parts[3])
                np_vel[..., 1, j, i] = float(parts[4])
                for q in range(9):
                    np_h[..., q, j, i] = float(parts[5 + q])
    return [np_C, np_vel, np_h]


# ---------------------------------------------------------------------------
# HDF5 checkpoint contract (Re_*.h5 / C_balance*.h5)
# ---------------------------------------------------------------------------

def save_fluid_h5(filename: str, vel_field: np.ndarray):
    """Write the fluid-phase artifact: dataset 'vel' = [N, 2, H, W]
    normalized velocity history (`fluid_cylinder:266-268`)."""
    import h5py

    with h5py.File(filename, "w") as h5:
        h5.create_dataset("vel", data=np.asarray(vel_field))


def load_fluid_h5(filename: str) -> np.ndarray:
    import h5py

    with h5py.File(filename, "r") as h5:
        return np.asarray(h5["vel"])


def save_balance_h5(filename: str, C: np.ndarray, h: np.ndarray):
    """Write the C balance checkpoint: datasets 'C', 'h'
    (`C_ethaline:264-267`)."""
    import h5py

    with h5py.File(filename, "w") as h5:
        h5.create_dataset("C", data=np.asarray(C))
        h5.create_dataset("h", data=np.asarray(h))


def load_balance_h5(filename: str):
    import h5py

    with h5py.File(filename, "r") as h5:
        return np.asarray(h5["C"]), np.asarray(h5["h"])


# ---------------------------------------------------------------------------
# pbrt / OBJ export
# ---------------------------------------------------------------------------

def dump_smoke_pbrt(filename: str, density, B: int = 0, C: int = 0):
    """Heterogeneous-smoke pbrt volume; port of `io.py:355-374`."""
    d = np.asarray(density)
    if d.ndim == 5:
        d = d[B, C]
    elif d.ndim == 4:
        d = d[C]
    D, H, W = d.shape
    with open(filename, "w") as fo:
        fo.write('MakeNamedMedium "smoke"\n')
        fo.write(f'        "integer nx" [ {W} ] \n')
        fo.write(f'        "integer ny" [ {H} ] \n')
        fo.write(f'        "integer nz" [ {D} ] \n')
        scale = 1.0 / max(D, H, W)
        fo.write(
            f' "point p0" [ 0.0 0.0 0.0 ] "point p1" [{W * scale} {H * scale} {D * scale} ] \n'
        )
        fo.write('        "float density" [')
        for k in range(D):
            for j in range(H):
                for i in range(W):
                    fo.write(" {:.5f}".format(d[k, j, i]))
        fo.write(' ]\n        "string type" [ "heterogeneous" ] \n')


def export_asset(save_path: str, vertices, faces):
    """OBJ export; port of `io.py:202-219`."""
    np_faces = np.asarray(faces).reshape(-1, 3).astype(np.int64)
    np_vertices = np.asarray(vertices).reshape(-1, 3)
    if np_faces.min() == 0:
        np_faces = np_faces + 1
    with open(save_path, "w") as f:
        f.write("# OBJ file\n")
        for vtx in np_vertices:
            f.write("v {} {} {}\n".format(vtx[0], vtx[1], vtx[2]))
        for fc in np_faces:
            f.write("f {} {} {}\n".format(fc[0], fc[1], fc[2]))


def export_cylinder(save_path: str, floor_center, ceil_center, radius: float):
    """Cylinder mesh OBJ; port of `io.py:37-94`."""
    import math

    floor_center = np.asarray(floor_center, dtype=np.float64).reshape(3)
    ceil_center = np.asarray(ceil_center, dtype=np.float64).reshape(3)
    n_circle, n_z = 40, 5
    z_axis = (ceil_center - floor_center) / np.linalg.norm(ceil_center - floor_center)
    y_axis = np.array([1.0, 2.0, 5.0])
    x_axis = np.cross(y_axis, z_axis)
    x_axis /= np.linalg.norm(x_axis)
    y_axis = np.cross(z_axis, x_axis)
    y_axis /= np.linalg.norm(y_axis)
    dh = np.linalg.norm(ceil_center - floor_center) / (n_z - 1.0)

    verts = np.zeros((n_circle * n_z + 2, 3))
    for i in range(n_z):
        layer = floor_center + (i * dh) * z_axis
        for j in range(n_circle):
            phi = j / n_circle * 2.0 * math.pi
            verts[i * n_circle + j] = (
                radius * math.cos(phi) * x_axis + radius * math.sin(phi) * y_axis + layer
            )
    verts[n_circle * n_z] = floor_center
    verts[n_circle * n_z + 1] = ceil_center

    faces = []
    for j in range(n_circle):
        faces.append([n_circle * n_z, (j + 1) % n_circle, j])
    for j in range(n_circle):
        faces.append(
            [n_circle * n_z + 1, j + n_circle * (n_z - 1), (j + 1) % n_circle + n_circle * (n_z - 1)]
        )
    for i in range(n_z - 1):
        for j in range(n_circle):
            jp = (j + 1) % n_circle
            faces.append([i * n_circle + j, i * n_circle + jp, (i + 1) * n_circle + j])
            faces.append([i * n_circle + jp, (i + 1) * n_circle + jp, (i + 1) * n_circle + j])
    export_asset(save_path, verts, np.asarray(faces, np.int64))


def export_box(save_path: str, res, width: float = 0.01):
    """Wireframe box mesh (12 edge beams) OBJ; port of `io.py:97-199`."""
    dtype = np.float64
    res = list(res)
    aabb = np.array([[0, 0, 0], [res[0], res[1], res[2]]], dtype=dtype)
    aabb = (aabb - np.array([res], dtype=dtype) / 2.0) * (2.0 / max(res))

    corners = {}
    for ix, xl in enumerate("xX"):
        for iy, yl in enumerate("yY"):
            for iz, zl in enumerate("zZ"):
                corners[xl + yl + zl] = np.array(
                    [aabb[ix, 0], aabb[iy, 1], aabb[iz, 2]], dtype=dtype
                )

    def add_box(p0, p1, verts, faces):
        eps = 0.01
        d = np.linalg.norm(p1 - p0)
        n = (p1 - p0) / d
        if n.sum() < 0.0:
            p0, p1 = p1, p0
            n = -n
        if abs(n[0]) >= eps:
            t, b = np.array([0.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0])
        elif abs(n[1]) >= eps:
            t, b = np.array([0.0, 0.0, 1.0]), np.array([1.0, 0.0, 0.0])
        else:
            t, b = np.array([1.0, 0.0, 0.0]), np.array([0.0, 1.0, 0.0])
        p0 = p0 - width * t - width * b
        p1 = p1 + width * t + width * b
        x_, y_, z_ = p0
        X_, Y_, Z_ = p1
        nv = np.array(
            [
                [x_, y_, z_], [X_, y_, z_], [X_, Y_, z_], [x_, Y_, z_],
                [x_, y_, Z_], [X_, y_, Z_], [X_, Y_, Z_], [x_, Y_, Z_],
            ],
            dtype=dtype,
        )
        nf = np.array(
            [
                [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
                [0, 1, 5], [0, 5, 4], [1, 2, 6], [1, 6, 5],
                [2, 3, 7], [2, 7, 4], [3, 0, 4], [3, 4, 7],
            ],
            dtype=np.int64,
        )
        off = verts.shape[0]
        return np.concatenate([verts, nv]), np.concatenate([faces, nf + off])

    edges = [
        ("xyz", "Xyz"), ("Xyz", "XYz"), ("xYz", "XYz"), ("xyz", "xYz"),
        ("xyZ", "XyZ"), ("XyZ", "XYZ"), ("xYZ", "XYZ"), ("xyZ", "xYZ"),
        ("xyz", "xyZ"), ("Xyz", "XyZ"), ("xYz", "xYZ"), ("XYz", "XYZ"),
    ]
    verts = np.zeros((0, 3), dtype)
    faces = np.zeros((0, 3), np.int64)
    for a, b in edges:
        verts, faces = add_box(corners[a], corners[b], verts, faces)
    export_asset(save_path, verts, faces)
