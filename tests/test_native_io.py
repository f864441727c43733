"""Native C++ Tecplot IO: byte-parity with the Python writers + speed."""

import time

import numpy as np
import pytest

from jrl_lbm_tpu.utils import io as uio
from jrl_lbm_tpu.utils import native_io


@pytest.fixture(scope="module")
def lib():
    lib = native_io.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _python_write_c_rho(filename, C, rho, u, v):
    """The pure-Python writer body (native path bypassed)."""
    H, W = rho.shape
    with open(filename, "w") as fo:
        fo.write('TITLE ="Magnetic internal force"\n')
        fo.write('VARIABLES = "X" "Y" "C" "RHO" "U" "V" "NormX" "NormY"\n')
        fo.write("ZONE I={}, J={}\n".format(W, H))
        fo.write("F=POINT\n")
        for j in range(H):
            for i in range(W):
                fo.write(
                    "{} {} {} {} {} {} {} {}\n".format(
                        i, j, C[j, i], rho[j, i], u[j, i], v[j, i],
                        i / 12.5, j / 12.5,
                    )
                )


def test_native_matches_python_bytes(lib, tmp_path):
    rng = np.random.default_rng(0)
    H, W = 13, 9
    C = rng.normal(size=(H, W)).astype(np.float32)
    rho = rng.uniform(0.1, 3.0, size=(H, W)).astype(np.float32)
    u = (rng.normal(size=(H, W)) * 1e-3).astype(np.float32)
    v = np.zeros((H, W), np.float32)
    v[0, 0] = 1.0
    v[1, 1] = -2.5e-7

    f_py = str(tmp_path / "py.dat")
    f_c = str(tmp_path / "c.dat")
    _python_write_c_rho(f_py, C, rho, u, v)
    assert native_io.write_c_rho(f_c, C, rho, u, v)
    assert open(f_py).read() == open(f_c).read()


def test_native_reader_roundtrip(lib, tmp_path):
    rng = np.random.default_rng(1)
    H, W = 8, 6
    C = rng.uniform(size=(H, W)).astype(np.float32)
    rho = rng.uniform(size=(H, W)).astype(np.float32)
    u = rng.normal(size=(H, W)).astype(np.float32)
    v = rng.normal(size=(H, W)).astype(np.float32)
    fn = str(tmp_path / "r.dat")
    assert native_io.write_c_rho(fn, C, rho, u, v)
    C2, rho2, u2, v2 = uio.read_2d_plt_file_C_rho(fn)
    np.testing.assert_array_equal(C2[0, 0], C)
    np.testing.assert_array_equal(rho2[0, 0], rho)
    np.testing.assert_array_equal(u2[0, 0], u)
    np.testing.assert_array_equal(v2[0, 0], v)


def test_native_writer_is_faster(lib, tmp_path):
    rng = np.random.default_rng(2)
    H, W = 400, 200
    C = rng.uniform(size=(H, W)).astype(np.float32)
    rho = rng.uniform(size=(H, W)).astype(np.float32)
    u = rng.normal(size=(H, W)).astype(np.float32)
    v = rng.normal(size=(H, W)).astype(np.float32)

    t0 = time.perf_counter()
    _python_write_c_rho(str(tmp_path / "p.dat"), C, rho, u, v)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    assert native_io.write_c_rho(str(tmp_path / "n.dat"), C, rho, u, v)
    t_c = time.perf_counter() - t0
    assert t_c < t_py, (t_c, t_py)
    print(f"python {t_py*1e3:.1f} ms vs native {t_c*1e3:.1f} ms")


def test_io_module_dispatches_to_native(lib, tmp_path):
    """dump_2d_plt_file_C_rho goes through the native path and stays
    read-compatible."""
    rng = np.random.default_rng(3)
    H, W = 7, 5
    C = rng.uniform(size=(H, W)).astype(np.float32)
    rho = rng.uniform(size=(H, W)).astype(np.float32)
    u = rng.normal(size=(H, W)).astype(np.float32)
    v = rng.normal(size=(H, W)).astype(np.float32)
    fn = str(tmp_path / "d.dat")
    uio.dump_2d_plt_file_C_rho(fn, C, rho, u, v)
    C2, rho2, u2, v2 = uio.read_2d_plt_file_C_rho(fn)
    np.testing.assert_allclose(C2[0, 0], C, rtol=1e-6)
    np.testing.assert_allclose(u2[0, 0], u, rtol=1e-6)
