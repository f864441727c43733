"""IO round-trips and the JRL demo pipeline end-to-end (tiny, CPU)."""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "demo"))

from jrl_lbm_tpu.utils.io import (
    dump_2d_plt_file_C_rho,
    load_balance_h5,
    load_fluid_h5,
    read_2d_plt_file_C_rho,
    save_balance_h5,
    save_fluid_h5,
    save_img,
    export_asset,
    dump_smoke_pbrt,
)


def test_plt_C_rho_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    H, W = 6, 5
    C = rng.uniform(size=(H, W)).astype(np.float32)
    rho = rng.uniform(size=(H, W)).astype(np.float32)
    u = rng.uniform(size=(H, W)).astype(np.float32)
    v = rng.uniform(size=(H, W)).astype(np.float32)
    fn = str(tmp_path / "test.dat")
    dump_2d_plt_file_C_rho(fn, C, rho, u, v)
    C2, rho2, u2, v2 = read_2d_plt_file_C_rho(fn)
    np.testing.assert_allclose(C2[0, 0], C, rtol=1e-6)
    np.testing.assert_allclose(rho2[0, 0], rho, rtol=1e-6)
    np.testing.assert_allclose(u2[0, 0], u, rtol=1e-6)
    np.testing.assert_allclose(v2[0, 0], v, rtol=1e-6)


def test_plt_header_format(tmp_path):
    """The plot scripts parse by whitespace; header lines must match the
    reference byte-for-byte (`io.py:311-314`)."""
    fn = str(tmp_path / "h.dat")
    z = np.zeros((2, 2), np.float32)
    dump_2d_plt_file_C_rho(fn, z, z, z, z)
    lines = open(fn).read().splitlines()
    assert lines[0] == 'TITLE ="Magnetic internal force"'
    assert lines[1] == 'VARIABLES = "X" "Y" "C" "RHO" "U" "V" "NormX" "NormY"'
    assert lines[2] == "ZONE I=2, J=2"
    assert lines[3] == "F=POINT"


def test_h5_contracts(tmp_path):
    vel = np.random.default_rng(1).normal(size=(3, 2, 4, 4)).astype(np.float32)
    fn = str(tmp_path / "Re_1.h5")
    save_fluid_h5(fn, vel)
    np.testing.assert_array_equal(load_fluid_h5(fn), vel)
    import h5py

    with h5py.File(fn) as h5:  # dataset name contract
        assert "vel" in h5

    C = np.ones((4, 4), np.float32)
    h = np.ones((9, 4, 4), np.float32)
    fn2 = str(tmp_path / "C_balance.h5")
    save_balance_h5(fn2, C, h)
    C2, h2 = load_balance_h5(fn2)
    np.testing.assert_array_equal(C2, C)
    np.testing.assert_array_equal(h2, h)


def test_save_img_and_obj_pbrt(tmp_path):
    save_img(np.random.default_rng(2).uniform(size=(8, 8)), str(tmp_path / "x.png"))
    assert (tmp_path / "x.png").exists()
    export_asset(
        str(tmp_path / "m.obj"),
        np.zeros((3, 3)),
        np.array([[0, 1, 2]]),
    )
    content = open(tmp_path / "m.obj").read()
    assert content.startswith("# OBJ file")
    assert "f 1 2 3" in content
    dump_smoke_pbrt(str(tmp_path / "s.pbrt"), np.zeros((2, 2, 2), np.float32))
    assert '"integer nx" [ 2 ]' in open(tmp_path / "s.pbrt").read()


@pytest.mark.slow
def test_jrl_demo_pipeline_end_to_end(tmp_path):
    """Fluid CLI -> Re h5 -> C CLI -> balance h5 + record file, tiny run."""
    env = dict(os.environ)
    env["JRL_DEMO_OUT"] = str(tmp_path)
    env["JAX_PLATFORMS"] = ""  # subprocess picks its own platform
    env.setdefault("XLA_FLAGS", "")

    Re = 4.0
    vel_obs_real = Re * 0.89e-6 / 1.25e-5
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['x','--res','48','32','--Re',%r,"
        "'--vel_obs_real',%r,'--gravity_strength_real','0'];"
        "exec(open(%r).read())"
    )
    fluid_script = str(REPO / "demo" / "demo_2d_LBM_JRL_fluid_cylinder.py")
    r = subprocess.run(
        [sys.executable, "-c", code % (str(Re), str(vel_obs_real), fluid_script)],
        env=env, cwd=str(REPO / "demo"), capture_output=True, text=True,
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    h5s = list(tmp_path.glob("_g0/Re_*.h5"))
    assert len(h5s) == 1
    vel = load_fluid_h5(str(h5s[0]))
    assert vel.ndim == 4 and vel.shape[1] == 2

    c_script = str(REPO / "demo" / "demo_2d_LBM_JRL_C_cylinder.py")
    code_c = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv=['x','--res','48','32','--Re',%r,'--Pe','5.0',"
        "'--vel_obs_real',%r,'--gravity_strength_real','0',"
        "'--balance_time','0.5'];"
        "exec(open(%r).read())"
    )
    r = subprocess.run(
        [sys.executable, "-c", code_c % (str(Re), str(vel_obs_real), c_script)],
        env=env, cwd=str(REPO / "demo"), capture_output=True, text=True,
        timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert list(tmp_path.glob("_cylinder_g0/C_balance.h5"))
    recs = list(tmp_path.glob("_cylinder_g0/records/record_*.txt"))
    assert len(recs) == 1
    lines = open(recs[0]).read().splitlines()
    assert lines[0] == "Step Inflow Current u, v"
    assert len(lines) > 3
    vals = [float(x) for x in lines[2].split(" ")]
    assert len(vals) == 5
    assert np.isfinite(vals).all()


def test_export_box(tmp_path):
    from jrl_lbm_tpu.utils.io import export_box

    fn = str(tmp_path / "box.obj")
    export_box(fn, [8, 8, 8])
    content = open(fn).read()
    # 12 edge beams x 8 vertices each
    assert content.count("\nv ") + content.startswith("v ") == 96 or \
        content.count("v ") >= 96
    assert content.count("f ") == 12 * 12


def test_grid_dot_helpers():
    import numpy as np
    import jax.numpy as jnp
    from jrl_lbm_tpu import lattice
    from jrl_lbm_tpu.utils.grid import dot, dot_e_vel, dot_vel_vel

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(2, 4, 5)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(2, 4, 5)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(dot(2, a, b)), np.asarray((a * b).sum(0)), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(dot_vel_vel(a, b, keep_dim=True)).shape, (1, 4, 5)
    )
    e = jnp.asarray(lattice.E, jnp.float32)
    ev = dot_e_vel(e, a)
    assert ev.shape == (9, 4, 5)
    np.testing.assert_allclose(
        np.asarray(ev[1]), np.asarray(a[0]), rtol=1e-6
    )  # e_1 = (1, 0)


def test_geq_and_eos():
    import numpy as np
    import jax.numpy as jnp
    from jrl_lbm_tpu.ops.equilibrium import equation_of_states, feq, geq

    rng = np.random.default_rng(1)
    rho = jnp.asarray(rng.uniform(0.1, 0.25, (4, 4)).astype(np.float32))
    density = rho * 1.1
    vel = jnp.zeros((2, 4, 4), jnp.float32)
    p = equation_of_states(density)
    g = geq(rho, density, vel, p)
    # zeroth moment identity: sum_q geq = p - cs2 d + cs2 d / rho * rho = p
    np.testing.assert_allclose(
        np.asarray(g.sum(0)), np.asarray(p), rtol=1e-4, atol=1e-6
    )
