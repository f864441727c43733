"""Sharded-vs-single-device equivalence on a virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jrl_lbm_tpu.models import cylinder as cyl
from jrl_lbm_tpu.ops import stream as _stream
from jrl_lbm_tpu.parallel import make_mesh, make_single_domain, pad_periodic
from jrl_lbm_tpu.parallel import padded_ops as pops
from jrl_lbm_tpu.parallel.sharded import (
    make_sharded_cylinder_runner,
    make_sharded_cylinder_step,
    shard_state,
)
from jrl_lbm_tpu.utils.types import CellType


def test_eight_devices_available():
    assert jax.device_count() == 8


def test_padded_propagate_matches_core_single_device():
    """The padded op on a periodic-padded single block == the core op."""
    rng = np.random.default_rng(0)
    H, W = 12, 10
    f = jnp.asarray(rng.uniform(0.1, 1.0, size=(9, H, W)).astype(np.float32))
    flags = rng.choice(
        [int(CellType.FLUID), int(CellType.OBSTACLE), int(CellType.OUTFLOW),
         int(CellType.INFLOW), int(CellType.INFLOW_2)],
        size=(H, W),
    ).astype(np.int32)
    flags = jnp.asarray(flags)
    phi = jnp.asarray(rng.uniform(-0.5, 1.5, size=(H, W)).astype(np.float32))
    rho = jnp.asarray(rng.uniform(0.5, 1.5, size=(H, W)).astype(np.float32))
    vel = jnp.asarray(rng.uniform(-0.05, 0.05, size=(2, H, W)).astype(np.float32))
    iv = np.array([0.01, 0.02], np.float32)

    rho_c, vel_c, f_c = _stream.propagate(
        f, flags, phi_obs=phi, rho=rho, vel=vel, inflow_vel=iv, inflow_density=0.7
    )
    dom = make_single_domain((H, W))
    rho_p, vel_p, f_p = pops.propagate_padded(
        pad_periodic(f), pad_periodic(flags), dom,
        phi_obs=phi, rho=rho, vel=vel, inflow_vel=iv, inflow_density=0.7,
    )
    # identical math, but jit-vs-eager fusion can differ in the last ulp
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_c), rtol=2e-6, atol=2e-7)
    np.testing.assert_allclose(np.asarray(rho_p), np.asarray(rho_c), rtol=2e-6, atol=2e-7)
    np.testing.assert_allclose(np.asarray(vel_p), np.asarray(vel_c), rtol=2e-6, atol=2e-7)


def test_padded_propagate_axisymmetric_matches_core():
    rng = np.random.default_rng(3)
    H, W = 12, 8
    f = jnp.asarray(rng.uniform(0.1, 1.0, size=(9, H, W)).astype(np.float32))
    flags = rng.choice(
        [int(CellType.FLUID), int(CellType.FLUID), int(CellType.OBSTACLE),
         int(CellType.OUTFLOW)],
        size=(H, W),
    ).astype(np.int32)
    flags = jnp.asarray(flags)
    phi = jnp.asarray(rng.uniform(-0.5, 1.5, size=(H, W)).astype(np.float32))

    _, _, f_c = _stream.propagate(f, flags, phi_obs=phi, axisymmetric_type=1)
    dom = make_single_domain((H, W), axisymmetric_type=1)
    _, _, f_p = pops.propagate_padded(
        pad_periodic(f), pad_periodic(flags), dom, phi_obs=phi
    )
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_c), rtol=2e-6, atol=2e-7)


def _assert_coupling_mask_nonempty(fields):
    """The scene must contain cells where the curved solid-fluid
    reconstruction fires (non-obstacle interior cell, obstacle neighbour,
    sub-grid fraction t in (0, 1]) — i.e. the cylinder is in-domain."""
    flags = np.asarray(fields["flags"])
    phi = np.asarray(fields["phi_obs"])
    is_obs = flags == int(CellType.OBSTACLE)
    t_ok = (phi > -1e-10) & (phi <= 1.0 + 1e-10)
    has_obs_nbr = np.zeros_like(is_obs)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            has_obs_nbr |= np.roll(is_obs, (-dy, -dx), axis=(0, 1))
    mask = (~is_obs) & t_ok & has_obs_nbr
    mask[-1, :] = False
    mask[:, -1] = False
    assert mask.sum() > 0, "no cell triggers the curved-boundary reconstruction"


@pytest.mark.parametrize("mesh_shape", [
    (2, 4),
    pytest.param((4, 2), marks=pytest.mark.slow),
    pytest.param((1, 8), marks=pytest.mark.slow),
])
def test_sharded_cylinder_step_matches_unsharded(mesh_shape):
    """N steps of the sharded cylinder step == the single-device step."""
    cfg = cyl.CylinderConfig(
        res=(48, 32), D=7.4, Re=500.0, cylinder_center=(16.0, 16.0)
    )
    state, fields = cyl.init(cfg)
    _assert_coupling_mask_nonempty(fields)
    run_ref = cyl.make_runner(cfg)
    ref = run_ref(state, fields, 12)

    mesh = make_mesh(mesh_shape)
    sstate, sfields = shard_state(state, fields, mesh)
    run_sh = make_sharded_cylinder_runner(cfg, mesh)
    out = run_sh(sstate, sfields, 12)

    # 12 steps of accumulated last-ulp fusion differences stay tiny
    np.testing.assert_allclose(
        np.asarray(out["f"]), np.asarray(ref["f"]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["rho"]), np.asarray(ref["rho"]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["vel"]), np.asarray(ref["vel"]), rtol=1e-4, atol=1e-6
    )


def test_sharded_step_is_actually_sharded():
    cfg = cyl.CylinderConfig(
        res=(48, 32), D=7.4, Re=500.0, cylinder_center=(16.0, 16.0)
    )
    state, fields = cyl.init(cfg)
    mesh = make_mesh((2, 4))
    sstate, sfields = shard_state(state, fields, mesh)
    step = make_sharded_cylinder_step(cfg, mesh)
    out = jax.jit(step)(sstate, sfields)
    # output stays sharded over the mesh
    shard_shapes = {s.data.shape for s in out["f"].addressable_shards}
    assert shard_shapes == {(9, 24, 8)}


@pytest.mark.parametrize("mesh_shape", [
    (2, 4),
    pytest.param((4, 2), marks=pytest.mark.slow),
])
def test_sharded_jrl_fluid_matches_unsharded(mesh_shape):
    """Sharded axisymmetric moving-tip step == single-device step."""
    from jrl_lbm_tpu.models import jrl
    from jrl_lbm_tpu.parallel.sharded import (
        make_sharded_jrl_fluid_runner,
        shard_jrl_state,
    )

    Re = 4.0
    vel_obs_real = Re * 0.89e-6 / 1.25e-5
    cfg = jrl.JRLFluidConfig(
        res=(48, 32), Re=Re, vel_obs_real=vel_obs_real,
        gravity_strength_real=0.0, shape="cylinder",
    )
    state, fields = jrl.fluid_init(cfg)
    run_ref = jrl.make_fluid_runner(cfg)
    ref = run_ref(state, fields, jnp.asarray(0, jnp.int32), 15)

    mesh = make_mesh(mesh_shape)
    sstate, sfields = shard_jrl_state(state, fields, mesh)
    run_sh = make_sharded_jrl_fluid_runner(cfg, mesh)
    out = run_sh(sstate, sfields, jnp.asarray(0, jnp.int32), 15)

    np.testing.assert_allclose(
        np.asarray(out["f"]), np.asarray(ref["f"]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["vel"]), np.asarray(ref["vel"]), rtol=1e-4, atol=1e-6
    )


@pytest.mark.parametrize("shape", ["45degree", "cylinder"])
def test_sharded_c_balance_matches_unsharded(shape):
    """Sharded concentration balance step == single-device step."""
    from jrl_lbm_tpu.models import jrl
    from jrl_lbm_tpu.parallel.sharded import (
        make_sharded_balance_runner,
        shard_c_state,
    )

    cfg = jrl.JRLCConfig(res=(48, 32), Re=4.0, Pe=5.0, shape=shape)
    state, fields, flags = jrl.c_init(cfg)
    run_ref = jrl.make_balance_runner(cfg, flags)
    ref = run_ref(state, fields, 20)

    mesh = make_mesh((2, 4))
    sstate, sfields, sflags = shard_c_state(state, fields, mesh, flags=flags)
    run_sh = make_sharded_balance_runner(cfg, mesh)
    out = run_sh(sstate, sfields, sflags, 20)

    np.testing.assert_allclose(
        np.asarray(out["C"]), np.asarray(ref["C"]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["h"]), np.asarray(ref["h"]), rtol=1e-4, atol=1e-6
    )


@pytest.mark.parametrize("mesh_shape", [
    (2, 4),
    pytest.param((4, 2), marks=pytest.mark.slow),
])
@pytest.mark.parametrize("shape", ["45degree", "cylinder"])
def test_sharded_c_approach_matches_unsharded(shape, mesh_shape):
    """Sharded approach step (+ psum disk integrals) == single-device.

    Covers both integral forms: the wedge shapes' plain disk integral
    (`C_ethaline:364-381`) and the flat shapes' flux form
    (`C_cylinder:344-358`), including the accumulated record quantities.
    """
    from jrl_lbm_tpu.models import jrl
    from jrl_lbm_tpu.parallel.sharded import (
        make_sharded_approach_runner,
        shard_c_state,
    )

    cfg = jrl.JRLCConfig(res=(48, 32), Re=4.0, Pe=5.0, shape=shape)
    state, fields, _flags = jrl.c_init(cfg)
    rng = np.random.default_rng(7)
    vel_field = jnp.asarray(
        rng.uniform(-0.5, 0.5, size=(4, 2, 48, 32)).astype(np.float32)
    )
    fields = dict(fields)
    fields["vel_field"] = vel_field

    run_ref = jrl.make_approach_runner(cfg)
    ref_state, ref_acc = run_ref(state, fields, jnp.asarray(0, jnp.int32), 15)

    mesh = make_mesh(mesh_shape)
    sstate, sfields = shard_c_state(state, fields, mesh)
    run_sh = make_sharded_approach_runner(cfg, mesh)
    out_state, out_acc = run_sh(sstate, sfields, jnp.asarray(0, jnp.int32), 15)

    np.testing.assert_allclose(
        np.asarray(out_state["C"]), np.asarray(ref_state["C"]), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_state["h"]), np.asarray(ref_state["h"]), rtol=1e-4, atol=1e-6
    )
    for k in ("inflow_sum", "current_sum", "count", "rec_u", "rec_v"):
        np.testing.assert_allclose(
            float(out_acc[k]), float(ref_acc[k]), rtol=1e-4, atol=1e-5, err_msg=k
        )


def test_sharded_fused_cylinder_matches_unsharded():
    """Fused-kernel x shard_map composition == the single-device step.

    Runs the per-shard fused Pallas kernel (interpret mode on the CPU
    mesh) with ppermute halos and compares N steps against the unsharded
    jnp step, exercising the curved reconstruction across shard borders.
    """
    from jrl_lbm_tpu.ops.pallas.fused_sharded import (
        make_sharded_fused_cylinder_runner,
    )

    cfg = cyl.CylinderConfig(
        res=(48, 32), D=7.4, Re=500.0, cylinder_center=(16.0, 16.0)
    )
    state, fields = cyl.init(cfg)
    _assert_coupling_mask_nonempty(fields)
    run_ref = cyl.make_runner(cfg)
    ref = jax.tree.map(np.asarray, run_ref(state, fields, 6))

    mesh = make_mesh((2, 4))
    sstate, sfields = shard_state(state, fields, mesh)
    run_sh = make_sharded_fused_cylinder_runner(cfg, mesh, interpret=True)
    out = run_sh(sstate, sfields, 6)

    # like tests/test_fused.py: the fused kernels skip the contact-angle
    # rho rewrite at OBSTACLE cells (dynamics-neutral: nothing reads
    # obstacle rho), so compare non-OBSTACLE cells
    flags = np.asarray(fields["flags"])
    fluid = flags != int(CellType.OBSTACLE)
    for key, tol in (("f", 2e-5), ("rho", 2e-5), ("vel", 2e-4)):
        a = np.asarray(out[key])
        b = ref[key]
        mask = fluid if a.ndim == 2 else np.broadcast_to(fluid, a.shape)
        np.testing.assert_allclose(a[mask], b[mask], rtol=tol, atol=tol, err_msg=key)


def test_sharded_fused_tiled_cylinder_matches_unsharded():
    """Row-tiled per-shard fused kernel (beyond-VMEM path, forced via
    tile_rows=8) == the single-device step: the y halo of interior tiles
    comes from 8-row-aligned neighbour blocks, the first/last tiles'
    from the cross-shard ppermute rows."""
    from jrl_lbm_tpu.ops.pallas.fused_sharded import (
        make_sharded_fused_cylinder_runner,
    )

    cfg = cyl.CylinderConfig(
        res=(48, 32), D=7.4, Re=500.0, cylinder_center=(16.0, 16.0)
    )
    state, fields = cyl.init(cfg)
    _assert_coupling_mask_nonempty(fields)
    run_ref = cyl.make_runner(cfg)
    ref = jax.tree.map(np.asarray, run_ref(state, fields, 6))

    mesh = make_mesh((2, 4))
    sstate, sfields = shard_state(state, fields, mesh)
    run_sh = make_sharded_fused_cylinder_runner(
        cfg, mesh, interpret=True, tile_rows=8
    )
    out = run_sh(sstate, sfields, 6)

    flags = np.asarray(fields["flags"])
    fluid = flags != int(CellType.OBSTACLE)
    for key, tol in (("f", 2e-5), ("rho", 2e-5), ("vel", 2e-4)):
        a = np.asarray(out[key])
        b = ref[key]
        mask = fluid if a.ndim == 2 else np.broadcast_to(fluid, a.shape)
        np.testing.assert_allclose(a[mask], b[mask], rtol=tol, atol=tol, err_msg=key)


@pytest.mark.parametrize(
    "mesh_shape,cy,k,x_ext",
    [
        # cylinder interior to shard 0 (pred-true fix with interior b0;
        # shard 1 pred-false); generic lane-patched x variant
        ((2, 4), 24.0, 1, 0),
        # same geometry on full-width shards: the x_whole lean variant
        ((2, 1), 24.0, 1, 0),
        # cylinder band straddling the shard boundary: shard 0's window
        # clamps to b0+nb==h (bottom patch), shard 1's to b0==0 (top
        # patch) — both cross-shard window paths execute
        ((2, 4), 48.0, 1, 0),
        # k=2 temporal blocking (x_whole only): 2-row ppermute halos,
        # chained lean levels, k-deep window chain; 7 steps = three
        # k-passes + one trailing k=1 step through the runner cascade
        ((2, 1), 24.0, 2, 0),
        # k=2 with the band straddling the shard boundary
        ((2, 1), 48.0, 2, 0),
        # extended-window mode: k-step temporal blocking on a 2D (nx>1)
        # mesh — x pulls ride the ppermuted neighbour edge blocks, every
        # temporal level computes width w + 2*x_ext, the central lanes
        # are sliced out (production uses x_ext=128 = one lane group;
        # tests shrink it to keep interpret-mode compile bounded)
        ((2, 4), 24.0, 2, 8),
        # ... with the band straddling the shard-row boundary (the
        # ext-block window fix executes on both row shards)
        ((2, 4), 48.0, 2, 8),
        # ext at k=1 (covers the ext window fix with no temporal chain)
        ((2, 2), 24.0, 1, 8),
        # x_halo < x_ext: only 8 lanes ride the ppermute, the received
        # block is zero-padded outward to the 16-lane alignment width
        # (production: 8 transferred vs 128 alignment)
        ((2, 4), 48.0, 2, 16),
        # k=4 is NOT testable here: interpret-mode XLA CPU compile of
        # the chained program is superlinear in k (measured 279 s at
        # k=3, >600 s at k=4). The code is uniform in k; k=4 numerics
        # are checked against the full-boundary sharded path on the
        # real chip by validation/time_sharded_1x1.py.
    ],
)
def test_sharded_fused_lean_split_matches_unsharded(mesh_shape, cy, k, x_ext):
    """Lean-interior / band-fix sharded path == the single-device step.

    The grid is sized so the lean split is eligible (the cylinder band
    region fits a shard with margin); the INFLOW/OUTFLOW rows are
    handled inside the lean kernel and are covered by every case (both
    shards own one y border each)."""
    from jrl_lbm_tpu.ops.pallas import fused_sharded as fsh

    ny, nx = mesh_shape
    W = 32 * nx
    cfg = cyl.CylinderConfig(
        res=(96, W), D=7.4, Re=500.0, cylinder_center=(W / 2.0, cy)
    )
    state, fields = cyl.init(cfg)
    _assert_coupling_mask_nonempty(fields)
    regions = fsh._fix_regions(cfg, margin=4.0 + (k - 1))
    if k == 1:
        assert regions == ([(16, 32)] if cy == 24.0 else [(40, 56)])
    n_steps = 6 if k == 1 else 7
    run_ref = cyl.make_runner(cfg)
    ref = jax.tree.map(np.asarray, run_ref(state, fields, n_steps))

    mesh = make_mesh(mesh_shape, devices=jax.devices()[: ny * nx])
    sstate, sfields = shard_state(state, fields, mesh)
    run_sh = fsh.make_sharded_fused_cylinder_runner(
        cfg, mesh, interpret=True, lean_split=True, lean_k=k,
        lean_x_ext=x_ext or None,
    )
    out = run_sh(sstate, sfields, n_steps)

    flags = np.asarray(fields["flags"])
    fluid = flags != int(CellType.OBSTACLE)
    for key, tol in (("f", 2e-5), ("rho", 2e-5), ("vel", 2e-4)):
        a = np.asarray(out[key])
        b = ref[key]
        mask = fluid if a.ndim == 2 else np.broadcast_to(fluid, a.shape)
        np.testing.assert_allclose(a[mask], b[mask], rtol=tol, atol=tol, err_msg=key)


def test_edge_cols_matches_jnp_slice():
    """`_edge_cols` (Pallas edge-lane-group read; avoids the
    transposed-whole-array copy a jnp column slice costs on TPU) ==
    plain column slices, across widths below/at/above one lane group
    and leading-dim shapes."""
    from jrl_lbm_tpu.ops.pallas.fused_sharded import _edge_cols

    rng = np.random.default_rng(3)
    for shape in [(9, 16, 32), (2, 24, 128), (1, 8, 256), (12, 64, 384)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        cl, cr = _edge_cols(x, interpret=True)
        np.testing.assert_array_equal(np.asarray(cl), np.asarray(x[..., :1]))
        np.testing.assert_array_equal(np.asarray(cr), np.asarray(x[..., -1:]))


def test_edge_blocks_matches_jnp_slice():
    """`_edge_blocks` (block-wide sibling of `_edge_cols`, feeding the
    extended-window temporal-blocking path) == plain lane-block slices
    across widths and block sizes, incl. the bw == w degenerate case."""
    from jrl_lbm_tpu.ops.pallas.fused_sharded import _edge_blocks

    rng = np.random.default_rng(7)
    for shape, bw in [
        ((9, 16, 32), 8),
        ((2, 24, 128), 128),
        ((1, 8, 256), 128),
        ((12, 64, 384), 128),
        ((9, 16, 32), 32),
    ]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        bl, br = _edge_blocks(x, bw, interpret=True)
        np.testing.assert_array_equal(np.asarray(bl), np.asarray(x[..., :bw]))
        np.testing.assert_array_equal(
            np.asarray(br), np.asarray(x[..., x.shape[-1] - bw :])
        )


def test_pad_halo_corners_and_wrap():
    """Halo values = global periodic neighbours, including corners."""
    from jrl_lbm_tpu.parallel.halo import pad_halo
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jrl_lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y

    H, W = 8, 16
    mesh = make_mesh((2, 4))
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    xs = jax.device_put(x, NamedSharding(mesh, P(AXIS_Y, AXIS_X)))

    padded = jax.jit(
        jax.shard_map(
            lambda a: pad_halo(a, AXIS_Y, AXIS_X),
            mesh=mesh,
            in_specs=P(AXIS_Y, AXIS_X),
            out_specs=P(AXIS_Y, AXIS_X),
        )
    )(xs)
    # padded is [2*(4+2), 4*(4+2)] = per-shard padded blocks concatenated
    pb = np.asarray(padded).reshape(2, 6, 4, 6).transpose(0, 2, 1, 3)
    xn = np.asarray(x)
    for by in range(2):
        for bx in range(4):
            blk = pb[by, bx]  # [6, 6] padded block
            y0, x0 = by * 4, bx * 4
            exp = xn[
                np.arange(y0 - 1, y0 + 5) % H
            ][:, np.arange(x0 - 1, x0 + 5) % W]
            np.testing.assert_array_equal(blk, exp)
