"""Sharded row-tiled fused JRL kernels vs the unfused jnp step.

`ops/pallas/fused_jrl_sharded.py` runs the tiled fused JRL kernels per
shard of a (ny, nx) mesh with ppermute y-halo pieces (and, for nx > 1,
extended-window x-neighbour edge blocks); equivalence is checked
against the plain jnp step (the same oracle the unsharded tiled tests
use) on the 8-virtual-device CPU mesh in interpret mode, with enough
steps that the tip advances a row and halo rows cross the shard
boundary (streaming pulls, post-macro collision stencils, analytic
geometry on halo rows). The 2D-mesh cases put the tip (rg = 26 of
W = 32) across the x shard boundary, and the (1, 8) approach case
splits the tip DISK (rint = 7, w = 4) across x shards so the flat
flux-form integrals cross the extension window.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jrl_lbm_tpu.models import jrl
from jrl_lbm_tpu.parallel.mesh import make_mesh


def _run_unfused_fluid(cfg, n):
    state, fields = jrl.fluid_init(cfg)
    step = jrl.make_fluid_step(cfg)
    for i in range(n):
        state = step(state, fields, jnp.asarray(i, jnp.int32))
    return state


@pytest.mark.parametrize("mesh_shape", [(2, 1), (3, 1), (2, 2)])
def test_sharded_tiled_jrl_fluid_matches_unfused(mesh_shape):
    from jrl_lbm_tpu.ops.pallas import fused_jrl_sharded as sh

    cfg = jrl.JRLFluidConfig(
        res=(48, 32), Re=4.0, vel_obs_real=0.2848,
        gravity_strength_real=-9.8, shape="45degree",
    )
    n = 12
    ref = jax.tree.map(np.asarray, _run_unfused_fluid(cfg, n))

    ny, nx = mesh_shape
    mesh = make_mesh(mesh_shape, devices=jax.devices()[: ny * nx])
    state, fields = jrl.fluid_init(cfg)
    run = sh.make_sharded_tiled_fluid_runner(cfg, mesh, tile_rows=8,
                                             unroll=4, interpret=True)
    out = run(state, fields, jnp.asarray(0, jnp.int32), n)
    out = jax.tree.map(np.asarray, out)

    for key, tol in (("f", 2e-5), ("rho", 2e-5), ("vel", 2e-4)):
        np.testing.assert_allclose(
            out[key], ref[key], rtol=tol, atol=tol, err_msg=key
        )


def test_sharded_fluid_lean_split_exact():
    """r5 sharded lean split: interior shards provably above the tip
    run the lean per-shard kernels via lax.cond. Must be EXACT vs the
    full-kernel sharded runner (the full bodies' obstacle machinery is
    identity there). (4, 1) mesh over an 80-row flat-tip grid: shard 2
    (rows 40..59) satisfies the frontier predicate, shards 0/1/3 run
    full — a shard-class boundary on both sides."""
    from jrl_lbm_tpu.ops.pallas import fused_jrl_sharded as sh

    cfg = jrl.JRLFluidConfig(
        res=(96, 32), Re=4.0, vel_obs_real=0.2848,
        gravity_strength_real=-9.8, shape="cylinder",
    )
    mesh = make_mesh((4, 1), devices=jax.devices()[:4])
    state, fields = jrl.fluid_init(cfg)
    n = 6
    outs = []
    for lean in (False, True):
        run = sh.make_sharded_tiled_fluid_runner(
            cfg, mesh, tile_rows=8, unroll=3, interpret=True,
            lean_split=lean)
        o = run(dict(state), fields, jnp.asarray(0, jnp.int32), n)
        outs.append(jax.tree.map(np.asarray, o))
    for key in ("f", "rho", "vel"):
        np.testing.assert_array_equal(outs[0][key], outs[1][key],
                                      err_msg=key)


@pytest.mark.parametrize("mesh_shape", [(2, 1), (2, 2)])
def test_sharded_tiled_c_balance_matches_unfused(mesh_shape):
    from jrl_lbm_tpu.ops.pallas import fused_jrl_sharded as sh

    cfg = jrl.JRLCConfig(res=(48, 32), Re=4.0, Pe=5.0, shape="45degree")
    state, fields, flags = jrl.c_init(cfg)
    run_ref = jrl.make_balance_runner(cfg, flags)
    ref = jax.tree.map(np.asarray, run_ref(state, fields, 12))

    ny, nx = mesh_shape
    mesh = make_mesh(mesh_shape, devices=jax.devices()[: ny * nx])
    run = sh.make_sharded_tiled_balance_runner(cfg, flags, mesh,
                                               tile_rows=8, unroll=4,
                                               interpret=True)
    out = jax.tree.map(np.asarray, run(state, fields, 12))

    np.testing.assert_allclose(out["C"], ref["C"], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out["h"], ref["h"], rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "shape,mesh_shape",
    [
        # 45degree: plain disk integrals; (2, 1) puts the whole disk in
        # shard 0
        ("45degree", (2, 1)),
        # cylinder: FLAT flux-form integrals (dC_z + dC_r); the (3, 1)
        # mesh moves the shard boundary to rows 16/32 near the tip rows
        ("cylinder", (3, 1)),
        # 2D mesh: the tip block (rg = 26) straddles the x shard
        # boundary at w = 16; extended-window mode
        ("cylinder", (2, 2)),
        # x-only mesh with w = 4: the tip DISK (rint = 7) itself spans
        # two x shards — the flat flux form's dC_r term reads C across
        # the extension window and the partial sums psum across x
        ("cylinder", (1, 8)),
        ("45degree", (2, 2)),
    ],
)
def test_sharded_tiled_c_approach_matches_unfused(shape, mesh_shape):
    from jrl_lbm_tpu.ops.pallas import fused_jrl_sharded as sh

    cfg = jrl.JRLCConfig(res=(48, 32), Re=4.0, Pe=5.0, shape=shape)
    state, fields, _flags = jrl.c_init(cfg)
    rng = np.random.default_rng(11)
    vel_field = jnp.asarray(
        rng.uniform(-0.5, 0.5, size=(4, 2, 48, 32)).astype(np.float32)
    )
    fields = dict(fields)
    fields["vel_field"] = vel_field

    run_ref = jrl.make_approach_runner(cfg)
    ref_state, ref_acc = run_ref(state, fields, jnp.asarray(0, jnp.int32),
                                 10)
    ref_state = jax.tree.map(np.asarray, ref_state)
    ref_acc = jax.tree.map(np.asarray, ref_acc)

    ny, nx = mesh_shape
    mesh = make_mesh(mesh_shape, devices=jax.devices()[: ny * nx])
    run = sh.make_sharded_tiled_approach_runner(cfg, vel_field, mesh,
                                                tile_rows=8, unroll=4,
                                                interpret=True)
    out_state, out_acc = run(state, fields, 0, 10)
    out_state = jax.tree.map(np.asarray, out_state)
    out_acc = jax.tree.map(np.asarray, out_acc)

    np.testing.assert_allclose(
        out_state["C"], ref_state["C"], rtol=2e-5, atol=2e-5
    )
    np.testing.assert_allclose(
        out_state["h"], ref_state["h"], rtol=2e-5, atol=2e-5
    )
    for key in ("inflow_sum", "current_sum", "count", "rec_u", "rec_v"):
        np.testing.assert_allclose(
            float(out_acc[key]), float(ref_acc[key]), rtol=2e-4, atol=1e-4,
            err_msg=f"{shape}:{key}",
        )
