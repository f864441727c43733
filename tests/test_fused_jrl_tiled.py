"""Row-tiled fused JRL fluid kernels vs the unfused jnp step (interpret).

The tiled pair (stream/SFC/macro kernel + axisymmetric-BGK kernel,
`ops/pallas/fused_jrl_tiled.py`) exists for grids beyond the
whole-domain VMEM budget (refine >= 8); equivalence is checked at a
small grid where the jnp path is cheap, with enough steps that the tip
advances a row (geometry recompute across tile boundaries, halo-row
analytic flags, OUTFLOW copies in edge tiles).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jrl_lbm_tpu.models import jrl


def _run_unfused(cfg, n):
    state, fields = jrl.fluid_init(cfg)
    step = jrl.make_fluid_step(cfg)
    for i in range(n):
        state = step(state, fields, jnp.asarray(i, jnp.int32))
    return state


@pytest.mark.parametrize(
    "shape", [pytest.param("cylinder", marks=pytest.mark.slow), "45degree"]
)
def test_tiled_jrl_fluid_matches_unfused(shape):
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled as tiled

    cfg = jrl.JRLFluidConfig(
        res=(48, 32), Re=4.0, vel_obs_real=0.2848,
        gravity_strength_real=-9.8, shape=shape,
    )
    n = 12
    ref = jax.tree.map(np.asarray, _run_unfused(cfg, n))

    state, fields = jrl.fluid_init(cfg)
    run = tiled.make_tiled_fluid_runner(cfg, tile_rows=8, unroll=4)
    with pltpu.force_tpu_interpret_mode():
        out = run(state, fields, jnp.asarray(0, jnp.int32), n)
        out = jax.tree.map(np.asarray, out)

    for key, tol in (("f", 2e-5), ("rho", 2e-5), ("vel", 2e-4)):
        np.testing.assert_allclose(
            out[key], ref[key], rtol=tol, atol=tol, err_msg=f"{shape}:{key}"
        )


@pytest.mark.parametrize(
    "shape,k,n",
    [
        # default tier: one chunk compile only (n == k; the remainder
        # path is the already-tested _tiled_chunk) — interpret-mode
        # compiles of the k-pyramid dominate this test's cost
        ("45degree", 2, 2),
        # slow tier: n spans a tip-row advance and is NOT a multiple of
        # k, so the k-chunk re-specialization + remainder paths run too
        pytest.param("cylinder", 4, 11, marks=pytest.mark.slow),
        pytest.param("45degree", 4, 11, marks=pytest.mark.slow),
    ],
)
def test_kblocked_jrl_fluid_matches_unfused(shape, k, n):
    """Temporally-blocked fluid kernel (k steps per pallas call,
    +-2k-row halos, shrinking A/B level pyramid) vs the unfused jnp
    step."""
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled as tiled

    cfg = jrl.JRLFluidConfig(
        res=(48, 32), Re=4.0, vel_obs_real=0.2848,
        gravity_strength_real=-9.8, shape=shape,
    )
    ref = jax.tree.map(np.asarray, _run_unfused(cfg, n))

    state, fields = jrl.fluid_init(cfg)
    run = tiled.make_tiled_fluid_runner(cfg, tile_rows=8, unroll=2, k=k)
    with pltpu.force_tpu_interpret_mode():
        out = run(state, fields, jnp.asarray(0, jnp.int32), n)
        out = jax.tree.map(np.asarray, out)

    for key, tol in (("f", 2e-5), ("rho", 2e-5), ("vel", 2e-4)):
        np.testing.assert_allclose(
            out[key], ref[key], rtol=tol, atol=tol, err_msg=f"{shape}:{key}"
        )


@pytest.mark.parametrize(
    "shape,k",
    [
        ("45degree", 1),
        ("cylinder", 1),
        pytest.param("45degree", 2, marks=pytest.mark.slow),
        pytest.param("cylinder", 2, marks=pytest.mark.slow),
    ],
)
def test_lean_split_chunk_exact(shape, k):
    """The lean/full split chunk (interior tiles on the lean kernels +
    output aliasing, r5) must be EXACT vs the unsplit k-kernel chunk:
    the full bodies' obstacle machinery reduces to identity selects on
    tiles the frontier proves obstacle-free, so lean and full disagree
    by nothing (not even summation order). Compared chunk-vs-chunk
    within the k-kernel family (the A/B-pair chunk differs from it by
    XLA:CPU fma contraction at the last ulp; the runner-level parity vs
    the unfused step is test_tiled_jrl_fluid_matches_unfused)."""
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled as tiled

    # 80 rows / TH=8 = 10 tiles: both shapes' frontiers (inflow_h 40.5
    # wedge / 20.5 flat) leave >= 1 lean tile
    cfg = jrl.JRLFluidConfig(
        res=(80, 32), Re=4.0, vel_obs_real=0.2848,
        gravity_strength_real=-9.8, shape=shape,
    )
    state, fields = jrl.fluid_init(cfg)
    cfg_key = tuple(sorted(tiled._cfg_consts(cfg).items()))
    f, rho, vel = state["f"], state["rho"], state["vel"]
    reps = 2
    walks_end = cfg.inflow_height + reps * k * cfg.vel_obs
    fr = (int(walks_end + 0.5) + 2 * k + 2) // 8
    assert fr <= 10 - 3, "config must leave lean tiles"
    with pltpu.force_tpu_interpret_mode():
        base = tiled._fluid_k_chunk(f, rho, vel, 0.0, cfg_key, 8, k, reps)
        split = tiled._fluid_k_split_chunk(
            f, rho, vel, 0.0, cfg_key, 8, k, reps, fr)
    for name, a, b in zip(("f", "rho", "vel"), base, split):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=f"{shape}:{name}")


@pytest.mark.parametrize(
    "k", [1, pytest.param(2, marks=pytest.mark.slow)]
)
def test_below_tip_split_chunk_exact(k):
    """The FLAT below-tip tile class (r5): tiles fully under the tip
    run `_fluid_a_bt`/`_fluid_b_bt` (lane-static geometry). Both the
    3-way split (full + bt + lean) and the late-travel bt-only split
    must be EXACT vs the unsplit k-kernel chunk. start_step is chosen
    so the tip sits mid-grid: bt tiles 1..3, lean tiles fr+1..8."""
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled as tiled

    cfg = jrl.JRLFluidConfig(
        res=(80, 32), Re=4.0, vel_obs_real=0.2848,
        gravity_strength_real=-9.8, shape="cylinder",
    )
    state, fields = jrl.fluid_init(cfg)
    cfg_key = tuple(sorted(tiled._cfg_consts(cfg).items()))
    f, rho, vel = state["f"], state["rho"], state["vel"]
    v = cfg.vel_obs
    reps = 2
    s0 = int((40.0 - cfg.inflow_height) / v)
    wi = int(cfg.inflow_height + s0 * v + 0.5)
    fb = max(0, (wi - 2 * k - 2) // 8 - 1)
    fr = (int(cfg.inflow_height + (s0 + reps * k) * v + 0.5)
          + 2 * k + 2) // 8
    assert fb >= 1 and fr <= 7, (fb, fr)
    with pltpu.force_tpu_interpret_mode():
        base = tiled._fluid_k_chunk(f, rho, vel, float(s0), cfg_key, 8,
                                    k, reps)
        split = tiled._fluid_k_split_chunk(
            f, rho, vel, float(s0), cfg_key, 8, k, reps, fr, fb)
        btonly = tiled._fluid_k_split_chunk(
            f, rho, vel, float(s0), cfg_key, 8, k, reps, 8, fb)
    for name, o in (("3way", split), ("btonly", btonly)):
        for arr_name, a, b in zip(("f", "rho", "vel"), base, o):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{name}:{arr_name}")


@pytest.mark.parametrize(
    "shape", ["45degree", pytest.param("cylinder", marks=pytest.mark.slow)]
)
def test_tiled_c_balance_matches_unfused(shape):
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled as tiled

    cfg = jrl.JRLCConfig(res=(48, 32), Re=4.0, Pe=5.0, shape=shape)
    state, fields, flags = jrl.c_init(cfg)
    run_ref = jrl.make_balance_runner(cfg, flags)
    ref = jax.tree.map(np.asarray, run_ref(state, fields, 12))

    run = tiled.make_tiled_balance_runner(cfg, flags, tile_rows=8, unroll=4)
    with pltpu.force_tpu_interpret_mode():
        out = jax.tree.map(np.asarray, run(state, fields, 12))

    np.testing.assert_allclose(out["C"], ref["C"], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out["h"], ref["h"], rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "shape", ["45degree", pytest.param("cylinder", marks=pytest.mark.slow)]
)
def test_tiled_c_approach_matches_unfused(shape):
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled as tiled

    cfg = jrl.JRLCConfig(res=(48, 32), Re=4.0, Pe=5.0, shape=shape)
    state, fields, _flags = jrl.c_init(cfg)
    rng = np.random.default_rng(11)
    vel_field = jnp.asarray(
        rng.uniform(-0.5, 0.5, size=(4, 2, 48, 32)).astype(np.float32)
    )
    fields = dict(fields)
    fields["vel_field"] = vel_field

    run_ref = jrl.make_approach_runner(cfg)
    ref_state, ref_acc = run_ref(state, fields, jnp.asarray(0, jnp.int32), 10)
    ref_state = jax.tree.map(np.asarray, ref_state)
    ref_acc = jax.tree.map(np.asarray, ref_acc)

    run = tiled.make_tiled_approach_runner(cfg, vel_field, tile_rows=8,
                                           unroll=4)
    with pltpu.force_tpu_interpret_mode():
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


def test_tiled_c_approach_disk_row_on_tile_row0():
    """FLAT flux-form integrals when the disk row lands on a tile-local
    row 0 (regression: the old in-kernel ``Cm1 = roll(C, 1, axis=0)``
    wrapped WITHIN the tile there, corrupting dC_z whenever the moving
    tip head crossed a multiple of TH — every 8 rows of travel at TH=8).

    cylinder at Pe=5 has vel_obs_conv = 0.1, so walks_int = 21 +
    floor(s/10): steps 30..39 put the inflow disk row at 24 = tile 3's
    row 0. Start from the step-25 unfused state and accumulate steps
    25..34 on both paths.
    """
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled as tiled

    cfg = jrl.JRLCConfig(res=(48, 32), Re=4.0, Pe=5.0, shape="cylinder")
    assert abs(cfg.vel_obs_conv - 0.1) < 1e-12
    state, fields, _flags = jrl.c_init(cfg)
    rng = np.random.default_rng(7)
    vel_field = jnp.asarray(
        rng.uniform(-0.5, 0.5, size=(4, 2, 48, 32)).astype(np.float32)
    )
    fields = dict(fields)
    fields["vel_field"] = vel_field

    run_ref = jrl.make_approach_runner(cfg)
    state25, _ = run_ref(state, fields, jnp.asarray(0, jnp.int32), 25)
    ref_state, ref_acc = run_ref(state25, fields, jnp.asarray(25, jnp.int32),
                                 10)
    ref_state = jax.tree.map(np.asarray, ref_state)
    ref_acc = jax.tree.map(np.asarray, ref_acc)

    run = tiled.make_tiled_approach_runner(cfg, vel_field, tile_rows=8,
                                           unroll=4)
    with pltpu.force_tpu_interpret_mode():
        out_state, out_acc = run(jax.tree.map(np.asarray, state25), fields,
                                 25, 10)
        out_state = jax.tree.map(np.asarray, out_state)
        out_acc = jax.tree.map(np.asarray, out_acc)

    np.testing.assert_allclose(
        out_state["C"], ref_state["C"], rtol=2e-5, atol=2e-5
    )
    for key in ("inflow_sum", "current_sum", "count", "rec_u", "rec_v"):
        np.testing.assert_allclose(
            float(out_acc[key]), float(ref_acc[key]), rtol=2e-4, atol=1e-4,
            err_msg=key,
        )
