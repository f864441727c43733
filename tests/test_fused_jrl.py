"""Fused whole-loop JRL fluid kernel vs the unfused jnp step (interpret mode).

The fused kernel recomputes the moving-tip geometry in-kernel each step;
the test runs enough steps that walks_int increments (the tip advances a
row), exercising the geometry/flags/obs_vel recompute, the sub-grid
interpolation bounce, the solid-fluid coupling with a moving wall, and
the axisymmetric BGK source.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jrl_lbm_tpu.models import jrl
from jrl_lbm_tpu.utils.types import CellType


def _run_unfused(cfg, n):
    state, fields = jrl.fluid_init(cfg)
    step = jrl.make_fluid_step(cfg)
    for i in range(n):
        state = step(state, fields, jnp.asarray(i, jnp.int32))
    return state, fields


@pytest.mark.parametrize(
    "shape", [pytest.param("cylinder", marks=pytest.mark.slow), "45degree"]
)
def test_fused_jrl_fluid_matches_unfused(shape):
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_jrl

    # Re=4 -> vel_obs ~ 0.1: walks_int increments within ~10 steps.
    # vel_obs_real consistent with Re (water: Re * 0.89e-6 / 1.25e-5) so
    # the Froude-similarity gravity stays finite.
    cfg = jrl.JRLFluidConfig(
        res=(48, 32), Re=4.0, vel_obs_real=0.2848,
        gravity_strength_real=-9.8, shape=shape,
    )
    n = 12
    ref, _ = _run_unfused(cfg, n)

    state, fields = jrl.fluid_init(cfg)
    run = fused_jrl.make_fused_fluid_runner(cfg)
    with pltpu.force_tpu_interpret_mode():
        out = run(state, fields, jnp.asarray(0, jnp.int32), n)
        out = jax.tree.map(np.asarray, out)

    # the final flags (tip at step n-1) for masking
    step = jrl.make_fluid_step(cfg)
    del step
    for key, tol in (("f", 2e-5), ("rho", 2e-5), ("vel", 2e-4)):
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(ref[key]), rtol=tol, atol=tol,
            err_msg=f"{shape}:{key}",
        )


@pytest.mark.parametrize("shape,is_negative", [("ethaline", True), ("cylinder", False)])
def test_fused_balance_matches_unfused(shape, is_negative):
    """Fused C-lattice balance kernel vs the unfused step (both tip-shape
    flag layouts: INFLOW_2 reservoirs differ between flat and wedge)."""
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_jrl

    cfg = jrl.JRLCConfig(
        res=(48, 32), Re=4.0, Pe=5.0, vel_obs_real=0.2848,
        shape=shape, is_negative=is_negative,
    )
    state, fields, flags = jrl.c_init(cfg)
    step = jrl.make_balance_step(cfg, flags)
    ref = dict(state)
    n = 10
    for _ in range(n):
        ref = step(ref, fields)

    run = fused_jrl.make_fused_balance_runner(cfg, flags)
    with pltpu.force_tpu_interpret_mode():
        out = run(dict(state), fields, n)
        out = jax.tree.map(np.asarray, out)

    for key, tol in (("h", 2e-6), ("C", 2e-6)):
        np.testing.assert_allclose(
            np.asarray(out[key]), np.asarray(ref[key]), rtol=tol, atol=tol,
            err_msg=f"{shape}:{key}",
        )


@pytest.mark.parametrize(
    "shape,is_negative,Pe",
    [
        ("ethaline", True, 3.0),   # short frame intervals: windowed picks
        ("cylinder", True, 3.0),
        ("ethaline", True, 0.05),  # long intervals: hoisted frame pair
    ],
)
def test_fused_approach_matches_unfused(shape, is_negative, Pe):
    """Fused approach kernel vs the unfused runner, spanning a stored
    velocity-frame boundary (windowed in-kernel frame picks) or a long
    constant-frame stretch (hoisted pair), with the inflow/current
    integral accumulators."""
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_jrl

    cfg = jrl.JRLCConfig(
        res=(48, 32), Re=4.0, Pe=Pe, vel_obs_real=0.2848,
        shape=shape, is_negative=is_negative,
    )
    if Pe == 3.0:
        assert 1 < 0.1 / cfg.vel_obs_conv < 6, "frame boundary must fall in n"
    else:
        assert 0.1 / cfg.vel_obs_conv >= 64, "must exercise the hoist path"
    state, fields, _flags = jrl.c_init(cfg)
    rng = np.random.default_rng(0)
    H, W = cfg.eff_res
    vel_field = (0.1 * rng.standard_normal((3, 2, H, W))).astype(np.float32)

    n = 8
    fields_ref = dict(fields)
    fields_ref["vel_field"] = jnp.asarray(vel_field)
    run_ref = jrl.make_approach_runner(cfg)
    (ref_state, ref_acc) = run_ref(
        dict(state), fields_ref, jnp.asarray(0, jnp.int32), n
    )

    run_f = fused_jrl.make_fused_approach_runner(cfg, vel_field)
    with pltpu.force_tpu_interpret_mode():
        out_state, acc = run_f(dict(state), fields, 0, n)
        out_state, acc = jax.tree.map(np.asarray, (out_state, acc))

    for key, tol in (("h", 1e-5), ("C", 1e-5)):
        np.testing.assert_allclose(
            out_state[key], np.asarray(ref_state[key]), rtol=tol, atol=tol,
            err_msg=f"{shape}:{key}",
        )
    for key in ("inflow_sum", "current_sum", "rec_u", "rec_v", "count"):
        np.testing.assert_allclose(
            float(acc[key]), float(ref_acc[key]), rtol=1e-4, atol=1e-4,
            err_msg=f"{shape}:{key}",
        )


@pytest.mark.slow
def test_fused_jrl_runner_contract():
    """Runner rejects grids over the VMEM budget; accepts chunked calls
    (start_step continuation) equivalently to one long call."""
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_jrl

    big = jrl.JRLFluidConfig(res=(1024, 512), shape="cylinder")
    assert not fused_jrl.fits_vmem(big)
    with pytest.raises(ValueError):
        fused_jrl.make_fused_fluid_runner(big)

    cfg = jrl.JRLFluidConfig(
        res=(48, 32), Re=4.0, vel_obs_real=0.2848,
        gravity_strength_real=-9.8, shape="cylinder",
    )
    state, fields = jrl.fluid_init(cfg)
    run = fused_jrl.make_fused_fluid_runner(cfg)
    with pltpu.force_tpu_interpret_mode():
        a = run(state, fields, jnp.asarray(0, jnp.int32), 8)
        b = run(state, fields, jnp.asarray(0, jnp.int32), 5)
        b = run(b, fields, jnp.asarray(5, jnp.int32), 3)
        a, b = jax.tree.map(np.asarray, (a, b))
    for key in ("f", "rho", "vel"):
        np.testing.assert_allclose(a[key], b[key], rtol=1e-6, atol=1e-7)
