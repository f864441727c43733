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


@pytest.mark.parametrize("shape", ["cylinder", "45degree"])
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
