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


@pytest.mark.parametrize("shape", ["cylinder", "45degree"])
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
