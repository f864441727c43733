"""Fused Pallas step vs the unfused jnp step (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jrl_lbm_tpu.models import cylinder as cyl
from jrl_lbm_tpu.utils.types import CellType


def _compare(cfg, n_steps, tile_rows, split):
    from jrl_lbm_tpu.ops.pallas import fused_step as fs

    state, fields = cyl.init(cfg)
    ref = cyl.make_runner(cfg)(state, fields, n_steps)

    step = fs.make_fused_step(cfg, tile_rows=tile_rows, split=split)
    out = dict(state)
    for _ in range(n_steps):
        out = step(out, fields)

    flags = np.asarray(fields["flags"])
    fluid = flags != int(CellType.OBSTACLE)
    for key, tol in (("f", 2e-5), ("rho", 2e-5), ("vel", 2e-4)):
        a = np.asarray(out[key])
        b = np.asarray(ref[key])
        mask = fluid if a.ndim == 2 else np.broadcast_to(fluid, a.shape)
        np.testing.assert_allclose(a[mask], b[mask], rtol=tol, atol=tol)


@pytest.mark.parametrize(
    "tile_rows", [8, pytest.param(16, marks=pytest.mark.slow)]
)
def test_fused_generic_matches_unfused_interpret(tile_rows):
    from jax.experimental.pallas import tpu as pltpu

    cfg = cyl.CylinderConfig(res=(64, 32), D=8.0, Re=500.0, cylinder_center=(16.0, 32.0))
    with pltpu.force_tpu_interpret_mode():
        _compare(cfg, n_steps=5, tile_rows=tile_rows, split=False)


@pytest.mark.parametrize(
    "res,center,interior_rows",
    [
        ((96, 32), (16.0, 48.0), 16),   # T=16 interior tiles, BT=8 band
        pytest.param(  # T=32 with 8-row halo blocks
            (256, 32), (16.0, 128.0), 32, marks=pytest.mark.slow
        ),
    ],
)
def test_fused_split_matches_unfused_interpret(res, center, interior_rows):
    """Interior/band two-call specialization must agree with the jnp step."""
    from jax.experimental.pallas import tpu as pltpu
    from jrl_lbm_tpu.ops.pallas import fused_step as fs

    cfg = cyl.CylinderConfig(res=res, D=8.0, Re=500.0, cylinder_center=center)
    n, b0, b1 = fs._band_tiles(cfg, interior_rows)
    assert 1 <= b0 and b1 <= n - 2 and n - ((b1 - b0 + 1) + 2) > 0, (
        "test geometry must exercise the split"
    )
    with pltpu.force_tpu_interpret_mode():
        _compare(cfg, n_steps=5, tile_rows=8, split=True)


@pytest.mark.parametrize(
    "collision,kbc_type",
    [("bgk", None), ("mrt", None)]
    + [("kbc", k) for k in (0, 0b10000101, 0b10000110, 0b10001001, 0b10001010)],
)
def test_fused_periodic_matches_unfused_interpret(collision, kbc_type):
    """The fully-periodic fused kernel vs the jnp shear-layer step
    (BGK, MRT, and all five KBC variants incl. LBGK)."""
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.models import shear_layer as sl
    from jrl_lbm_tpu.ops.pallas import fused_periodic as fp

    cfg = sl.ShearLayerConfig(
        res=(32, 32), Re=1000.0, collision=collision, kbc_type=kbc_type
    )
    state, fields = sl.init(cfg)
    # run the reference steps first: interleaving eager jnp ops with
    # interpret-mode pallas calls deadlocks the interpret runtime's
    # device-clock machinery
    ref = dict(state)
    step_ref = sl.make_step(cfg)
    for _ in range(5):
        ref = step_ref(ref, fields)
    with pltpu.force_tpu_interpret_mode():
        step_f = fp.make_fused_periodic_step(cfg, tile_rows=8)
        out = dict(state)
        for _ in range(5):
            out = step_f(out, fields)
    np.testing.assert_allclose(
        np.asarray(out["f"]), np.asarray(ref["f"]), rtol=2e-5, atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["vel"]), np.asarray(ref["vel"]), rtol=1e-4, atol=1e-5
    )
