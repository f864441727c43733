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


def test_fused_bf16_deviation_storage_close_to_f32():
    """bf16 deviation-from-weight f storage tracks the f32 path.

    Storage noise is ~0.4% relative on the O(Vmax) deviations, i.e.
    ~2e-4 absolute per population per step at this scene's Vmax=0.05;
    over 5 steps the fields must stay within a small absolute budget of
    the f32 fused path.
    """
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_step as fs

    cfg = cyl.CylinderConfig(res=(64, 32), D=8.0, Re=500.0,
                             cylinder_center=(16.0, 32.0))
    state, fields = cyl.init(cfg)
    n = 5

    with pltpu.force_tpu_interpret_mode():
        step32 = fs.make_fused_step(cfg, tile_rows=8, split=False)
        ref = dict(state)
        for _ in range(n):
            ref = step32(ref, fields)

        step16 = fs.make_fused_step(cfg, tile_rows=8, split=False,
                                    bf16_dev=True)
        out = dict(state, f=fs.f_to_storage(state["f"], True))
        for _ in range(n):
            out = step16(out, fields)
        f16 = fs.f_from_storage(out["f"], True)

    np.testing.assert_allclose(
        np.asarray(f16), np.asarray(ref["f"]), atol=5e-4, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(out["vel"]), np.asarray(ref["vel"]), atol=2e-3, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(out["rho"]), np.asarray(ref["rho"]), atol=2e-3, rtol=0
    )
