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


def test_fused_write_macro_skip_matches():
    """write_macro=False (interior tiles skip rho/vel writes) + a final
    macro refresh must match the always-write split path: f bitwise (the
    same kernels compute it), rho/vel to MRT-conservation roundoff."""
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_step as fs

    cfg = cyl.CylinderConfig(res=(96, 32), D=8.0, Re=500.0,
                             cylinder_center=(16.0, 48.0))
    n = 4
    with pltpu.force_tpu_interpret_mode():
        step_ref = fs.make_fused_step(cfg, tile_rows=8, split=True)
        assert not step_ref.skip_macro
        a, fields = cyl.init(cfg)
        for _ in range(n):
            a = step_ref(a, fields)

        step_skip = fs.make_fused_step(cfg, tile_rows=8, split=True,
                                       write_macro=False)
        assert step_skip.skip_macro
        b, _ = cyl.init(cfg)
        for _ in range(n):
            b = step_skip(b, fields)
        b = fs.make_macro_refresh(cfg)(b, fields)

    np.testing.assert_array_equal(np.asarray(b["f"]), np.asarray(a["f"]))
    np.testing.assert_allclose(
        np.asarray(b["rho"]), np.asarray(a["rho"]), atol=1e-6, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(b["vel"]), np.asarray(a["vel"]), atol=1e-6, rtol=1e-6
    )


def test_fused_double_step_matches_single_steps():
    """Temporal blocking: one k=2 pass must equal two k=1 split steps.
    The redundant step-1 extended rows run the same arithmetic as the
    owning tile, so f matches to 1-ulp (FMA contraction may differ
    between the two lowerings)."""
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_step as fs

    cfg = cyl.CylinderConfig(res=(96, 32), D=8.0, Re=500.0,
                             cylinder_center=(16.0, 48.0))
    with pltpu.force_tpu_interpret_mode():
        step1 = fs.make_fused_step(cfg, tile_rows=8, split=True)
        a, fields = cyl.init(cfg)
        for _ in range(4):
            a = step1(a, fields)

        step2 = fs.make_fused_step2(cfg, tile_rows=8)
        assert step2 is not None and step2.skip_macro
        b, _ = cyl.init(cfg)
        b = step2(b, fields)
        b = step2(b, fields)
        b = fs.make_macro_refresh(cfg)(b, fields)

    np.testing.assert_allclose(
        np.asarray(b["f"]), np.asarray(a["f"]), rtol=5e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(b["rho"]), np.asarray(a["rho"]), atol=1e-6, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(b["vel"]), np.asarray(a["vel"]), atol=1e-6, rtol=1e-6
    )


@pytest.mark.slow
def test_fused_quad_step_matches_single_steps():
    """k=4 temporal blocking: one k=4 pass must equal four k=1 split
    steps. Exercises the deeper interior halo chain (3 lean-computed
    rows inside the band region) and the 4-step band-kernel chain.
    Slow tier: a single interpreted step4 costs ~20 min."""
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_step as fs

    cfg = cyl.CylinderConfig(res=(96, 32), D=8.0, Re=500.0,
                             cylinder_center=(16.0, 48.0))
    with pltpu.force_tpu_interpret_mode():
        step1 = fs.make_fused_step(cfg, tile_rows=8, split=True)
        a, fields = cyl.init(cfg)
        for _ in range(4):
            a = step1(a, fields)

        step4 = fs.make_fused_step2(cfg, tile_rows=8, k=4)
        assert step4 is not None and step4.skip_macro
        b, _ = cyl.init(cfg)
        b = step4(b, fields)
        b = fs.make_macro_refresh(cfg)(b, fields)

    np.testing.assert_allclose(
        np.asarray(b["f"]), np.asarray(a["f"]), rtol=5e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(b["rho"]), np.asarray(a["rho"]), atol=1e-6, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(b["vel"]), np.asarray(a["vel"]), atol=1e-6, rtol=1e-6
    )


def test_fused_runner_uses_double_steps(monkeypatch):
    """The fused runner must produce the same trajectory whether n is
    reached via double-steps or single steps (odd n exercises the mixed
    path), and end with refreshed macros. Pinned to k<=2 — an
    interpreted step4 costs ~20 min; k=4 numerics are covered by the
    slow-tier quad test."""
    from jax.experimental.pallas import tpu as pltpu

    from jrl_lbm_tpu.ops.pallas import fused_step as fs

    monkeypatch.setenv("LBM_FUSED_K", "2")

    cfg = cyl.CylinderConfig(res=(96, 32), D=8.0, Re=500.0,
                             cylinder_center=(16.0, 48.0))
    with pltpu.force_tpu_interpret_mode():
        state, fields = cyl.init(cfg)
        step1 = fs.make_fused_step(cfg, tile_rows=8, split=True,
                                   write_macro=True)
        ref = dict(state)
        for _ in range(5):
            ref = step1(ref, fields)

        # the runner's steps DONATE the state buffers — run it after the
        # reference has consumed the shared initial state
        run = fs.make_fused_cylinder_runner(cfg, tile_rows=8)
        out = run(dict(state), fields, 5)

    np.testing.assert_allclose(
        np.asarray(out["f"]), np.asarray(ref["f"]), rtol=5e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(out["rho"]), np.asarray(ref["rho"]), atol=1e-6, rtol=1e-6
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
