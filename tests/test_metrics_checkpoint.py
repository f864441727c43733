"""Metrics diagnostics and checkpoint round-trips."""

import numpy as np
import jax.numpy as jnp

from jrl_lbm_tpu.models import shear_layer as sl
from jrl_lbm_tpu.utils import checkpoint as ckpt
from jrl_lbm_tpu.utils import metrics


def test_mass_momentum_conservation_diagnostics():
    cfg = sl.ShearLayerConfig(res=(32, 32))
    state, fields = sl.init(cfg)
    run = sl.make_runner(cfg)
    m0 = float(metrics.mass(state["f"]))
    p0 = np.asarray(metrics.momentum(state["f"]))
    state = run(state, fields, 100)
    m1 = float(metrics.mass(state["f"]))
    p1 = np.asarray(metrics.momentum(state["f"]))
    assert abs(m1 - m0) / m0 < 1e-5
    np.testing.assert_allclose(p1, p0, atol=2e-4 * m0)


def test_divergence_norm_small_for_incompressible():
    cfg = sl.ShearLayerConfig(res=(64, 64))
    state, fields = sl.init(cfg)
    state = sl.make_runner(cfg)(state, fields, 200)
    div = float(metrics.divergence_norm(state["vel"]))
    assert div < 1e-3, div


def test_step_timer():
    t = metrics.StepTimer(cells=100)
    t.start()
    t.stop(10)
    assert t.steps == 10
    assert t.mlups >= 0
    rep = t.report()
    assert set(rep) == {"cells", "steps", "seconds", "mlups"}


def test_field_stats_flags_nan():
    stats = metrics.field_stats({"f": np.array([1.0, np.nan])})
    assert stats["f_finite"] is False


def test_checkpoint_roundtrip(tmp_path):
    cfg = sl.ShearLayerConfig(res=(16, 16))
    state, fields = sl.init(cfg)
    state = sl.make_runner(cfg)(state, fields, 10)
    path = str(tmp_path / "state.h5")
    ckpt.save_state(path, state, step=10, scene="shear")
    state2, step, extra = ckpt.load_state(path)
    assert step == 10
    assert extra["scene"] == "shear"
    for k in state:
        np.testing.assert_array_equal(np.asarray(state2[k]), np.asarray(state[k]))

    # resume continues identically to an uninterrupted run
    run = sl.make_runner(cfg)
    a = run(dict(state), fields, 20)
    b = run(dict(state2), fields, 20)
    np.testing.assert_array_equal(np.asarray(a["f"]), np.asarray(b["f"]))


def test_checkpoint_orbax_roundtrip(tmp_path):
    try:
        import orbax.checkpoint  # noqa: F401
    except ImportError:
        import pytest

        pytest.skip("orbax not installed")
    cfg = sl.ShearLayerConfig(res=(16, 16))
    state, _ = sl.init(cfg)
    path = str(tmp_path / "orbax_ckpt")
    ckpt.save_state_orbax(path, state)
    like = {k: jnp.zeros_like(v) for k, v in state.items()}
    state2 = ckpt.load_state_orbax(path, like)
    for k in state:
        np.testing.assert_array_equal(np.asarray(state2[k]), np.asarray(state[k]))
