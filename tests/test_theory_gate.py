"""The analytic theory gate over the committed production sweep records.

Pure numpy over text files (no JAX): asserts the committed low-Pe
approach-curve records still agree with the Cornut-Lefrou analytic
expressions (negative feedback: 2007 eq. 17; positive feedback: 2008
conducting-substrate, fast-kinetics limit) within the per-region bands
of validation/run_theory_gate.py. Catches two failure classes in CI:
a physics regression that silently rewrites the committed records, and
an edit to the gate script that loosens or breaks the gate itself.
"""

import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "validation"))

import run_theory_gate as tg  # noqa: E402


def _require_records(path):
    if not os.path.isdir(path):
        pytest.skip(f"sweep records not present: {path}")


def test_nf_records_match_theory():
    _require_records(tg.SWEEP)
    cases = tg.gate_dir(tg.SWEEP, tg.nf_theory, tg.REGIONS)
    assert len(cases) == 20
    bad = [c["file"] for c in cases if not c["pass"]]
    assert not bad, f"NF records out of theory bands: {bad}"


def test_pf_records_match_theory():
    _require_records(tg.SWEEP_POS)
    cases = tg.gate_dir(tg.SWEEP_POS, tg.pf_theory, tg.REGIONS_POS)
    assert len(cases) == 6
    bad = [c["file"] for c in cases if not c["pass"]]
    assert not bad, f"PF records out of theory bands: {bad}"


def test_ethaline_records_match_theory():
    # count not pinned: the ethaline grid fills in incrementally (the
    # low-Re fluid phases cost hours each; the driver is resumable)
    _require_records(tg.SWEEP_ETH)
    cases = tg.gate_dir(tg.SWEEP_ETH, tg.nf_theory, tg.REGIONS)
    if not cases:  # dir exists but the first low-Pe case hasn't landed
        pytest.skip("no low-Pe ethaline records yet")
    bad = [c["file"] for c in cases if not c["pass"]]
    assert not bad, f"ethaline records out of theory bands: {bad}"


def test_theory_expressions_limits():
    # Both expressions must normalize to 1 far from the substrate and
    # move the documented direction near contact.
    L_far = np.array([50.0, 200.0])
    assert np.allclose(tg.nf_theory(L_far), 1.0, atol=0.05)
    assert np.allclose(tg.pf_theory(L_far), 1.0, atol=0.01)
    assert tg.nf_theory(np.array([0.3]))[0] < 0.5  # blocked diffusion
    assert tg.pf_theory(np.array([0.3]))[0] > 2.0  # regenerating feed
