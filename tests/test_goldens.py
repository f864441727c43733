"""Visual-golden regression gates for the basic demos (verdict r3 #8).

Regenerates each cheap demo at its reference-default config on CPU and
asserts every dumped frame's pixel data matches the committed
signatures in validation/goldens/<name>/signatures.json bit-exactly
(XLA CPU is deterministic run-to-run; verified in round 3). A numerics
change — legitimate or not — trips this test; regenerate goldens
deliberately with `python validation/run_goldens.py <name> --cpu`.

The committed representative PNGs (011/301/631/1001) are additionally
checked against the regenerated frames with a loose pixel tolerance, so
a corrupted committed golden is caught too.

Reference anchors: readme.md:30-34 ships 2d_LBM.gif / 2d_LBM_KBC.gif as
expected outputs; the frame-dir collision between the two demos is the
reference's own quirk (both write demo_data_LBM_2d/), so each run here
gets a sandboxed JRL_DEMO_OUT.
"""

import hashlib
import json
import os
import runpy
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(ROOT, "validation", "goldens")


def _pixel_sha(path):
    from PIL import Image

    arr = np.asarray(Image.open(path))
    return hashlib.sha256(
        arr.tobytes() + str(arr.shape).encode() + str(arr.dtype).encode()
    ).hexdigest()


def _run_demo(script, args, out_dir, monkeypatch):
    monkeypatch.setenv("JRL_DEMO_OUT", str(out_dir))
    monkeypatch.setattr(sys, "argv", [script] + list(args))
    monkeypatch.syspath_prepend(os.path.join(ROOT, "demo"))
    runpy.run_path(os.path.join(ROOT, "demo", script), run_name="__main__")


@pytest.mark.parametrize("name,script", [
    ("2d_LBM", "demo_2d_LBM.py"),
    ("2d_LBM_KBC", "demo_2d_LBM_KBC.py"),
    ("2d_LBM_cylinder", "demo_2d_LBM_cylinder.py"),
])
def test_demo_matches_golden(name, script, tmp_path, monkeypatch):
    sig_path = os.path.join(GOLD, name, "signatures.json")
    with open(sig_path) as fo:
        golden = json.load(fo)
    assert golden["backend"] == "cpu", (
        f"{name} goldens were generated on {golden['backend']}; the "
        "bit-exact gate needs CPU goldens (run_goldens.py --cpu)")

    _run_demo(script, golden.get("args", []), tmp_path, monkeypatch)
    frame_dir = tmp_path / golden.get("frame_dir", "demo_data_LBM_2d")
    frames = sorted(f for f in os.listdir(frame_dir) if f.endswith(".png"))
    assert len(frames) == golden["n_frames"], (len(frames), golden["n_frames"])

    mismatched = [
        f for f in frames
        if _pixel_sha(os.path.join(frame_dir, f)) != golden["frames"][f]
    ]
    assert not mismatched, (
        f"{len(mismatched)}/{len(frames)} frames diverge from the "
        f"committed goldens, first: {mismatched[:3]}")

    # committed representative PNGs are intact (loose pixel tolerance)
    from PIL import Image

    for f in os.listdir(os.path.join(GOLD, name)):
        if not f.endswith(".png"):
            continue
        a = np.asarray(Image.open(os.path.join(GOLD, name, f)), np.float64)
        b = np.asarray(Image.open(os.path.join(frame_dir, f)), np.float64)
        assert a.shape == b.shape
        assert np.abs(a - b).mean() < 1.0, f
