#!/usr/bin/env python
"""Generate the committed visual goldens for the basic demos (verdict
r3 #8) — the reference ships 2d_LBM.gif / 2d_LBM_KBC.gif /
2d_LBM_cylinder.gif as expected-output anchors (`readme.md:30-34`).

Layout under validation/goldens/:
  <name>.gif                 display artifact (backend of the run)
  <name>/signatures.json     sha256 of the raw pixel data of EVERY
                             dumped frame + backend + config
  <name>/NNN.png             a few representative frames for eyeballing

The demos share one frame directory on purpose (reference quirk: both
shear-layer demos write demo_data_LBM_2d/), so each demo here runs with
its own JRL_DEMO_OUT sandbox and the artifacts are copied out.

tests/test_goldens.py regenerates the cheap demos on CPU and asserts
the signatures bit-exactly (XLA CPU is deterministic run-to-run; goldens
for the test tier must therefore be generated with --cpu).
"""

import hashlib
import json
import os
import shutil
import sys

# test-tier goldens must be generated under the SAME virtual-device
# topology as tests/conftest.py: 8 virtual CPU devices change XLA's
# intra-op partitioning and thus reduction order, so hashes from a
# plain single-device run do NOT match the pytest environment.
if "--cpu" in sys.argv:
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "validation", "goldens")
os.makedirs(OUT, exist_ok=True)

sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "demo"))

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))

# name -> (script, args, frame dir the demo writes, representative frames)
DEMOS = {
    "2d_LBM": ("demo_2d_LBM.py", [], "demo_data_LBM_2d",
               ["011.png", "301.png", "631.png", "1001.png"]),
    "2d_LBM_KBC": ("demo_2d_LBM_KBC.py", [], "demo_data_LBM_2d",
                   ["011.png", "301.png", "631.png", "1001.png"]),
    # reduced config (reference default is 800x400 x 50k steps — hours on
    # CPU): 400x200 channel, D=10 keeps the (10D, 10D) center in-domain,
    # 2000 steps = 2 frames at the demo's reference dump cadence
    "2d_LBM_cylinder": (
        "demo_2d_LBM_cylinder.py",
        ["--res", "400", "200", "--total_steps", "2000", "--D", "10"],
        "demo_data_LBM_cylinder_2d",
        []),  # frames picked below (dump cadence differs)
}


def pixel_sha(path):
    from PIL import Image

    arr = np.asarray(Image.open(path))
    return hashlib.sha256(
        arr.tobytes() + str(arr.shape).encode() + str(arr.dtype).encode()
    ).hexdigest()


def run_one(name):
    import runpy

    script, args, frame_dir, keep = DEMOS[name]
    sandbox = os.path.join("/tmp", f"goldens_{name}")
    shutil.rmtree(sandbox, ignore_errors=True)
    os.makedirs(sandbox)
    os.environ["JRL_DEMO_OUT"] = sandbox
    print(f"[goldens] {name} ...", flush=True)
    sys.argv = [script] + args
    runpy.run_path(os.path.join(ROOT, "demo", script), run_name="__main__")

    src = os.path.join(sandbox, frame_dir)
    frames = sorted(f for f in os.listdir(src) if f.endswith(".png"))
    sigs = {f: pixel_sha(os.path.join(src, f)) for f in frames}
    dst = os.path.join(OUT, name)
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    with open(os.path.join(dst, "signatures.json"), "w") as fo:
        json.dump(
            {"backend": jax.default_backend(), "n_frames": len(frames),
             "args": args, "frame_dir": frame_dir, "frames": sigs},
            fo, indent=1, sort_keys=True)
    if not keep:  # default: first/middle/last
        keep = [frames[0], frames[len(frames) // 2], frames[-1]]
    for f in keep:
        if f in sigs:
            shutil.copy2(os.path.join(src, f), os.path.join(dst, f))
    for vid in os.listdir(sandbox):
        if vid.endswith((".gif", ".mp4")):
            shutil.copy2(os.path.join(sandbox, vid), os.path.join(OUT, vid))
    print(f"[goldens] {name}: {len(frames)} frames, "
          f"backend={jax.default_backend()}", flush=True)


if __name__ == "__main__":
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or list(DEMOS)
    for name in which:
        run_one(name)
