"""CI gate for the JRL 2D-mesh extended-window Mosaic compile check.

Round 3's lesson (VERDICT r3 "latent Mosaic bug", docs/STATUS.md): a
kernel family whose CI is interpret-mode-only can ship a latent Mosaic
lowering rejection that only the first real-TPU compile catches.
`validation/compile_check_jrl_2d.py` is the structural answer for the
xw (2D-mesh) JRL kernels; this wraps it as tests so every future kernel
change re-runs it:

- `test_smoke` (slow tier, CPU interpret): the script's full flow at a
  small shard — catches script rot and numeric regressions in CI.
- `test_real_mosaic` (tpu tier, excluded by default): the REAL compile
  at the asserted production 512x256 shard. Run manually after any
  change to `fused_jrl_tiled.py`/`fused_jrl_sharded.py`:
  `pytest tests/test_compile_check_jrl_2d.py -m tpu` (alone — one TPU
  process at a time, CLAUDE.md tunnel gotchas).
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "validation", "compile_check_jrl_2d.py")


def _run(env_extra, timeout):
    env = dict(os.environ, **env_extra)
    # the script picks its own platform (SMOKE -> cpu, else the chip)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, SCRIPT], env=env, timeout=timeout,
        capture_output=True, text=True,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    out = json.loads(r.stdout.strip().splitlines()[-1])
    for case in ("fluid_a", "fluid_b", "balance", "approach",
                 "fluid_a_lean", "fluid_b_lean"):
        assert out[case] == "ok", out
    return out


@pytest.mark.slow
def test_smoke():
    _run({"JRL_2D_SMOKE": "1"}, timeout=1200)


@pytest.mark.tpu
def test_real_mosaic():
    out = _run({}, timeout=3600)
    assert out["shard"] == [512, 256], out
