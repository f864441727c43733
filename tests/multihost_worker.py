"""Worker process for tests/test_multihost.py (one instance per rank).

Runs the sharded cylinder step on a process-spanning (2, nx) mesh and
checks every locally addressable shard against the unsharded jnp step
computed independently on this host. usage:
    multihost_worker.py <process_id> <num_processes> <port>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

from jrl_lbm_tpu.parallel import multihost as mh  # noqa: E402

mh.initialize(f"127.0.0.1:{port}", nproc, pid)

import numpy as np  # noqa: E402

from jrl_lbm_tpu.models import cylinder as cyl  # noqa: E402
from jrl_lbm_tpu.parallel import sharded  # noqa: E402

mesh = mh.pod_mesh()  # (nproc, local_device_count)
ny, nx = mh.mesh_shape(mesh)
assert ny == nproc, "one mesh row per process"

# the cylinder straddles the process boundary: its reconstruction band
# is exchanged through the DCN (cross-process) halo every step
H, W = 48, 32
cfg = cyl.CylinderConfig(
    res=(H, W), D=8.0, Re=500.0, cylinder_center=(16.0, float(H // ny))
)
state, fields = cyl.init(cfg)

st_sh, fl_sh = sharded.state_shardings(mesh)
gstate = mh.lift(state, st_sh)
gfields = mh.lift(fields, fl_sh)

step = jax.jit(sharded.make_sharded_cylinder_step(cfg, mesh))
n_steps = 3
for _ in range(n_steps):
    gstate = step(gstate, gfields)

ref = dict(state)
ref_step = cyl.make_step(cfg)
for _ in range(n_steps):
    ref = ref_step(ref, fields)

for key in ("f", "rho", "vel"):
    expect = np.asarray(ref[key])
    for shard in gstate[key].addressable_shards:
        np.testing.assert_allclose(
            np.asarray(shard.data), expect[shard.index],
            rtol=1e-6, atol=1e-6, err_msg=f"{key} shard {shard.index}",
        )

# the FUSED sharded kernel across the same process-spanning mesh: its
# ppermute y halo (and the x-halo columns when nx > 1) crosses the DCN
# (cross-process) boundary — the production multi-chip path routes
# through this kernel family (ops/pallas/fused_sharded.py). OBSTACLE
# cells are masked like every fused equivalence test (f/rho there are
# dead storage the fused kernels keep differently, test_fused.py:25-29).
from jrl_lbm_tpu.ops.pallas import fused_sharded as fsh  # noqa: E402
from jrl_lbm_tpu.utils.types import CellType  # noqa: E402

fluid = np.asarray(fields["flags"]) != int(CellType.OBSTACLE)
fstate = mh.lift(state, st_sh)
fused_step = jax.jit(
    fsh.make_sharded_fused_cylinder_step(cfg, mesh, interpret=True)
)
for _ in range(n_steps):
    fstate = fused_step(fstate, gfields)

for key in ("f", "rho", "vel"):
    expect = np.asarray(ref[key])
    fmask = np.broadcast_to(fluid, expect.shape)
    for shard in fstate[key].addressable_shards:
        m = fmask[shard.index]
        np.testing.assert_allclose(
            np.asarray(shard.data)[m], expect[shard.index][m],
            rtol=1e-5, atol=1e-5, err_msg=f"fused {key} shard {shard.index}",
        )

print(f"proc {pid} OK", flush=True)
