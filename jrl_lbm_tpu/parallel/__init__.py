"""Multi-chip scaling: 2D domain decomposition via shard_map + halo
exchange; multi-host (DCN) meshes via `multihost`."""

from jrl_lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y, make_mesh
from jrl_lbm_tpu.parallel import multihost
from jrl_lbm_tpu.parallel.halo import (
    DomainInfo,
    make_domain,
    make_single_domain,
    pad_halo,
    pad_periodic,
)

__all__ = [
    "AXIS_X",
    "AXIS_Y",
    "make_mesh",
    "multihost",
    "DomainInfo",
    "make_domain",
    "make_single_domain",
    "pad_halo",
    "pad_periodic",
]
