"""Multi-chip scaling: 2D domain decomposition via shard_map + halo exchange."""

from jrl_lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y, make_mesh
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
    "DomainInfo",
    "make_domain",
    "make_single_domain",
    "pad_halo",
    "pad_periodic",
]
