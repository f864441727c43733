"""Device mesh construction for 2D spatial domain decomposition."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


AXIS_Y = "dy"
AXIS_X = "dx"


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 2D (`dy`, `dx`) mesh over the available devices.

    With no shape given, factors the device count into the most
    square-ish (ny, nx) grid so halo surface (and thus ICI traffic) is
    minimised.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        ny = int(np.floor(np.sqrt(n)))
        while n % ny:
            ny -= 1
        shape = (ny, n // ny)
    ny, nx = shape
    if ny * nx != n:
        raise ValueError(f"mesh shape {shape} does not match {n} devices")
    dev_arr = np.asarray(devices).reshape(ny, nx)
    return Mesh(dev_arr, (AXIS_Y, AXIS_X))
