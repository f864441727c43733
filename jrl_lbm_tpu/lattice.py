"""D2Q9 lattice constants.

TPU-native re-design of the lattice tables used throughout the reference
(JRL-LBM). The constant values (velocity set, weights, reflection and
axis-mirror permutations) are the standard D2Q9 definitions; the reference
declares them in `src/LBM/LBM_propagation/cuda/propagation.cu:49-64` and
`src/LBM/LBM_collision/LBM_collision_2d.py:173-210`.

Conventions used across this framework (TPU-first; differs from the
reference's torch `[B, Q, H, W]` layout):

* state arrays carry **no batch axis** — use `jax.vmap` to batch scenes;
* ``f``    : ``[Q, H, W]``  distribution functions, ``W`` is the minor
  (lane) axis so each ``f[q]`` plane tiles onto the 8x128 VPU registers;
* ``vel``  : ``[2, H, W]`` with channel 0 = x-velocity, channel 1 = y;
* ``rho``  : ``[H, W]``;
* ``flags``: ``[H, W]`` int32 (``CellType`` values).

``E[q] = (ex, ey)`` where ``x`` indexes the last axis and ``y`` the
second-to-last, matching the reference's direction table.
"""

from __future__ import annotations

import numpy as np

Q = 9
DIM = 2

# Discrete velocity set e_q = (ex, ey); propagation.cu:49.
E = np.array(
    [
        [0, 0],
        [1, 0],
        [0, 1],
        [-1, 0],
        [0, -1],
        [1, 1],
        [-1, 1],
        [-1, -1],
        [1, -1],
    ],
    dtype=np.int32,
)

# Quadrature weights; propagation.cu:50-60.
W = np.array(
    [4 / 9, 1 / 9, 1 / 9, 1 / 9, 1 / 9, 1 / 36, 1 / 36, 1 / 36, 1 / 36],
    dtype=np.float64,
)

# Opposite-direction permutation (full bounce-back); propagation.cu:62.
REFLECT = np.array([0, 3, 4, 1, 2, 7, 8, 5, 6], dtype=np.int32)

# Mirror about the x=0 axis (flips ex); propagation.cu:63.
MIRROR_X = np.array([0, 3, 2, 1, 4, 6, 5, 8, 7], dtype=np.int32)

# Mirror about the y=0 axis (flips ey); propagation.cu:64.
MIRROR_Y = np.array([0, 1, 4, 3, 2, 8, 7, 6, 5], dtype=np.int32)

# Directions whose incoming population crosses the x=0 symmetry axis
# (e_x = +1): the pull neighbour lies at x-1 < 0; propagation.cu:117,136.
AXIS_X_IN = (1, 5, 8)
# Outgoing directions crossing x=0 (e_x = -1); propagation.cu:173.
AXIS_X_OUT = (3, 6, 7)
# Same for the y=0 axis; propagation.cu:121,140.
AXIS_Y_IN = (2, 5, 6)
AXIS_Y_OUT = (4, 7, 8)

CS2 = 1.0 / 3.0  # (lattice speed of sound)^2 in units of c=dx/dt.


def cs2(dx: float, dt: float) -> float:
    """Squared speed of sound for a given grid/time step."""
    c = dx / dt
    return c * c / 3.0
