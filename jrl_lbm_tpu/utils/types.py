"""Cell/collision/obstacle/axisymmetry type enums.

API-parity port of the reference's flag system
(`src/LBM/utils/types.py:5-79`), kept as plain IntEnums so they can be
used directly in jnp comparisons and as static (hashable) jit arguments.
"""

from __future__ import annotations

from enum import IntEnum


class CellType(IntEnum):
    """Per-cell flag values (reference `types.py:5-15`)."""

    NOTHING = 0
    FLUID = 1
    OBSTACLE = 2
    EMPTY = 4
    INFLOW = 8
    OUTFLOW = 16
    INFLOW_2 = 32


class KBCType(IntEnum):
    """KBC collision variants (reference `types.py:18-61`)."""

    LBGK = 0
    KBC_A = 0b10000101
    KBC_B = 0b10000110
    KBC_C = 0b10001001
    KBC_D = 0b10001010


def is_KBC(value) -> bool:
    if value is None:
        return False
    return (int(value) & 0b10000000) > 0


def is_KBC_AC(value) -> bool:
    if value is None:
        return False
    return (int(value) & 0b10000001) > 0


def is_KBC_BD(value) -> bool:
    if value is None:
        return False
    return (int(value) & 0b10000010) > 0


def is_KBC_AB(value) -> bool:
    if value is None:
        return False
    return (int(value) & 0b10000100) > 0


def is_KBC_CD(value) -> bool:
    if value is None:
        return False
    return (int(value) & 0b10001000) > 0


class ObsType(IntEnum):
    """Obstacle shape selector (reference `types.py:64-69`)."""

    BOX = 0
    SPHERE = 1


class AxiSymmetricType(IntEnum):
    """Axisymmetric axis selection (reference `types.py:72-79`)."""

    NOT = 0
    LINE_X_EQ_0 = 1
    LINE_Y_EQ_0 = 2
    LINE_Z_EQ_0 = 3
