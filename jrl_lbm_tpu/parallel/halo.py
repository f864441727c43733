"""Halo exchange over a 2D device mesh (the LBM analog of context/sequence
parallelism: 1-cell-wide exchanges per step over ICI, SURVEY §2.3).

Two axis-separable exchanges (rows, then columns of the row-padded block)
make the diagonal corner cells correct without a dedicated corner
message. `jax.lax.ppermute` over the ring of each mesh axis also
implements the GLOBAL periodic wrap of the reference's FLUID streaming
rule for free: the halo of an edge shard holds the opposite edge of the
domain.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _ring_perm(n: int, shift: int):
    """Permutation sending device i's slice to device (i + shift) mod n."""
    return [(i, (i + shift) % n) for i in range(n)]


def pad_halo(x: jnp.ndarray, ay: str, ax: str) -> jnp.ndarray:
    """Pad a local block ``[..., h, w]`` to ``[..., h+2, w+2]``.

    Must be called inside `shard_map` with mesh axes ``ay`` (rows) and
    ``ax`` (cols). The halo values are the periodic global neighbours.
    """
    ny = jax.lax.axis_size(ay)
    nx = jax.lax.axis_size(ax)
    # rows: my last row becomes the TOP halo of the shard below (i+1)
    top = jax.lax.ppermute(x[..., -1:, :], ay, _ring_perm(ny, 1))
    bot = jax.lax.ppermute(x[..., :1, :], ay, _ring_perm(ny, -1))
    xp = jnp.concatenate([top, x, bot], axis=-2)
    # cols on the row-padded block -> corners correct
    left = jax.lax.ppermute(xp[..., :, -1:], ax, _ring_perm(nx, 1))
    right = jax.lax.ppermute(xp[..., :, :1], ax, _ring_perm(nx, -1))
    return jnp.concatenate([left, xp, right], axis=-1)


@dataclasses.dataclass(frozen=True)
class DomainInfo:
    """Global-domain context of one shard, built inside shard_map."""

    h: int  # local block rows
    w: int  # local block cols
    H: int  # global rows
    W: int  # global cols
    gy: jnp.ndarray  # [h, w] global row index of each local cell
    gx: jnp.ndarray  # [h, w] global col index
    axis_x: bool  # axisymmetric about x = 0
    axis_y: bool

    @property
    def at_x0(self):
        return self.gx == 0

    @property
    def at_xW(self):
        return self.gx == self.W - 1

    @property
    def at_y0(self):
        return self.gy == 0

    @property
    def at_yH(self):
        return self.gy == self.H - 1


def make_domain(
    local_shape, global_shape, ay: str, ax: str, axisymmetric_type: int = 0
) -> DomainInfo:
    """Build the DomainInfo for the current shard (inside shard_map)."""
    h, w = local_shape
    H, W = global_shape
    iy = jax.lax.axis_index(ay)
    ix = jax.lax.axis_index(ax)
    gy = iy * h + jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    gx = ix * w + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return DomainInfo(
        h=h,
        w=w,
        H=H,
        W=W,
        gy=gy,
        gx=gx,
        axis_x=int(axisymmetric_type) == 1,
        axis_y=int(axisymmetric_type) == 2,
    )


def make_single_domain(shape, axisymmetric_type: int = 0) -> DomainInfo:
    """DomainInfo for an unsharded array (whole domain on one device)."""
    H, W = shape
    gy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    return DomainInfo(
        h=H, w=W, H=H, W=W, gy=gy, gx=gx,
        axis_x=int(axisymmetric_type) == 1,
        axis_y=int(axisymmetric_type) == 2,
    )


def pad_periodic(x: jnp.ndarray) -> jnp.ndarray:
    """Single-device halo pad: periodic wrap (for testing padded ops)."""
    xp = jnp.concatenate([x[..., -1:, :], x, x[..., :1, :]], axis=-2)
    return jnp.concatenate([xp[..., :, -1:], xp, xp[..., :, :1]], axis=-1)
