"""Fused cylinder step composed with shard_map 2D domain decomposition.

`ops/pallas/fused_step.py` is single-device: its x pulls are full-width
`pltpu.roll`s and its y halos are BlockSpec row-blocks of the SAME
global array. Under shard_map each device owns only an (h, w) block, so
this module re-expresses the complete fused update (streaming with flag
BCs, curved solid-fluid reconstruction, macro moments, MRT collision —
same reference call stack as `models/cylinder.py::make_step`:
`propagation.cu`, `solid_fluid_coupling.cu`, `LBM_macro_compute_2d.py`,
`LBM_collision_MRT_2d.py`) as ONE Pallas kernel over a halo-padded
local block:

* halos: `parallel.halo.pad_halo` (two-phase `ppermute` over ICI, 1 cell)
  pads f/vel/flags before the kernel; every neighbour access inside the
  kernel is then a static slice of the padded plane — no rolls, no
  cross-shard reads;
* the reference's global-border rules (reflect-clamp, OUTFLOW inward
  copy, INFLOW plug) are applied through global-coordinate masks built
  from the shard's (row0, col0) offset, passed as SMEM scalars — a shard
  only touches a border rule if it owns a piece of the global border
  (same contract as `parallel/padded_ops.py`);
* like the single-device fused kernel, the coupling reads the PRE-update
  velocity halo: propagate only rewrites vel at INFLOW cells, where it
  writes the same constant every step, so pre == post there (validated
  by the sharded-vs-unsharded equivalence test).

Per-step communication: one 1-cell halo of (f, vel, flags) — O(surface);
everything else is a single VMEM-resident kernel per shard per step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jrl_lbm_tpu import lattice
from jrl_lbm_tpu.ops import collide as _collide
from jrl_lbm_tpu.ops.pallas.fused_step import _feq_terms, _mrt_apply
from jrl_lbm_tpu.utils.types import CellType

FLUID = int(CellType.FLUID)
OBSTACLE = int(CellType.OBSTACLE)
INFLOW = int(CellType.INFLOW)
OUTFLOW = int(CellType.OUTFLOW)
INFLOW_2 = int(CellType.INFLOW_2)

E = lattice.E
REFL = lattice.REFLECT
W_Q = lattice.W
CS2 = 1.0 / 3.0

_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


class _WrapPlane:
    """Tile-plane access over a row-extended (h+2, w) window on a shard
    spanning the FULL global width (nx == 1): x offsets are plain
    periodic lane rolls — no cross-shard columns exist, and the
    reference's own x rule for FLUID cells at the domain edge IS the
    periodic wrap (`propagation.cu:84-87`; non-FLUID edge cells are
    overridden by the caller's masks). Bitwise-identical to `_RollPlane`
    fed with the nx==1 self-wrap halo columns, without ever slicing a
    column out of f (a column slice forces XLA to materialize a
    transposed-layout copy of the whole array — measured ~490 us/step
    at 2048^2)."""

    def __init__(self, win, h, w):
        self.win = win
        self.h = h
        self.w = w

    def mid(self):
        return self.win[1:-1, :]

    def sl(self, yo, xo):
        rows = self.win[1 + yo : 1 + yo + self.h, :]
        if xo == 0:
            return rows
        return pltpu.roll(rows, (-xo) % self.w, axis=1)

    def map(self, fn):
        return _WrapPlane(fn(self.win), self.h, self.w)


class _PadPlane:
    """Tile-plane access over a 1-cell-padded (h+2, w+2) array (the
    single-tile-per-shard layout). `sl(yo, xo)` is the (h, w) patch at
    offset (yo, xo) in {-1, 0, 1}^2."""

    def __init__(self, pad, h, w):
        self.pad = pad
        self.h = h
        self.w = w

    def mid(self):
        return self.pad[1:-1, 1:-1]

    def sl(self, yo, xo):
        return self.pad[1 + yo : 1 + yo + self.h, 1 + xo : 1 + xo + self.w]

    def map(self, fn):
        return _PadPlane(fn(self.pad), self.h, self.w)


class _RollPlane:
    """Tile-plane access over a row-extended LANE-ALIGNED (th+2, w)
    window plus (th+2, 1) cross-shard x-halo column windows: x offsets
    are lane rolls with the shard-edge lanes patched from the columns.
    Keeping w a multiple of 128 (instead of a w+2-wide padded plane)
    keeps every vector op in the tile update aligned."""

    def __init__(self, win, lcw, rcw, h, w):
        self.win = win
        self.lcw = lcw
        self.rcw = rcw
        self.h = h
        self.w = w

    def mid(self):
        return self.win[1:-1, :]

    def sl(self, yo, xo):
        rows = self.win[1 + yo : 1 + yo + self.h, :]
        if xo == 0:
            return rows
        v = pltpu.roll(rows, (-xo) % self.w, axis=1)
        lx = jax.lax.broadcasted_iota(jnp.int32, (self.h, self.w), 1)
        if xo == -1:  # value from x-1: lane 0 comes from the left shard
            colv = self.lcw[1 + yo : 1 + yo + self.h, :]
            return jnp.where(lx == 0, colv, v)
        colv = self.rcw[1 + yo : 1 + yo + self.h, :]
        return jnp.where(lx == self.w - 1, colv, v)

    def map(self, fn):
        return _RollPlane(fn(self.win), fn(self.lcw), fn(self.rcw),
                          self.h, self.w)


def _block_update(flagsP, fP, velP, rho_prev, phi, h, w, H, W, row0, col0,
                  A, FEQ_IN, tau, inflow_density, inflow_vx, inflow_vy):
    """The complete cylinder-scene update on an (h, w) tile given plane
    accessors (`_PadPlane` or `_RollPlane`) and the tile's global
    (row0, col0) offset. Pure function of tiles -> (f list, rho, u_x,
    u_y); shared by the single-tile-per-shard kernel and the row-tiled
    variant."""
    eps = 1e-10
    gy = row0 + jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    gx = col0 + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    at_y0 = gy == 0
    at_yH = gy == H - 1
    at_x0 = gx == 0
    at_xW = gx == W - 1

    flags = flagsP.mid()
    is_fluid = flags == FLUID
    not_fluid = jnp.logical_not(is_fluid)
    is_obs = flags == OBSTACLE
    obsP = flagsP.map(lambda a: (a == OBSTACLE).astype(jnp.float32))

    t_ok = (phi > -eps) & (phi <= 1.0 + eps)

    def pull(plane, ex, ey, style):
        """Value at each cell from (y - ey, x - ex), with the
        reference's flag-dependent edge rules — accessor port of
        `parallel/padded_ops.py::pull2`."""

        def cands(e_comp, lo_mask, hi_mask):
            cs = [(None, -e_comp)]
            if e_comp == 1:
                cs.append((lo_mask & not_fluid, 1 if style == "reflect" else 0))
            elif e_comp == -1:
                cs.append((hi_mask & not_fluid, -1 if style == "reflect" else 0))
            return cs

        v = None
        for my, yo in cands(ey, at_y0, at_yH):
            for mx, xo in cands(ex, at_x0, at_xW):
                patch = plane.sl(yo, xo)
                if v is None:
                    v = patch
                    continue
                m = mx if my is None else (my if mx is None else (mx & my))
                v = jnp.where(m, patch, v)
        return v

    # ---- streaming with sub-grid interpolation bounce-back ----
    f_mid = [fP[q].mid() for q in range(9)]
    raw_in = [f_mid[0]]
    for q in range(1, 9):
        ex, ey = int(E[q, 0]), int(E[q, 1])
        raw_in.append(pull(fP[q], ex, ey, "reflect"))
    f_new = [f_mid[0]]
    for q in range(1, 9):
        ex, ey = int(E[q, 0]), int(E[q, 1])
        nbr_obs = pull(obsP, ex, ey, "reflect") > 0.5
        f_this = f_mid[int(REFL[q])]
        nxt = pull(fP[int(REFL[q])], -ex, -ey, "reflect")
        v1 = (2.0 * phi - 1.0) * raw_in[q] + (2.0 - 2.0 * phi) * f_this
        v2 = (2.0 * phi) * f_this + (1.0 - 2.0 * phi) * nxt
        v_obs = jnp.where(t_ok, jnp.where(phi >= 0.5, v1, v2), f_this)
        streamed = jnp.where(nbr_obs, v_obs, raw_in[q])
        f_new.append(jnp.where(is_obs, raw_in[int(REFL[q])], streamed))

    # ---- INFLOW plug equilibrium ----
    in_mask = flags == INFLOW
    for q in range(9):
        f_new[q] = jnp.where(in_mask, FEQ_IN[q], f_new[q])
    rho_after = jnp.where(in_mask, inflow_density, rho_prev)
    velx_after = jnp.where(in_mask, inflow_vx, velP[0].mid())
    vely_after = jnp.where(in_mask, inflow_vy, velP[1].mid())

    # ---- OUTFLOW: copy all 9 from the inward neighbour (only at
    # global borders; the inward neighbour is local to the shard) ----
    of_mask = flags == OUTFLOW
    for q in range(9):
        g = f_new[q]
        g = jnp.where(at_y0, pltpu.roll(g, h - 1, axis=0), g)
        g = jnp.where(at_yH, pltpu.roll(g, 1, axis=0), g)
        g = jnp.where(at_x0, pltpu.roll(g, w - 1, axis=1), g)
        g = jnp.where(at_xW, pltpu.roll(g, 1, axis=1), g)
        f_new[q] = jnp.where(of_mask, g, f_new[q])

    # ---- solid-fluid coupling (static cylinder: obs_vel == 0) ----
    skip = is_obs | at_xW | at_yH
    rho_tgt = f_new[0]
    for q in range(1, 9):
        rho_tgt = rho_tgt + f_new[q]
    vel_tgt_x = jnp.zeros((h, w), jnp.float32)
    vel_tgt_y = jnp.zeros((h, w), jnp.float32)
    count = jnp.zeros((h, w), jnp.float32)
    valid = []
    tq = jnp.where(t_ok, phi, 0.0)
    tqr = tq / (tq + 1.0)  # hoisted: one divide instead of 18
    for q in range(9):
        ex, ey = int(E[q, 0]), int(E[q, 1])
        nbr_obs = pull(obsP, -ex, -ey, "minmax") > 0.5
        v_q = nbr_obs & t_ok
        valid.append(v_q)
        vmask = v_q.astype(jnp.float32)
        count = count + vmask
        ux = pull(velP[0], ex, ey, "minmax")
        uy = pull(velP[1], ex, ey, "minmax")
        vel_tgt_x = vel_tgt_x + vmask * tqr * ux
        vel_tgt_y = vel_tgt_y + vmask * tqr * uy
    safe_count = jnp.where(count > 0, count, 1.0)
    u0 = vel_tgt_x / safe_count
    u1 = vel_tgt_y / safe_count

    def grad12(plane_pad):
        def at(sx, sy):
            return pull(plane_pad, -sx, -sy, "minmax")

        gxx = (
            4.0 * (at(1, 0) - at(-1, 0))
            + (at(1, 1) - at(-1, 1))
            + (at(1, -1) - at(-1, -1))
        ) / 12.0
        gyy = (
            4.0 * (at(0, 1) - at(0, -1))
            + (at(1, 1) - at(1, -1))
            + (at(-1, 1) - at(-1, -1))
        ) / 12.0
        return gxx, gyy

    g00, g01 = grad12(velP[0])
    g10, g11 = grad12(velP[1])

    for q in range(9):
        qi = int(REFL[q])
        e0, e1 = float(E[qi, 0]), float(E[qi, 1])
        pab = (u0 * u0 - CS2 * tau * (g00 + g00)) * (e0 * e0 - CS2)
        pab = pab + (u1 * u0 - CS2 * tau * (g10 + g01)) * (e1 * e0)
        pab = pab + (u0 * u1 - CS2 * tau * (g01 + g10)) * (e0 * e1)
        pab = pab + (u1 * u1 - CS2 * tau * (g11 + g11)) * (e1 * e1 - CS2)
        recon = float(W_Q[qi]) * rho_tgt * (
            1.0 + (1.0 / CS2) * (u0 * e0 + u1 * e1) + 0.5 * pab / (CS2 * CS2)
        )
        mask = valid[q] & jnp.logical_not(skip)
        f_new[qi] = jnp.where(mask, recon, f_new[qi])

    # ---- macro + MRT (shared CSE feq + paired MRT, fused_step) ----
    macro_rho = f_new[0]
    for q in range(1, 9):
        macro_rho = macro_rho + f_new[q]
    rho_n = jnp.where(is_obs, rho_after, macro_rho)
    mom_x = f_new[1] - f_new[3] + f_new[5] - f_new[6] - f_new[7] + f_new[8]
    mom_y = f_new[2] - f_new[4] + f_new[5] + f_new[6] - f_new[7] - f_new[8]
    safe_rho = jnp.where(rho_n == 0, 1.0, rho_n)
    u_x = jnp.where(is_obs, velx_after, mom_x / safe_rho)
    u_y = jnp.where(is_obs, vely_after, mom_y / safe_rho)

    f_out = [None] * 9
    _mrt_apply(A, f_new, _feq_terms(rho_n, u_x, u_y), is_obs, f_out)
    return f_out, rho_n, u_x, u_y


def _make_padded_block_kernel(h, w, H, W, tau, inflow_density,
                              inflow_vx, inflow_vy, minv_s_m):
    """One full cylinder-scene step on an (h, w) block padded to
    (h+2, w+2); (row0, col0) global offsets arrive as SMEM scalars."""
    A = [[float(minv_s_m[a][b]) for b in range(9)] for a in range(9)]
    FEQ_IN = _feq_terms(inflow_density, inflow_vx, inflow_vy)

    def kernel(off_ref, flagsp_ref, fp_ref, velp_ref, rho_ref, phi_ref,
               f_out, rho_out, vel_out):
        fs, rho_n, u_x, u_y = _block_update(
            _PadPlane(flagsp_ref[:], h, w),
            [_PadPlane(fp_ref[q], h, w) for q in range(9)],
            [_PadPlane(velp_ref[0], h, w), _PadPlane(velp_ref[1], h, w)],
            rho_ref[:], phi_ref[:],
            h, w, H, W, off_ref[0], off_ref[1],
            A, FEQ_IN, tau, inflow_density, inflow_vx, inflow_vy,
        )
        for q in range(9):
            f_out[q] = fs[q]
        rho_out[:] = rho_n
        vel_out[0] = u_x
        vel_out[1] = u_y

    return kernel


@partial(jax.jit, static_argnames=("h", "w", "H", "W", "tau", "inflow_density",
                                   "inflow_vx", "inflow_vy", "minv_s_m",
                                   "interpret"))
def _padded_block_step(off, flagsp, fp, velp, rho, phi, h, w, H, W, tau,
                       inflow_density, inflow_vx, inflow_vy, minv_s_m,
                       interpret):
    kernel = _make_padded_block_kernel(
        h, w, H, W, tau, inflow_density, inflow_vx, inflow_vy, minv_s_m
    )
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((9, h, w), f32),
            jax.ShapeDtypeStruct((h, w), f32),
            jax.ShapeDtypeStruct((2, h, w), f32),
        ],
        compiler_params=None if interpret else _VMEM_PARAMS,
        interpret=interpret,
    )(off, flagsp, fp, velp, rho, phi)


# Above this many cells the (h+2, w+2) single-tile kernel's working set
# (~26 f32 planes + temporaries) exceeds the 100 MB scoped-VMEM budget;
# 2048^2 / 8 shards (527k padded cells) is measured to fit.
MAX_SINGLE_TILE_CELLS = 600_000


@partial(jax.jit, static_argnames=("interpret",))
def _edge_cols(x, interpret: bool = False):
    """First and last columns of a ``(..., h, w)`` block as ``(..., h,
    1)`` arrays, extracted by a Pallas kernel that reads ONLY the two
    edge 128-lane groups. Slicing the column at the jnp level instead
    makes XLA materialize a TRANSPOSED-layout copy of the whole array
    (`f32[9,2048,2048]{1,2,0}` in the compiled HLO, ~490 us/step at
    2048^2 — docs/PERFORMANCE.md #22c); the kernel touches O(h*128)
    bytes per plane."""
    shape = x.shape
    h, w = shape[-2], shape[-1]
    x3 = x.reshape(-1, h, w)
    P = x3.shape[0]
    lg = min(w, 128)
    if w % lg:  # ragged width: tiny arrays only — plain slices are fine
        return x[..., :, :1], x[..., :, -1:]
    n_lg = w // lg
    # VMEM per grid step: 2 input blocks + 2 output blocks (the
    # last-dim-1 outputs are lane-padded to 128 in VMEM, so they cost
    # as much as the inputs), each double-buffered by the pipeline ->
    # 8 blocks of P*th*lg f32. Keep that under ~16 MB (the default
    # scoped-VMEM limit is ~21 MB; a 2048-wide shard OOMed at the old
    # inputs-only estimate).
    th = h
    while th % 2 == 0 and th > 8 and P * th * lg * 4 * 8 > 16 * 1024 * 1024:
        th //= 2
    n_t = h // th

    def kernel(xl_ref, xr_ref, l_out, r_out):
        l_out[:] = xl_ref[:, :, 0:1]
        r_out[:] = xr_ref[:, :, lg - 1 : lg]

    cl, cr = pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=[
            pl.BlockSpec((P, th, lg), lambda i: (0, i, 0)),
            pl.BlockSpec((P, th, lg), lambda i: (0, i, n_lg - 1)),
        ],
        out_specs=[
            pl.BlockSpec((P, th, 1), lambda i: (0, i, 0)),
            pl.BlockSpec((P, th, 1), lambda i: (0, i, 0)),
        ],
        out_shape=[jax.ShapeDtypeStruct((P, h, 1), x.dtype)] * 2,
        interpret=interpret,
    )(x3, x3)
    out_shape = shape[:-1] + (1,)
    return cl.reshape(out_shape), cr.reshape(out_shape)


@partial(jax.jit, static_argnames=("bw", "interpret"))
def _edge_blocks(x, bw: int, interpret: bool = False):
    """First and last ``bw`` lane columns of a ``(..., h, w)`` block as
    ``(..., h, bw)`` arrays — the block-wide sibling of `_edge_cols`,
    feeding the extended-window (``x_ext``) temporal-blocking path. For
    the aligned production case (w a multiple of 128, bw <= 128) a
    Pallas kernel reads ONLY the two edge lane groups; other shapes
    (tests, tiny grids) fall back to plain slices, which are cheap when
    unaligned anyway (the pathological transposed-copy case is the
    width-1 slice of the FULL array, docs/PERFORMANCE.md #22c)."""
    shape = x.shape
    h, w = shape[-2], shape[-1]
    if bw >= w:
        return x, x
    if bw > 128 or w % 128 or h % 8 or interpret:
        return x[..., :, :bw], x[..., :, w - bw :]
    x3 = x.reshape(-1, h, w)
    P = x3.shape[0]
    n_lg = w // 128
    th = h
    while th % 2 == 0 and th > 8 and P * th * 128 * 4 * 8 > 16 * 1024 * 1024:
        th //= 2
    n_t = h // th

    def kernel(xl_ref, xr_ref, l_out, r_out):
        l_out[:] = xl_ref[:, :, 0:bw]
        r_out[:] = xr_ref[:, :, 128 - bw : 128]

    bl, br = pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=[
            pl.BlockSpec((P, th, 128), lambda i: (0, i, 0)),
            pl.BlockSpec((P, th, 128), lambda i: (0, i, n_lg - 1)),
        ],
        out_specs=[pl.BlockSpec((P, th, bw), lambda i: (0, i, 0))] * 2,
        out_shape=[jax.ShapeDtypeStruct((P, h, bw), x.dtype)] * 2,
    )(x3, x3)
    out_shape = shape[:-1] + (bw,)
    return bl.reshape(out_shape), br.reshape(out_shape)


def _halo_pieces(x, ay: str, ax: str, cols: bool = True, rows: int = 1,
                 interpret: bool = False):
    """Cross-shard halo pieces of a ``(..., h, w)`` block WITHOUT building
    the ``(h+2, w+2)`` padded copy: returns ``(top, bot, lcol, rcol)``
    where top/bot are the ``rows``-row y halos ``(..., rows, w)`` (rows
    > 1 feed k-step temporal blocking) and lcol/rcol are ``(..., h+2,
    1)`` x-halo columns of the 1-row-EXTENDED block, so the four
    diagonal corner cells ride in the columns (same two-phase trick as
    `parallel.halo.pad_halo`). Only O(surface) bytes are copied; the
    body array feeds the kernel directly through BlockSpecs.

    The edge columns are read with the `_edge_cols` Pallas kernel (a jnp
    column slice materializes a transposed copy of the whole array), and
    their corner cells come from ppermuting the columns' own end rows
    along y — exactly the values ``top/bot[..., -1:/:1, -1:/:1]`` hold.

    ``cols=False`` (full-width shards, nx == 1) skips the columns
    entirely: on an nx==1 mesh the column values are just the periodic
    wrap the kernels reproduce with a lane roll."""
    from jrl_lbm_tpu.parallel.halo import _ring_perm

    ny = jax.lax.axis_size(ay)
    nx = jax.lax.axis_size(ax)
    top = jax.lax.ppermute(x[..., -rows:, :], ay, _ring_perm(ny, 1))
    bot = jax.lax.ppermute(x[..., :rows, :], ay, _ring_perm(ny, -1))
    if not cols:
        return top, bot, None, None
    cl, cr = _edge_cols(x, interpret=interpret)
    pdn, pup = _ring_perm(ny, 1), _ring_perm(ny, -1)
    colR = jnp.concatenate(
        [jax.lax.ppermute(cr[..., -1:, :], ay, pdn), cr,
         jax.lax.ppermute(cr[..., :1, :], ay, pup)], axis=-2
    )
    colL = jnp.concatenate(
        [jax.lax.ppermute(cl[..., -1:, :], ay, pdn), cl,
         jax.lax.ppermute(cl[..., :1, :], ay, pup)], axis=-2
    )
    lcol = jax.lax.ppermute(colR, ax, _ring_perm(nx, 1))
    rcol = jax.lax.ppermute(colL, ax, _ring_perm(nx, -1))
    return top, bot, lcol, rcol


def _col_windows(col, th, n_t):
    """Per-tile (th+2)-row windows of an ``(..., h+2, 1)`` halo column,
    stacked to ``(n_t, ..., th+2, 1)`` so each grid tile can BlockSpec
    its own window (the windows overlap by 2 rows, which BlockSpec
    stride rules cannot express directly; the column is O(h) bytes so
    the gather is negligible)."""
    return jnp.stack(
        [
            jax.lax.slice_in_dim(col, i * th, i * th + th + 2, axis=-2)
            for i in range(n_t)
        ],
        axis=0,
    )


@partial(jax.jit, static_argnames=("th", "h", "w", "H", "W", "tau",
                                   "inflow_density", "inflow_vx",
                                   "inflow_vy", "minv_s_m", "interpret"))
def _tiled_block_step(off, flags, f, vel, rho, phi, top, bot, lcol, rcol,
                      th, h, w, H, W, tau,
                      inflow_density, inflow_vx, inflow_vy, minv_s_m,
                      interpret):
    """Row-tiled variant of `_padded_block_step` for per-shard blocks
    beyond VMEM: a grid of (th, w) tiles sweeps the shard. The body
    arrays (f, vel, flags) feed the kernel DIRECTLY via BlockSpecs —
    1-row y halos arrive as 8-row-aligned neighbour blocks of the same
    body array (first/last tiles swap in the `ppermute` halo pieces) and
    the x halo as per-tile column windows — so no stacked or x-padded
    copy of the state is materialized (round-2 made a 12-plane x-padded
    stack per step, ~2x f HBM traffic). Each tile assembles its padded
    (th+2, w+2) planes in VMEM with row/lane concats."""
    A = [[float(minv_s_m[a][b]) for b in range(9)] for a in range(9)]
    FEQ_IN = _feq_terms(inflow_density, inflow_vx, inflow_vy)
    f32 = jnp.float32
    n_t = h // th
    g = th // 8  # tile height in 8-row groups

    # 12-plane convention for the tiny halo pieces: plane 0 = flags (as
    # f32), 1..9 = f, 10..11 = vel. The BODY arrays stay separate and
    # uncopied; only these O(surface) pieces are stacked.
    zero7 = jnp.zeros((12, 7, w), f32)
    top8 = jnp.concatenate([zero7, top], axis=-2)  # (12, 8, w), halo row last
    bot8 = jnp.concatenate([bot, zero7], axis=-2)  # halo row first
    lwin = _col_windows(lcol, th, n_t)  # (n_t, 12, th+2, 1)
    rwin = _col_windows(rcol, th, n_t)

    def kernel(off_ref, fl_ref, f_ref, v_ref, flu_ref, fu_ref, vu_ref,
               fld_ref, fd_ref, vd_ref, top_ref, bot_ref, lw_ref, rw_ref,
               rho_ref, phi_ref, f_out, rho_out, vel_out):
        i = pl.program_id(0)
        first = i == 0
        last = i == n_t - 1

        def rollp(mid, up, dn, plane):
            """Lane-aligned (th+2, w) row window + (th+2, 1) x-halo
            column windows — no (w+2)-wide plane is ever built, so the
            whole tile update stays 128-lane aligned."""
            above = jnp.where(first, top_ref[plane, -1:, :], up[-1:, :])
            below = jnp.where(last, bot_ref[plane, 0:1, :], dn[0:1, :])
            win = jnp.concatenate([above, mid, below], axis=0)
            return _RollPlane(win, lw_ref[0, plane], rw_ref[0, plane],
                              th, w)

        flagsP = rollp(fl_ref[:].astype(f32), flu_ref[:].astype(f32),
                       fld_ref[:].astype(f32), 0)
        fP = [rollp(f_ref[q], fu_ref[q], fd_ref[q], 1 + q)
              for q in range(9)]
        velP = [rollp(v_ref[c], vu_ref[c], vd_ref[c], 10 + c)
                for c in range(2)]
        fs, rho_n, u_x, u_y = _block_update(
            flagsP, fP, velP,
            rho_ref[:], phi_ref[:], th, w, H, W,
            off_ref[0] + i * th, off_ref[1],
            A, FEQ_IN, tau, inflow_density, inflow_vx, inflow_vy,
        )
        for q in range(9):
            f_out[q] = fs[q]
        rho_out[:] = rho_n
        vel_out[0] = u_x
        vel_out[1] = u_y

    def up_map(i):
        return (0, jnp.maximum(i * g - 1, 0), 0)

    def dn_map(i):
        return (0, jnp.minimum((i + 1) * g, h // 8 - 1), 0)

    specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # off
        pl.BlockSpec((th, w), lambda i: (i, 0)),  # flags mid
        pl.BlockSpec((9, th, w), lambda i: (0, i, 0)),  # f mid
        pl.BlockSpec((2, th, w), lambda i: (0, i, 0)),  # vel mid
        pl.BlockSpec((8, w), lambda i: up_map(i)[1:]),  # flags up
        pl.BlockSpec((9, 8, w), up_map),  # f up
        pl.BlockSpec((2, 8, w), up_map),  # vel up
        pl.BlockSpec((8, w), lambda i: dn_map(i)[1:]),  # flags dn
        pl.BlockSpec((9, 8, w), dn_map),  # f dn
        pl.BlockSpec((2, 8, w), dn_map),  # vel dn
        pl.BlockSpec((12, 8, w), lambda i: (0, 0, 0)),  # ppermute top
        pl.BlockSpec((12, 8, w), lambda i: (0, 0, 0)),  # ppermute bot
        pl.BlockSpec((1, 12, th + 2, 1), lambda i: (i, 0, 0, 0)),  # lcol win
        pl.BlockSpec((1, 12, th + 2, 1), lambda i: (i, 0, 0, 0)),  # rcol win
        pl.BlockSpec((th, w), lambda i: (i, 0)),  # rho
        pl.BlockSpec((th, w), lambda i: (i, 0)),  # phi
    ]
    return pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((9, th, w), lambda i: (0, i, 0)),
            pl.BlockSpec((th, w), lambda i: (i, 0)),
            pl.BlockSpec((2, th, w), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, h, w), f32),
            jax.ShapeDtypeStruct((h, w), f32),
            jax.ShapeDtypeStruct((2, h, w), f32),
        ],
        compiler_params=None if interpret else _VMEM_PARAMS,
        interpret=interpret,
    )(off, flags, f, vel, flags, f, vel, flags, f, vel,
      top8, bot8, lwin, rwin, rho, phi)


# ---------------------------------------------------------------------------
# Lean-interior / band-fix split for the sharded path.
#
# The unsharded fused step owes most of its rate to STATIC interior/band
# specialization (docs/PERFORMANCE.md #4): ~95% of rows run a lean
# plain-channel kernel, the full-boundary kernel only touches the
# cylinder/inflow/outflow band. Under shard_map that static split is
# impossible per se — one SPMD program serves every shard and a shard
# only knows its global offset as a traced scalar — so the sharded
# analog is dynamic:
#
#   1. a row-tiled LEAN kernel sweeps the whole shard treating every row
#      as a plain channel row (side walls at global x=0/W-1, the INFLOW
#      plug at global y=0 and the OUTFLOW copy at y=H-1 as row-masked
#      selects, FLUID elsewhere; f in, f+macro out — no
#      flags/vel/phi/rho traffic);
#   2. for the STATIC cylinder +- margin row region, a `lax.cond`-gated
#      WINDOW pass recomputes the shard's intersection with the full
#      `_block_update` from the pre-step state and
#      `dynamic_update_slice`s the rows into the lean output. Shards
#      that do not intersect skip the kernel at runtime and pay only an
#      nb-row slice copy.
#
# Lean output on cylinder-band rows is garbage by design; the window
# pass rewrites every such row (the region mirrors
# fused_step._band_tiles: margin=4 rows past the surface so all
# sub-grid-interp/SFC-stencil-affected rows are recomputed).
# ---------------------------------------------------------------------------


def _lean_block_update(wins, lcws, rcws, row0, col0, rows, w, H, W, A,
                       wall_density, feq_in, x_whole, x_ext=0):
    """Plain-channel update (OBSTACLE side walls at global x=0/W-1, the
    INFLOW plug row at global y=0, the OUTFLOW copy row at y=H-1, all
    other cells FLUID) on a (rows, w) tile — the sharded twin of
    `fused_step._lean_step_rows` (same reference semantics:
    `propagation.cu:84-87` reflect-clamp + half-way bounce,
    `propagation.cu:195-377` OUTFLOW/INFLOW, `LBM_collision_MRT_2d.py`
    MRT). The y-border rules are row-masked selects off the tile's
    global row offset — cheap enough to fold into the lean sweep, which
    removes two of the three band-fix windows. ``wins`` are (rows+2, w)
    row windows per population; ``lcws/rcws`` the (rows+2, 1)
    cross-shard x-halo columns (unused when ``x_whole``: the shard spans
    the full global width, so x pulls are plain rolls). Each x pull
    costs ONE roll: the single wrong lane (shard edge) is patched from a
    column — the cross-shard halo column, or the reflect-clamp column
    rows[:, 1] / rows[:, w-2] when this shard owns the global wall.

    ``x_ext`` > 0 selects the EXTENDED-WINDOW mode for k-step temporal
    blocking on nx > 1 meshes: the window is ``x_ext`` extra lanes wide
    on each side (filled by the caller with the x neighbours' edge
    blocks via ppermute — the global periodic ring, so even the wall
    shards' extensions hold the reference's wrap values), ``w`` is the
    FULL extended width and ``col0`` the extension's global column. x
    pulls are then plain periodic rolls; the global-wall clamp-reflect
    (`propagation.cu:84-87`) is applied through the gx == 0 / W-1 masks
    with the reflect value read at the STATIC lane the wall owner sees
    it at (x_ext + 1 / w - x_ext - 2). The roll wrap corrupts at most
    one extension-edge lane per temporal level, so after k <= x_ext
    levels the central ``w - 2*x_ext`` lanes are exact; the caller
    slices them out."""
    gx = col0 + jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
    gy = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows, w), 0)
    at_x0 = gx == 0
    at_xW = gx == W - 1
    is_obs = at_x0 | at_xW
    nbr_lo = gx == 1
    nbr_hi = gx == W - 2
    lx = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
    is_left = col0 == 0  # scalar: this shard owns the global left wall
    is_right = col0 + w == W

    f_mid = [wins[q][1 : 1 + rows, :] for q in range(9)]

    def pull(q):
        ex, ey = int(E[q, 0]), int(E[q, 1])
        yrows = wins[q][1 - ey : 1 - ey + rows, :]
        if ex == 0:
            return yrows
        base = pltpu.roll(yrows, ex % w, axis=1)
        if x_ext:
            # extended window: the roll already carried real neighbour
            # data across the shard edge; only the global-wall
            # clamp-reflect remains, applied via the gx masks (the
            # reflect value sits at a STATIC lane for the wall owner)
            if ex == 1:
                return jnp.where(at_x0, yrows[:, x_ext + 1 : x_ext + 2],
                                 base)
            return jnp.where(
                at_xW, yrows[:, w - x_ext - 2 : w - x_ext - 1], base
            )
        if ex == 1:  # lane 0 is wrong: wall col 0 reflect-clamps to
            # col 1, interior shard edges pull from the left shard
            refl = yrows[:, 1:2]
            col = refl if x_whole else jnp.where(
                is_left, refl, lcws[q][1 - ey : 1 - ey + rows, :]
            )
            return jnp.where(lx == 0, col, base)
        refl = yrows[:, w - 2 : w - 1]
        col = refl if x_whole else jnp.where(
            is_right, refl, rcws[q][1 - ey : 1 - ey + rows, :]
        )
        return jnp.where(lx == w - 1, col, base)

    raw_in = [f_mid[0]] + [pull(q) for q in range(1, 9)]
    f_new = [raw_in[0]]
    for q in range(1, 9):
        ex = int(E[q, 0])
        streamed = raw_in[q]
        if ex == 1:  # pull neighbour is the left wall: half-way bounce
            streamed = jnp.where(nbr_lo, f_mid[int(REFL[q])], streamed)
        elif ex == -1:
            streamed = jnp.where(nbr_hi, f_mid[int(REFL[q])], streamed)
        f_new.append(jnp.where(is_obs, raw_in[int(REFL[q])], streamed))

    # INFLOW plug row (global y=0; the corner wall cells stay is_obs) and
    # OUTFLOW inward copy (y=H-1 pulls all 9 from y=H-2) — same order as
    # `_block_update`; the macro/MRT below then see the patched planes
    not_obs = jnp.logical_not(is_obs)
    in_mask = (gy == 0) & not_obs
    of_mask = (gy == H - 1) & not_obs
    for q in range(9):
        g = jnp.where(in_mask, feq_in[q], f_new[q])
        f_new[q] = jnp.where(of_mask, pltpu.roll(g, 1, axis=0), g)

    macro_rho = f_new[0]
    for q in range(1, 9):
        macro_rho = macro_rho + f_new[q]
    rho_n = jnp.where(is_obs, wall_density, macro_rho)
    mom_x = f_new[1] - f_new[3] + f_new[5] - f_new[6] - f_new[7] + f_new[8]
    mom_y = f_new[2] - f_new[4] + f_new[5] + f_new[6] - f_new[7] - f_new[8]
    safe_rho = jnp.where(rho_n == 0, 1.0, rho_n)
    u_x = jnp.where(is_obs, 0.0, mom_x / safe_rho)
    u_y = jnp.where(is_obs, 0.0, mom_y / safe_rho)
    f_out = [None] * 9
    _mrt_apply(A, f_new, _feq_terms(rho_n, u_x, u_y), is_obs, f_out)
    return f_out, rho_n, u_x, u_y


@partial(jax.jit, static_argnames=("th", "h", "w", "H", "W",
                                   "wall_density", "inflow_density",
                                   "inflow_vx", "inflow_vy", "minv_s_m",
                                   "k", "x_whole", "x_ext", "interpret"))
def _lean_tiled_step(off, f, topf, botf, lwinf, rwinf, lext, rext,
                     th, h, w, H, W,
                     wall_density, inflow_density, inflow_vx, inflow_vy,
                     minv_s_m, k, x_whole, x_ext, interpret):
    """Row-tiled lean pass over the whole shard (incl. the y-border
    INFLOW/OUTFLOW rules as row-masked selects), advancing ``k`` lattice
    steps per call (overlapped temporal blocking as
    `fused_step._make_interior_kernel2`: level lvl = k-1..0 computes
    th+2*lvl rows, each level's output is the next level's padded input;
    k > 1 needs full-width shards OR the extended-window mode).
    Cylinder-band rows come out wrong and are rewritten by
    `_apply_window_fix`. ``x_whole`` (static) marks shards spanning the
    full global width (nx == 1 meshes): x pulls then need no cross-shard
    columns at all. ``x_ext`` > 0 (static) selects the extended-window
    mode for k > 1 on nx > 1 meshes: each tile's planes are widened by
    the per-tile ``lext/rext`` neighbour edge-block windows ((n_t, 9,
    th+2k, x_ext)) and every temporal level computes the full extended
    width; the central w lanes are exact after k <= x_ext levels and are
    sliced into the outputs."""
    assert x_whole or k == 1 or k <= x_ext, \
        "k-step lean needs full-width shards or x_ext >= k"
    assert 1 <= k <= 8  # halo rows ride in 8-row neighbour groups
    A = [[float(minv_s_m[a][b]) for b in range(9)] for a in range(9)]
    FEQ_IN = _feq_terms(inflow_density, inflow_vx, inflow_vy)
    f32 = jnp.float32
    n_t = h // th
    g = th // 8

    def kernel(off_ref, f_ref, fu_ref, fd_ref, top_ref, bot_ref,
               *col_refs_and_outs):
        if x_whole:
            f_out, rho_out, vel_out = col_refs_and_outs
            lw_ref = rw_ref = None
        else:
            lw_ref, rw_ref, f_out, rho_out, vel_out = col_refs_and_outs
        i = pl.program_id(0)
        first = i == 0
        last = i == n_t - 1

        def win(q):
            above = jnp.where(first, top_ref[q, -k:, :], fu_ref[q][-k:, :])
            below = jnp.where(last, bot_ref[q, :k, :], fd_ref[q][:k, :])
            mid = jnp.concatenate([above, f_ref[q], below], axis=0)
            if x_ext:
                return jnp.concatenate(
                    [lw_ref[0, q], mid, rw_ref[0, q]], axis=1
                )
            return mid

        wins = [win(q) for q in range(9)]  # (th + 2k, w + 2*x_ext)
        lcws = rcws = None
        if not x_whole and not x_ext:
            lcws = [lw_ref[0, q] for q in range(9)]
            rcws = [rw_ref[0, q] for q in range(9)]
        wf = w + 2 * x_ext
        for lvl in range(k - 1, -1, -1):
            rows = th + 2 * lvl
            fs, rho_n, u_x, u_y = _lean_block_update(
                wins, lcws, rcws, off_ref[0] + i * th - lvl,
                off_ref[1] - x_ext,
                rows, wf, H, W, A, wall_density, FEQ_IN, x_whole, x_ext,
            )
            wins = fs  # (rows, wf) == the next level's (rows-2)+2 window
        if x_ext:
            fs = [a[:, x_ext : x_ext + w] for a in fs]
            rho_n = rho_n[:, x_ext : x_ext + w]
            u_x = u_x[:, x_ext : x_ext + w]
            u_y = u_y[:, x_ext : x_ext + w]
        for q in range(9):
            f_out[q] = fs[q]
        rho_out[:] = rho_n
        vel_out[0] = u_x
        vel_out[1] = u_y

    def up_map(i):
        return (0, jnp.maximum(i * g - 1, 0), 0)

    def dn_map(i):
        return (0, jnp.minimum((i + 1) * g, h // 8 - 1), 0)

    specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # off
        pl.BlockSpec((9, th, w), lambda i: (0, i, 0)),  # f mid
        pl.BlockSpec((9, 8, w), up_map),  # f up
        pl.BlockSpec((9, 8, w), dn_map),  # f dn
        pl.BlockSpec((9, 8, w), lambda i: (0, 0, 0)),  # ppermute top
        pl.BlockSpec((9, 8, w), lambda i: (0, 0, 0)),  # ppermute bot
    ]
    args = [off, f, f, f, topf, botf]
    if x_ext:
        specs += [
            pl.BlockSpec((1, 9, th + 2 * k, x_ext),
                         lambda i: (i, 0, 0, 0)),  # left ext windows
            pl.BlockSpec((1, 9, th + 2 * k, x_ext),
                         lambda i: (i, 0, 0, 0)),  # right ext windows
        ]
        args += [lext, rext]
    elif not x_whole:
        specs += [
            pl.BlockSpec((1, 9, th + 2, 1), lambda i: (i, 0, 0, 0)),  # lcol
            pl.BlockSpec((1, 9, th + 2, 1), lambda i: (i, 0, 0, 0)),  # rcol
        ]
        args += [lwinf, rwinf]
    return pl.pallas_call(
        kernel,
        grid=(n_t,),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((9, th, w), lambda i: (0, i, 0)),
            pl.BlockSpec((th, w), lambda i: (i, 0)),
            pl.BlockSpec((2, th, w), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, h, w), f32),
            jax.ShapeDtypeStruct((h, w), f32),
            jax.ShapeDtypeStruct((2, h, w), f32),
        ],
        compiler_params=None if interpret else _VMEM_PARAMS,
        interpret=interpret,
    )(*args)


@partial(jax.jit, static_argnames=("nb", "w", "H", "W", "tau",
                                   "inflow_density", "inflow_vx",
                                   "inflow_vy", "minv_s_m", "k",
                                   "x_whole", "x_ext", "interpret"))
def _window_full_step(woff, st, lcw, rcw, nb, w, H, W, tau,
                      inflow_density, inflow_vx, inflow_vy, minv_s_m,
                      k, x_whole, x_ext, interpret):
    """k chained full `_block_update` steps on an (nb, w) row window
    whose padded state arrives pre-sliced: ``st`` stacks 14 planes
    (flags-as-f32, f x9, vel x2, phi, rho — rows [b0-k, b0+nb+k)),
    (nb+2k, w) each, or (nb+2k, w + 2*x_ext) in the extended-window
    mode (``x_ext`` > 0: the caller pre-concatenates the neighbour edge
    blocks at the jnp level — an in-kernel lane concat of slices at
    differing sublane offsets has no Mosaic lowering — every level
    computes the full extended width, and the central w lanes — exact
    after k <= x_ext levels — are sliced into the outputs). ``lcw/rcw``
    are the (nb+2, 1) cross-shard x-halo columns for planes 0..11
    (non-ext nx > 1 mode, k == 1 only); None when ``x_whole``
    (full-width shards use periodic lane rolls) or ``x_ext``. ``woff``
    is the window's global (row, col) offset. Sub-step level ``lvl``
    (k-1 .. 0) computes rows [b0-lvl, b0+nb+lvl): each level's output
    is exactly the next level's padded input window — same overlapped
    temporal blocking as `fused_step._make_interior_kernel2`, with the
    FULL boundary update per sub-step."""
    assert x_whole or k == 1 or k <= x_ext, \
        "k-step windows need full-width shards or x_ext >= k"
    A = [[float(minv_s_m[a][b]) for b in range(9)] for a in range(9)]
    FEQ_IN = _feq_terms(inflow_density, inflow_vx, inflow_vy)
    f32 = jnp.float32
    wf = w + 2 * x_ext
    wrap = x_whole or x_ext > 0

    def kernel(off_ref, st_ref, *rest):
        if wrap:
            f_out, rho_out, vel_out = rest
            lw_ref = rw_ref = None
        else:
            lw_ref, rw_ref, f_out, rho_out, vel_out = rest

        fwin = vwin = rwin = None
        for lvl in range(k - 1, -1, -1):
            rows = nb + 2 * lvl
            s = k - lvl - 1  # window start index inside the st planes

            def wp(arr, plane, _rows=rows):
                if wrap:
                    return _WrapPlane(arr, _rows, wf)
                return _RollPlane(arr, lw_ref[plane], rw_ref[plane],
                                  _rows, w)

            if fwin is None:  # first level reads the st planes
                fP = [wp(st_ref[1 + q][s : s + rows + 2, :], 1 + q)
                      for q in range(9)]
                velP = [wp(st_ref[10 + c][s : s + rows + 2, :], 10 + c)
                        for c in range(2)]
                rho_prev = st_ref[13][s + 1 : s + 1 + rows, :]
            else:  # previous level's (rows+2, wf) outputs ARE the window
                fP = [wp(fwin[q], 1 + q) for q in range(9)]
                velP = [wp(vwin[c], 10 + c) for c in range(2)]
                rho_prev = rwin[1:-1, :]
            flagsP = wp(st_ref[0][s : s + rows + 2, :], 0)
            phi_l = st_ref[12][s + 1 : s + 1 + rows, :]
            fs, rho_n, u_x, u_y = _block_update(
                flagsP, fP, velP, rho_prev, phi_l, rows, wf, H, W,
                off_ref[0] - lvl, off_ref[1] - x_ext,
                A, FEQ_IN, tau, inflow_density, inflow_vx, inflow_vy,
            )
            fwin, vwin, rwin = fs, [u_x, u_y], rho_n
        if x_ext:
            fwin = [a[:, x_ext : x_ext + w] for a in fwin]
            rwin = rwin[:, x_ext : x_ext + w]
            vwin = [a[:, x_ext : x_ext + w] for a in vwin]
        for q in range(9):
            f_out[q] = fwin[q]
        rho_out[:] = rwin
        vel_out[0] = vwin[0]
        vel_out[1] = vwin[1]

    n_in = 1 if wrap else 3
    args = (woff, st) if wrap else (woff, st, lcw, rcw)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((9, nb, w), f32),
            jax.ShapeDtypeStruct((nb, w), f32),
            jax.ShapeDtypeStruct((2, nb, w), f32),
        ],
        compiler_params=None if interpret else _VMEM_PARAMS,
        interpret=interpret,
    )(*args)


def _apply_window_fix(region, row0, col0, flags, f, vel, rho, phi,
                      top, bot, lcol, rcol, lblk, rblk, f1, rho1, vel1,
                      h, w, H, W, tau, inflow_density, inflow_vx,
                      inflow_vy, minv_s_m, k, x_whole, x_ext, interpret):
    """Recompute this shard's intersection with the static global row
    region ``[gr0, gr1)`` using k chained full steps, writing the rows
    into the lean outputs (f1, rho1, vel1). Gated by `lax.cond`: a shard
    that does not intersect pays only the window slice copies.

    ``top/bot`` are the 14-plane k-row ppermute pieces (flags, f x9,
    vel x2, phi, rho); ``lblk/rblk`` the y-EXTENDED 14-plane neighbour
    edge blocks ((14, h+2k, x_ext), extended-window mode only)."""
    gr0, gr1 = region
    nb = gr1 - gr0  # static, 8-aligned, <= h - 2k (checked by caller)
    f32 = jnp.float32
    pred = (row0 < gr1) & (row0 + h > gr0)
    b0 = jnp.clip(jnp.int32(gr0) - row0, 0, h - nb)
    ext = nb + 2 * k
    # (nb+2k)-row windows of the pre-step state rows [b0-k, b0+nb+k);
    # the clamped slice start keeps the slice in-bounds, the two
    # `where`s swap in the ppermute pieces for the virtual rows beyond
    # the shard. b0 is 8-aligned and k <= 8, so the only possible shifts
    # are exactly -k (b0 == 0) and +k (b0 + nb == h).
    c = jnp.clip(b0 - k, 0, h - ext)
    wfl = jax.lax.dynamic_slice(flags, (c, 0), (ext, w)).astype(f32)
    wf = jax.lax.dynamic_slice(f, (0, c, 0), (9, ext, w))
    wv = jax.lax.dynamic_slice(vel, (0, c, 0), (2, ext, w))
    wphi = jax.lax.dynamic_slice(phi, (c, 0), (ext, w))
    wrho = jax.lax.dynamic_slice(rho, (c, 0), (ext, w))
    st = jnp.concatenate(
        [wfl[None], wf, wv, wphi[None], wrho[None]], axis=0
    )  # (14, nb+2k, w)
    if x_ext:
        # widen every plane with the neighbour edge-block windows HERE
        # (an in-kernel lane concat of slices at differing sublane
        # offsets has no Mosaic lowering). The y-extended blocks cover
        # global rows [row0-k, row0+h+k): body row r = block row r + k,
        # so body rows [c, c+ext) = block rows [c+k, c+k+ext), and the
        # row-swap pieces (top/bot) widen with the blocks' own end rows.
        lw = jax.lax.dynamic_slice(lblk, (0, c + k, 0), (14, ext, x_ext))
        rw = jax.lax.dynamic_slice(rblk, (0, c + k, 0), (14, ext, x_ext))
        st = jnp.concatenate([lw, st, rw], axis=-1)  # (14, ext, w+2*x_ext)
        top = jnp.concatenate([lblk[:, :k, :], top, rblk[:, :k, :]],
                              axis=-1)
        bot = jnp.concatenate([lblk[:, -k:, :], bot, rblk[:, -k:, :]],
                              axis=-1)
    st = jnp.where(b0 == 0,
                   jnp.concatenate([top, st[:, :-k]], axis=1), st)
    st = jnp.where(b0 + nb == h,
                   jnp.concatenate([st[:, k:], bot], axis=1), st)
    lcw = rcw = None
    if not x_ext and not x_whole:
        # lcol row 0 is global row -1, so offset b0 = rows [b0-1, b0+nb+1)
        lcw = jax.lax.dynamic_slice(lcol, (0, b0, 0), (12, nb + 2, 1))
        rcw = jax.lax.dynamic_slice(rcol, (0, b0, 0), (12, nb + 2, 1))
    cur = (
        jax.lax.dynamic_slice(f1, (0, b0, 0), (9, nb, w)),
        jax.lax.dynamic_slice(rho1, (b0, 0), (nb, w)),
        jax.lax.dynamic_slice(vel1, (0, b0, 0), (2, nb, w)),
    )
    woff = jnp.stack([row0 + b0, col0]).astype(jnp.int32)

    def fix(_):
        return _window_full_step(
            woff, st, lcw, rcw, nb, w, H, W, tau,
            inflow_density, inflow_vx, inflow_vy, minv_s_m, k, x_whole,
            x_ext, interpret,
        )

    fw, rw, vw = jax.lax.cond(pred, fix, lambda _: cur, None)
    f1 = jax.lax.dynamic_update_slice(f1, fw, (0, b0, 0))
    rho1 = jax.lax.dynamic_update_slice(rho1, rw, (b0, 0))
    vel1 = jax.lax.dynamic_update_slice(vel1, vw, (0, b0, 0))
    return f1, rho1, vel1


def _fix_regions(cfg, margin=4.0):
    """Static 8-aligned global row regions where the lean pass is wrong:
    the cylinder +- margin group (same margin as
    `fused_step._band_tiles`). The y-border INFLOW/OUTFLOW rows are
    handled inside the lean kernel itself (row-masked selects), so they
    need no fix window."""
    H, _ = cfg.res
    cy = cfg.center[1]
    r = cfg.D / 2.0
    c0 = max(0, int((cy - r - margin) // 8) * 8)
    c1 = min(H, int(-((cy + r + margin) // -8)) * 8)
    return [(c0, c1)] if c1 > c0 else []


def _pick_tile_rows(h, w):
    """None (single-tile fits VMEM) or the largest multiple-of-8 tile
    height <= 64 that divides h."""
    if (h + 2) * (w + 2) <= MAX_SINGLE_TILE_CELLS:
        return None
    if h % 8:
        raise ValueError(
            f"per-shard block of {h} rows x {w} cols exceeds the "
            f"single-tile VMEM budget and h is not a multiple of 8"
        )
    th = 64
    while h % th:
        th //= 2
    return th


def make_sharded_fused_cylinder_step(cfg, mesh, interpret: bool = False,
                                     tile_rows=0, lean_split=None,
                                     lean_x_whole=None, lean_k=None,
                                     lean_x_ext=None, lean_x_halo=None):
    """Sharded fused step: `ppermute` halos + one Pallas call per shard.

    Same (state, fields) -> state contract as
    `parallel.sharded.make_sharded_cylinder_step`, with the entire
    per-shard update fused into a single kernel — except that the
    returned step advances ``step.k`` lattice steps per call (k > 1 =
    temporal blocking; use `make_sharded_fused_cylinder_runner` to
    advance arbitrary step counts). ``interpret=True`` runs the kernel
    in interpret mode (for CPU-mesh equivalence tests).

    ``tile_rows``: 0 (default) auto-selects — one whole-block kernel per
    shard while the padded block fits the VMEM budget, the row-tiled
    grid kernel beyond it; ``None`` forces single-tile; an explicit
    multiple of 8 forces that tile height.

    ``lean_split``: None (default) auto-enables the lean-interior /
    band-fix split (the sharded analog of the unsharded interior/band
    specialization) when the shard geometry allows it; True forces it
    (raises if ineligible); False keeps the full-boundary kernel on
    every row (the pre-split behavior, kept for A/B and small shards).

    ``lean_k``: lattice steps per pass on the lean-split path (temporal
    blocking; k-row ppermute halos). k > 1 needs full-width (nx == 1)
    shards OR the extended-window mode (below). None = 1.

    ``lean_x_ext``: extension width (lanes per side) for the
    EXTENDED-WINDOW temporal-blocking mode, which brings k > 1 to
    nx > 1 (2D) meshes: each shard ppermutes its ``x_ext``-wide edge
    blocks to its x neighbours, the lean/window kernels compute every
    temporal level on width w + 2*x_ext, and the central w lanes —
    exact after k <= x_ext levels — are sliced out. None = auto: 128
    (one lane group, keeping every vector op aligned) when nx > 1 and
    lean_k > 1, else 0 (off). Explicit values let tests use tiny widths
    and let a 1x1 mesh force the mode for A/B timing (the ring ppermute
    then wraps to the shard itself — the periodic values x_whole mode
    reproduces with rolls).

    ``lean_x_halo``: lanes actually TRANSFERRED per x neighbour in the
    extended-window mode (must be >= lean_k; the received block is
    zero-padded outward to ``x_ext`` lanes in VMEM, and the zero
    garbage — like the roll wrap — contaminates < x_halo lanes over k
    levels, never reaching the body). None = auto: min(x_ext, 8), which
    cuts the modelled ICI bytes 16x vs shipping the full 128-lane
    alignment block while k stays <= 8.
    """
    from jrl_lbm_tpu.parallel.halo import pad_halo
    from jrl_lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y
    from jax.sharding import PartitionSpec as P

    H, W = cfg.res
    ny, nx = mesh.devices.shape
    assert H % ny == 0 and W % nx == 0, "grid must tile the mesh"
    h, w = H // ny, W // nx
    assert h >= 3 and w >= 3, "blocks must be at least 3 cells wide"
    lean_k = 1 if lean_k is None else int(lean_k)
    assert 1 <= lean_k <= 8
    if lean_x_ext is None:
        x_ext = 128 if (nx > 1 and lean_k > 1) else 0
    else:
        x_ext = int(lean_x_ext)
    assert not (x_ext and lean_x_whole), \
        "extended-window mode and x_whole are mutually exclusive"
    x_halo = (min(x_ext, 8) if lean_x_halo is None else int(lean_x_halo))
    assert x_ext == 0 or lean_k <= x_halo <= x_ext, \
        "need lean_k <= x_halo <= x_ext"
    # lean wrongness spreads (k-1) rows past the single-step band reach,
    # so the fix region widens with k (margin 4 mirrors _band_tiles)
    regions = _fix_regions(cfg, margin=4.0 + (lean_k - 1))
    lean_ok = (
        h % 8 == 0
        and w % 8 == 0
        and max((hi - lo for lo, hi in regions), default=0)
        <= h - 2 * lean_k
        and (
            (x_ext == 0 and (nx == 1
                             or (lean_k == 1 and lean_x_whole is not True)))
            or (lean_k <= x_ext <= w)
        )
    )
    if lean_split is None:
        lean_split = lean_ok
    elif lean_split and not lean_ok:
        raise ValueError(
            f"lean_split needs 8-aligned shards with h - 2k >= the largest "
            f"band region (and nx == 1 or k <= x_ext <= w for k > 1); got "
            f"h={h}, w={w}, k={lean_k}, x_ext={x_ext}, regions={regions}"
        )
    if lean_split:
        lean_th = tile_rows if tile_rows else 64
        while h % lean_th:
            lean_th //= 2
    if tile_rows == 0:
        tile_rows = _pick_tile_rows(h, w)
    if tile_rows is not None and (tile_rows % 8 or h % tile_rows):
        raise ValueError(f"tile_rows={tile_rows} must be a multiple of 8 "
                         f"dividing the per-shard rows {h}")
    minv_s_m, _ = _collide.mrt_matrices(cfg.tau)
    minv_t = tuple(tuple(float(x) for x in row) for row in minv_s_m)
    iv = (0.0, float(cfg.Vmax))  # reference inflow plug (+y)

    def local_step(f, rho, vel, flags, phi_obs):
        row0 = jax.lax.axis_index(AXIS_Y) * h
        col0 = jax.lax.axis_index(AXIS_X) * w
        off = jnp.stack([row0, col0]).astype(jnp.int32)
        if lean_split:
            f32 = jnp.float32
            x_whole = ((nx == 1 and x_ext == 0) if lean_x_whole is None
                       else lean_x_whole)
            assert not (x_whole and nx > 1), "x_whole needs full-width shards"
            k = lean_k
            cols = not x_whole and not x_ext
            tf, bf, lf, rf = _halo_pieces(
                flags.astype(f32)[None], AXIS_Y, AXIS_X,
                cols=cols, rows=k, interpret=interpret,
            )
            tF, bF, lF, rF = _halo_pieces(f, AXIS_Y, AXIS_X,
                                          cols=cols, rows=k,
                                          interpret=interpret)
            tv, bv, lv, rv = _halo_pieces(vel, AXIS_Y, AXIS_X,
                                          cols=cols, rows=k,
                                          interpret=interpret)
            tp, bp, _, _ = _halo_pieces(phi_obs[None], AXIS_Y, AXIS_X,
                                        cols=False, rows=k)
            tr, br, _, _ = _halo_pieces(rho[None], AXIS_Y, AXIS_X,
                                        cols=False, rows=k)
            top = jnp.concatenate([tf, tF, tv, tp, tr], axis=0)
            bot = jnp.concatenate([bf, bF, bv, bp, br], axis=0)
            lcol = rcol = None
            zerop = jnp.zeros((9, 8 - k, w), f32)
            topf = jnp.concatenate([zerop, top[1:10]], axis=-2)
            botf = jnp.concatenate([bot[1:10], zerop], axis=-2)
            lwinf = rwinf = lext = rext = lblk14 = rblk14 = None
            if x_ext:
                from jrl_lbm_tpu.parallel.halo import _ring_perm

                pxl = _ring_perm(nx, 1)
                pxr = _ring_perm(nx, -1)
                pyd = _ring_perm(ny, 1)
                pyu = _ring_perm(ny, -1)

                def xblocks(x):
                    """y-EXTENDED (..., h+2k, x_ext) neighbour edge
                    blocks: x-ppermute the x_halo-wide edge lane blocks,
                    y-ppermute their end rows (two-phase: diagonal
                    corner data rides the second hop), then zero-pad
                    outward to the x_ext alignment width (the zeros,
                    like the roll wrap, stay >= x_halo - k lanes away
                    from the body after k levels)."""
                    xl, xr = _edge_blocks(x, x_halo, interpret=interpret)
                    lb = jax.lax.ppermute(xr, AXIS_X, pxl)
                    rb = jax.lax.ppermute(xl, AXIS_X, pxr)

                    def yext(b):
                        return jnp.concatenate(
                            [jax.lax.ppermute(b[..., -k:, :], AXIS_Y, pyd),
                             b,
                             jax.lax.ppermute(b[..., :k, :], AXIS_Y, pyu)],
                            axis=-2,
                        )

                    lb, rb = yext(lb), yext(rb)
                    if x_halo < x_ext:
                        z = jnp.zeros(
                            lb.shape[:-1] + (x_ext - x_halo,), lb.dtype
                        )
                        # real data must sit adjacent to the body: last
                        # lanes of the left block, first of the right
                        lb = jnp.concatenate([z, lb], axis=-1)
                        rb = jnp.concatenate([rb, z], axis=-1)
                    return lb, rb

                lbF, rbF = xblocks(f)
                lbfl, rbfl = xblocks(flags.astype(f32)[None])
                lbv, rbv = xblocks(vel)
                lbp, rbp = xblocks(phi_obs[None])
                lbr, rbr = xblocks(rho[None])
                lblk14 = jnp.concatenate([lbfl, lbF, lbv, lbp, lbr], axis=0)
                rblk14 = jnp.concatenate([rbfl, rbF, rbv, rbp, rbr], axis=0)
                n_lt = h // lean_th
                lext = jnp.stack(
                    [jax.lax.slice_in_dim(lbF, i * lean_th,
                                          i * lean_th + lean_th + 2 * k,
                                          axis=-2)
                     for i in range(n_lt)], axis=0)
                rext = jnp.stack(
                    [jax.lax.slice_in_dim(rbF, i * lean_th,
                                          i * lean_th + lean_th + 2 * k,
                                          axis=-2)
                     for i in range(n_lt)], axis=0)
            elif not x_whole:
                lcol = jnp.concatenate([lf, lF, lv], axis=0)
                rcol = jnp.concatenate([rf, rF, rv], axis=0)
                lwinf = _col_windows(lcol[1:10], lean_th, h // lean_th)
                rwinf = _col_windows(rcol[1:10], lean_th, h // lean_th)
            f1, rho1, vel1 = _lean_tiled_step(
                off, f, topf, botf, lwinf, rwinf, lext, rext,
                lean_th, h, w, H, W,
                float(cfg.density), float(cfg.density), iv[0], iv[1],
                minv_t, k, x_whole, x_ext, interpret,
            )
            for region in regions:
                f1, rho1, vel1 = _apply_window_fix(
                    region, row0, col0, flags, f, vel, rho, phi_obs,
                    top, bot, lcol, rcol, lblk14, rblk14, f1, rho1, vel1,
                    h, w, H, W, float(cfg.tau), float(cfg.density),
                    iv[0], iv[1], minv_t, k, x_whole, x_ext, interpret,
                )
            return f1, rho1, vel1
        if tile_rows is not None:
            # O(surface) halo pieces only — the body arrays are NOT
            # copied or padded (they BlockSpec straight into the kernel)
            f32 = jnp.float32
            tf, bf, lf, rf = _halo_pieces(
                flags.astype(f32)[None], AXIS_Y, AXIS_X, interpret=interpret
            )
            tF, bF, lF, rF = _halo_pieces(f, AXIS_Y, AXIS_X,
                                          interpret=interpret)
            tv, bv, lv, rv = _halo_pieces(vel, AXIS_Y, AXIS_X,
                                          interpret=interpret)
            top = jnp.concatenate([tf, tF, tv], axis=0)
            bot = jnp.concatenate([bf, bF, bv], axis=0)
            lcol = jnp.concatenate([lf, lF, lv], axis=0)
            rcol = jnp.concatenate([rf, rF, rv], axis=0)
            return _tiled_block_step(
                off, flags, f, vel, rho, phi_obs, top, bot, lcol, rcol,
                tile_rows, h, w, H, W,
                float(cfg.tau), float(cfg.density), iv[0], iv[1], minv_t,
                interpret,
            )
        fp = pad_halo(f, AXIS_Y, AXIS_X)
        velp = pad_halo(vel, AXIS_Y, AXIS_X)
        flagsp = pad_halo(flags, AXIS_Y, AXIS_X)
        return _padded_block_step(
            off, flagsp, fp, velp, rho, phi_obs, h, w, H, W,
            float(cfg.tau), float(cfg.density), iv[0], iv[1], minv_t,
            interpret,
        )

    spec2 = P(AXIS_Y, AXIS_X)
    spec3 = P(None, AXIS_Y, AXIS_X)
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # metadata, so the shard_map vma checker cannot type them
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(spec3, spec2, spec3, spec2, spec2),
        out_specs=(spec3, spec2, spec3),
        check_vma=False,
    )

    def step(state, fields):
        f, rho, vel = sharded(
            state["f"], state["rho"], state["vel"],
            fields["flags"], fields["phi_obs"],
        )
        return {"f": f, "rho": rho, "vel": vel}

    step.k = lean_k if lean_split else 1
    return step


def make_sharded_fused_cylinder_runner(cfg, mesh, interpret: bool = False,
                                       tile_rows=0, lean_split=None,
                                       lean_x_whole=None, lean_k=None,
                                       lean_x_ext=None, lean_x_halo=None):
    stepk = make_sharded_fused_cylinder_step(cfg, mesh, interpret=interpret,
                                             tile_rows=tile_rows,
                                             lean_split=lean_split,
                                             lean_x_whole=lean_x_whole,
                                             lean_k=lean_k,
                                             lean_x_ext=lean_x_ext,
                                             lean_x_halo=lean_x_halo)
    jstepk = jax.jit(stepk)
    jstep1 = jstepk
    if stepk.k > 1:  # trailing sub-k remainder steps
        jstep1 = jax.jit(make_sharded_fused_cylinder_step(
            cfg, mesh, interpret=interpret, tile_rows=tile_rows,
            lean_split=lean_split, lean_x_whole=lean_x_whole, lean_k=1,
            lean_x_ext=lean_x_ext, lean_x_halo=lean_x_halo))

    def run(state, fields, n: int):
        m = n
        while m >= stepk.k:
            state = jstepk(state, fields)
            m -= stepk.k
        for _ in range(m):
            state = jstep1(state, fields)
        return state

    return run
