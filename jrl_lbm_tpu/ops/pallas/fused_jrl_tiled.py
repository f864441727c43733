"""Row-tiled fused kernels for the JRL axisymmetric fluid phase at scales
beyond VMEM (refine >= 8).

`ops/pallas/fused_jrl.py` holds the whole state in VMEM for a multi-step
stretch — unbeatable for the small JRL grids, but a 1024x512 (refine 8)
domain needs ~244 MB of scoped VMEM against the chip's 128 MB (measured:
`RESOURCE_EXHAUSTED, used 243.56M of 128.00M`). This module keeps the
state in HBM and tiles each step over row-blocks, with y-halos expressed
as BlockSpec neighbour blocks (the `fused_step.py` pattern) so Mosaic
double-buffers all block DMA behind compute.

The step is split into TWO kernels because the axisymmetric BGK source
(`LBM_collision_2d.py:343-427`) applies grad/div stencils to the
POST-macro (rho, vel) — a single-call tile would need 2-deep halos and a
recomputed ring. Split, each kernel needs only the standard 1-row halo:

* kernel A: streaming (reflect-clamp + x=0 axis mirroring + sub-grid
  interpolation bounce + OBSTACLE store + OUTFLOW copy,
  `propagation.cu`) -> moving-tip solid-fluid coupling
  (`solid_fluid_coupling.cu`) -> macro moments;
* kernel B: BGK collision with the full axisymmetric LINE_X_EQ_0 source
  (A1/A2/F2 with obstacle-pair-blocked stencils).

The moving-tip geometry (flags, phi, obs_vel) is ANALYTIC — recomputed
per tile from global coordinates and the SMEM step index, including on
halo rows, so no geometry arrays ever cross HBM. Reference call stack:
`demo_2d_LBM_JRL_fluid_*.py:201-236`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jrl_lbm_tpu import lattice
from jrl_lbm_tpu.utils.types import CellType

FLUID = int(CellType.FLUID)
OBSTACLE = int(CellType.OBSTACLE)
OUTFLOW = int(CellType.OUTFLOW)

E = lattice.E
REFL = lattice.REFLECT
MX = lattice.MIRROR_X
AXIS_X_IN = lattice.AXIS_X_IN
AXIS_X_OUT = lattice.AXIS_X_OUT
W_Q = lattice.W
CS2 = 1.0 / 3.0

# the stitched-block temporaries exceed Mosaic's default 16 MB scoped
# limit at TH=64 x W=512 (measured 19.99M); the chip has 128 MB
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# Python-float reciprocals of the lattice constants: TPU VPU divides
# cost ~8 issue slots vs 1 for a multiply (validation/roofline.py), so
# every divide-by-constant is folded to a reciprocal multiply at trace
# time. ULP-level departure from the reference's `x / cs2` only
# (collision_2d.cu:297-300); covered by the 2e-5 oracle tolerances.
_ICS2 = 1.0 / CS2
_HICS2 = 0.5 / CS2
_HICS4 = 0.5 / (CS2 * CS2)
_I12 = 1.0 / 12.0


def _feq9(rho, ux, uy):
    """D2Q9 equilibrium, CSE'd across directions (r5 compute diet).

    Restructure of the per-q `rho*w*(1 + eu/CS2 + 0.5*eu^2/CS2^2 -
    0.5*u^2/CS2)` loop (reference collision_2d.cu:297-300): the u^2
    term is q-independent, REFL pairs share eu up to sign — IEEE
    negation is sign-symmetric, so `0.5*(-eu)*(-eu) == 0.5*eu*eu`
    exactly — rho*w is shared per weight class, and the /CS2 family is
    folded into reciprocal constants. 27 divides -> 0. The q=0
    linear/quadratic terms are exact +-0 that `1.0 + ...` absorbs.
    """
    uv = ux * ux + uy * uy
    c = uv * _HICS2
    s = ux + uy
    d = ux - uy
    a_x, a_y = ux * _ICS2, uy * _ICS2
    a_s, a_d = s * _ICS2, d * _ICS2
    b_x = (ux * ux) * _HICS4
    b_y = (uy * uy) * _HICS4
    b_s = (s * s) * _HICS4
    b_d = (d * d) * _HICS4
    r0 = rho * float(W_Q[0])
    r1 = rho * float(W_Q[1])
    r5 = rho * float(W_Q[5])
    return [
        r0 * (1.0 - c),
        r1 * (1.0 + a_x + b_x - c),
        r1 * (1.0 + a_y + b_y - c),
        r1 * (1.0 - a_x + b_x - c),
        r1 * (1.0 - a_y + b_y - c),
        r5 * (1.0 + a_s + b_s - c),
        r5 * (1.0 - a_d + b_d - c),
        r5 * (1.0 - a_s + b_s - c),
        r5 * (1.0 + a_d + b_d - c),
    ]


class _TileCtx:
    """Per-tile masks + pull/stencil helpers over [TH+2, W] padded planes.

    Pull semantics are the tile re-expression of `ops/stream.py::_pull`
    (streaming, reflect-clamp + x=0 axis collapse) and
    `ops/stencil.py::_at` (minmax clamp) — global y periodicity for FLUID
    cells comes from the BlockSpec wrap of the neighbour blocks.

    Single-pass merged form (r5 compute diet): instead of evaluating a
    fluid and a non-fluid variant of every read and selecting per cell,
    the boundary redirects are applied as destination-masked overrides
    (`at_y0 & ~is_fluid` etc.) on ONE evaluation. All x shifts are
    lane-rolls of the full PADDED plane, memoized per (plane, shift) —
    rolls commute with row-slicing, so every direction's read is a row
    slice of one of <= 2 rolled copies per plane, and both `pull` and
    `at_` share them. Bit-exact vs the two-variant form: the y-override
    is selected AFTER the x roll from the same rolled plane (the
    override source row is y-uniform per destination row, and roll acts
    within rows), and each mask condition reproduces exactly the cells
    the old per-variant select routed to that value.
    """

    def __init__(self, TH, W, at_y0, at_yH, at_x0, at_xW, is_fluid):
        # at_y0/at_yH may be None: STATIC no-y-edge mode for the lean
        # interior-tile kernels (the masks would be all-false there;
        # None elides the override selects at trace time instead of
        # emitting dead select_n ops)
        self.TH, self.W = TH, W
        self.at_y0, self.at_yH = at_y0, at_yH
        self.at_x0, self.at_xW = at_x0, at_xW
        self.is_fluid = is_fluid
        nf = jnp.logical_not(is_fluid)
        self.at_y0_nf = None if at_y0 is None else at_y0 & nf
        self.at_yH_nf = None if at_yH is None else at_yH & nf
        self.at_xW_nf = at_xW & nf
        self._rolled = {}  # (id(pad), shift) -> (pad ref, rolled plane)
        self._memo = {}  # (kind, id(pad), ...) -> (pad ref, result)

    def rows(self, pad, yo):
        return pad[1 + yo : 1 + yo + self.TH, :]

    def _xroll(self, pad, shift):
        if shift == 0:
            return pad
        key = (id(pad), shift)
        hit = self._rolled.get(key)
        if hit is None:
            hit = (pad, pltpu.roll(pad, shift, axis=1))
            self._rolled[key] = hit
        return hit[1]

    def _pull_piece(self, pad, shift, ey):
        """rows(xroll(pad, shift), -ey) with the non-fluid y-edge
        redirects of `ops/stream.py::_pull` (row 0 pulls row 1, row H-1
        pulls row H-2) applied as destination-masked overrides."""
        key = ("p", id(pad), shift, ey)
        hit = self._memo.get(key)
        if hit is None:
            rp = self._xroll(pad, shift)
            v = self.rows(rp, -ey)
            if ey == 1 and self.at_y0_nf is not None:
                v = jnp.where(self.at_y0_nf, self.rows(rp, 1), v)
            elif ey == -1 and self.at_yH_nf is not None:
                v = jnp.where(self.at_yH_nf, self.rows(rp, -1), v)
            self._memo[key] = (pad, v)
            return v
        return hit[1]

    def pull(self, pad, ex, ey):
        """Streamed income: value from (y - ey, x - ex)."""
        key = ("pull", id(pad), ex, ey)
        hit = self._memo.get(key)
        if hit is not None:
            return hit[1]
        v = self._pull_piece(pad, ex % self.W if ex else 0, ey)
        if ex == 1:  # x=0 symmetry axis collapse (always on for JRL)
            v = jnp.where(self.at_x0, self._pull_piece(pad, 0, ey), v)
        elif ex == -1:  # col W-1 pulls from W-2 (non-fluid only)
            v = jnp.where(self.at_xW_nf, self._pull_piece(pad, 1, ey), v)
        self._memo[key] = (pad, v)
        return v

    def pull_x0(self, pad, ey):
        """`pull(pad, 1, ey)` restricted to at_x0 destinations, where
        the axis collapse reduces it to the un-rolled y-fixed rows —
        used for the x=0 mirror-population reads so they cost no roll
        (values off column 0 are discarded by the caller's mask)."""
        return self._pull_piece(pad, 0, ey)

    def _at_piece(self, pad, shift, sy):
        """rows(xroll(pad, shift), sy) with the non-fluid y-edge clamps
        of `ops/stencil.py::_at` (rows 0 / H-1 clamp to their own row)."""
        key = ("a", id(pad), shift, sy)
        hit = self._memo.get(key)
        if hit is None:
            rp = self._xroll(pad, shift)
            v = self.rows(rp, sy)
            if sy == -1 and self.at_y0_nf is not None:
                v = jnp.where(self.at_y0_nf, self.rows(rp, 0), v)
            elif sy == 1 and self.at_yH_nf is not None:
                v = jnp.where(self.at_yH_nf, self.rows(rp, 0), v)
            self._memo[key] = (pad, v)
            return v
        return hit[1]

    def at_(self, pad, sx, sy):
        """Stencil read: value from (y + sy, x + sx), minmax clamp."""
        key = ("at", id(pad), sx, sy)
        hit = self._memo.get(key)
        if hit is not None:
            return hit[1]
        v = self._at_piece(pad, (-sx) % self.W if sx else 0, sy)
        if sx == -1:  # axis collapse == min clamp at col 0
            v = jnp.where(self.at_x0, self._at_piece(pad, 0, sy), v)
        elif sx == 1:  # col W-1 clamps to itself (non-fluid only)
            v = jnp.where(self.at_xW_nf, self._at_piece(pad, 0, sy), v)
        self._memo[key] = (pad, v)
        return v


def _geometry(cfg_c, gy, gx, walks, walks_int):
    """Analytic flags/phi/obs-velocity at the given global coordinates.

    ``cfg_c`` is the dict of baked Python constants; gy/gx may cover halo
    rows (already wrapped mod H). Mirrors the geometry section of
    `fused_jrl._make_jrl_fluid_kernel` / `models/jrl.py::make_fluid_step`.
    """
    H = cfg_c["H"]
    rg = cfg_c["rg"]
    box_r = cfg_c["box_r"]
    vel_obs = cfg_c["vel_obs"]
    flat = cfg_c["flat"]
    xs = gx.astype(jnp.float32) + 0.5
    ys = gy.astype(jnp.float32) + 0.5
    at_yH = gy == H - 1

    tx = (xs - (rg - box_r)) - box_r
    ty = (ys - (walks - box_r)) - box_r
    ty_top = -(ys - float(H))
    if flat:
        phi = jnp.minimum(jnp.maximum(tx, ty), ty_top)
        tip = (gy < walks_int) & (gx < jnp.int32(rg))
        obs_v1 = jnp.where(tip, vel_obs, 0.0)
    else:
        align = (xs + ys - (rg + walks)) * (1.0 / jnp.sqrt(2.0))
        phi = jnp.minimum(jnp.maximum(ty, align), ty_top)
        tip = phi <= 0
        obs_v1 = jnp.where(tip & ~at_yH, vel_obs, 0.0)
    # base flags: top row OBSTACLE, col 0 FLUID (axis), row 0 / col W-1
    # OUTFLOW, interior FLUID (`models/jrl.py::fluid_base_flags`)
    base = jnp.where(
        at_yH,
        OBSTACLE,
        jnp.where(
            gx == 0,
            FLUID,
            jnp.where((gy == 0) | (gx == cfg_c["W"] - 1), OUTFLOW, FLUID),
        ),
    )
    flags = jnp.where(tip, OBSTACLE, base)
    return flags, phi, tip, obs_v1


def _fluid_a_update(cfg_c, rows, t0, walks, walks_int, f_pad, vel_pad,
                    rho_mid, gx0=0, wf=None):
    """Streaming + solid-fluid coupling + macro on a ``rows``-row window.

    Window-parametric body shared by the single-step kernel A and the
    k-step temporally-blocked kernel. ``t0`` is the (possibly negative)
    global row of output row 0 — all masks and the analytic geometry are
    computed on gy mod H, so windows that wrap past the domain edge
    (outer temporal-blocking levels) stay exact. ``f_pad`` is a list of
    nine (rows+2, W) planes, ``vel_pad`` a pair, ``rho_mid`` (rows, W).
    Returns (f_new list, rho_n, un0, un1) on the ``rows`` extent.

    ``gx0``/``wf`` window-parametrize the x axis for 2D (nx > 1) domain
    decomposition (fused_jrl_sharded extended-window mode): the planes
    are ``wf`` lanes wide and lane 0 sits at global column ``gx0`` (a
    traced scalar). All x masks compare gx = gx0 + lane against the
    GLOBAL width; x rolls wrap within the window, which corrupts only
    the outermost extension lane per step — exact for the central body
    lanes the caller slices out (and for gx0=0, wf=W this is the
    original full-width behavior, rolls wrapping the real x edges whose
    lanes the at_x0/at_xW masks override).
    Reference stack: `propagation.cu` -> `solid_fluid_coupling.cu` ->
    macro moments (`demo_2d_LBM_JRL_fluid_*.py:201-236`)."""
    H, W = cfg_c["H"], cfg_c["W"]
    if wf is None:
        wf = W
    tau = cfg_c["tau"]
    vel_obs = cfg_c["vel_obs"]
    flat = cfg_c["flat"]
    eps = 1e-10

    gy = jax.lax.rem(
        t0 + jax.lax.broadcasted_iota(jnp.int32, (rows, wf), 0) + H, H
    )
    gx = gx0 + jax.lax.broadcasted_iota(jnp.int32, (rows, wf), 1)
    at_y0 = gy == 0
    at_yH = gy == H - 1
    at_x0 = gx == 0
    at_xW = gx == W - 1
    gy_p = jax.lax.rem(
        t0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (rows + 2, wf), 0) + H, H
    )
    gx_p = gx0 + jax.lax.broadcasted_iota(jnp.int32, (rows + 2, wf), 1)

    # one geometry evaluation on the padded coords; the mid-row planes
    # are row slices of it (gy_p[1:-1] == gy by construction)
    flags_p, phi_p, tip_p, obs_v1_p = _geometry(
        cfg_c, gy_p, gx_p, walks, walks_int)
    flags, phi, tip, obs_v1 = (
        flags_p[1:-1, :], phi_p[1:-1, :], tip_p[1:-1, :], obs_v1_p[1:-1, :])
    obs_pad = (flags_p == OBSTACLE).astype(jnp.float32)

    is_fluid = flags == FLUID
    is_obs = flags == OBSTACLE
    of_mask = flags == OUTFLOW
    ctx = _TileCtx(rows, wf, at_y0, at_yH, at_x0, at_xW, is_fluid)

    # tip-overwritten velocity (padded; mid planes are row slices);
    # `make_fluid_step`: flat overwrites (0, vel_obs) in the block,
    # wedge overwrites with obs_vel (top row excluded)
    vel_p0, vel_p1 = vel_pad
    vel_p0 = jnp.where(tip_p, 0.0, vel_p0)
    if flat:
        vel_p1 = jnp.where(tip_p, vel_obs, vel_p1)
        obs_v1_full_p = jnp.where(tip_p, vel_obs, 0.0)
    else:
        vel_p1 = jnp.where(tip_p, obs_v1_p, vel_p1)
        obs_v1_full_p = obs_v1_p
    vel0_m = vel_p0[1:-1, :]
    vel1_m = vel_p1[1:-1, :]
    obs_v1_full = obs_v1_full_p[1:-1, :]

    fq = [f_pad[q][1:-1, :] for q in range(9)]

    # ---- streaming (pull + axis mirroring + sub-grid bounce) ----
    # interpolation weights shared across all 8 directions (phi is
    # direction-independent)
    t = phi
    w1a = 2.0 * t - 1.0
    w1b = 2.0 - 2.0 * t
    w2a = 2.0 * t
    w2b = 1.0 - 2.0 * t
    in_v1 = (t >= 0.5) & (t <= 1.0)
    in_v2 = (t >= 0.0) & (t <= 0.5)
    raw_in = [fq[0]] + [None] * 8
    streamed = [fq[0]] + [None] * 8
    for q in range(1, 9):
        ex, ey = int(E[q, 0]), int(E[q, 1])
        val = ctx.pull(f_pad[q], ex, ey)
        if q in AXIS_X_IN:
            # the mirror pull is consumed only at at_x0 destinations,
            # where the ex=1 axis collapse makes it the un-rolled
            # y-fixed base — no lane roll needed (see _TileCtx.pull_x0)
            val = jnp.where(at_x0, ctx.pull_x0(f_pad[int(MX[q])], ey), val)
        raw_in[q] = val
        nbr_obs = ctx.pull(obs_pad, ex, ey) > 0.5
        f_this = fq[int(REFL[q])]
        nxt = ctx.pull(f_pad[int(REFL[q])], -ex, -ey)
        if q in AXIS_X_OUT:
            oq = int(MX[q])
            nxt = jnp.where(
                at_x0, ctx.pull_x0(f_pad[int(REFL[oq])], -ey), nxt
            )
        v1 = w1a * val + w1b * f_this
        v2 = w2a * f_this + w2b * nxt
        v_obs = jnp.where(in_v1, v1, jnp.where(in_v2, v2, f_this))
        streamed[q] = jnp.where(nbr_obs, v_obs, val)

    f_new = [fq[0]]
    for p in range(1, 9):
        f_new.append(jnp.where(is_obs, raw_in[int(REFL[p])], streamed[p]))

    # OUTFLOW: copy all 9 from the inward neighbour (within-window).
    # OUTFLOW cells exist only on global row 0 and column W-1 (the top
    # row is OBSTACLE and column 0 is the FLUID axis, `_geometry`), so
    # the at_yH / at_x0 copies of the full 4-direction form are dead —
    # of_mask never holds there.
    for q in range(9):
        g = f_new[q]
        g = jnp.where(at_y0, pltpu.roll(g, rows - 1, axis=0), g)
        g = jnp.where(at_xW, pltpu.roll(g, 1, axis=1), g)
        f_new[q] = jnp.where(of_mask, g, f_new[q])

    # ---- solid-fluid coupling (moving tip) ----
    # q=0 is statically dropped from the neighbour scan: its
    # self-is-obstacle mask is identically zero (matches fused_jrl's
    # zero mask), so every q=0 accumulator term is an exact +-0 that
    # the sums absorb. The obstacle x-velocity is identically zero for
    # this geometry (`_geometry` only ever sets the y component), so
    # the obs_ux terms are statically dropped too.
    t_ok = (phi > -eps) & (phi <= 1.0 + eps)
    skip = is_obs | at_xW | at_yH
    rho_tgt = f_new[0]
    for q in range(1, 9):
        rho_tgt = rho_tgt + f_new[q]
    vel_tgt_x = jnp.zeros((rows, wf), jnp.float32)
    vel_tgt_y = jnp.zeros((rows, wf), jnp.float32)
    count = jnp.zeros((rows, wf), jnp.float32)
    valid = [jnp.zeros((rows, wf), bool)]
    for q in range(1, 9):
        ex, ey = int(E[q, 0]), int(E[q, 1])
        nbr_obs = ctx.at_(obs_pad, ex, ey) > 0.5
        v_q = nbr_obs & t_ok
        valid.append(v_q)
        vmask = v_q.astype(jnp.float32)
        count = count + vmask
        tq = jnp.where(v_q, phi, 0.0)
        ux = ctx.at_(vel_p0, -ex, -ey)
        uy = ctx.at_(vel_p1, -ex, -ey)
        if q in AXIS_X_IN:
            ux = jnp.where(at_x0, -ux, ux)
        obs_uy = ctx.at_(obs_v1_full_p, ex, ey)
        # one reciprocal per q shared by both components (divides cost
        # ~8 slots; the vmask product commutes with the scale exactly)
        inv_den = 1.0 / (tq + 1.0)
        vel_tgt_x = vel_tgt_x + vmask * (tq * ux) * inv_den
        vel_tgt_y = vel_tgt_y + vmask * (tq * uy + obs_uy) * inv_den
        qi = int(REFL[q])
        e1i = float(E[qi, 1])
        if e1i != 0.0:
            rho_tgt = rho_tgt + vmask * 6.0 * float(W_Q[q]) * (e1i * obs_uy)
    safe_count = jnp.where(count > 0, count, 1.0)
    inv_cnt = 1.0 / safe_count
    u0 = vel_tgt_x * inv_cnt
    u1 = vel_tgt_y * inv_cnt

    def grad12(pad):
        gxx = (
            4.0 * (ctx.at_(pad, 1, 0) - ctx.at_(pad, -1, 0))
            + (ctx.at_(pad, 1, 1) - ctx.at_(pad, -1, 1))
            + (ctx.at_(pad, 1, -1) - ctx.at_(pad, -1, -1))
        ) * _I12
        gyy = (
            4.0 * (ctx.at_(pad, 0, 1) - ctx.at_(pad, 0, -1))
            + (ctx.at_(pad, 1, 1) - ctx.at_(pad, 1, -1))
            + (ctx.at_(pad, -1, 1) - ctx.at_(pad, -1, -1))
        ) * _I12
        return gxx, gyy

    g00, g01 = grad12(vel_p0)
    g10, g11 = grad12(vel_p1)
    # noneq pressure-tensor terms are q-independent; pab and its
    # divided form depend only on (e0^2, e1^2, e0*e1) — 5 classes over
    # the 9 directions (REFL pairs share), each computed once. Terms
    # whose per-q Python coefficient is exactly 0 are dropped (the old
    # tree added an exact +-0 there).
    t1 = u0 * u0 - CS2 * tau * (g00 + g00)
    t2 = u1 * u0 - CS2 * tau * (g10 + g01)
    t3 = u0 * u1 - CS2 * tau * (g01 + g10)
    t4 = u1 * u1 - CS2 * tau * (g11 + g11)
    skip_n = jnp.logical_not(skip)
    pab_memo = {}
    wrho_memo = {}
    for q in range(1, 9):
        qi = int(REFL[q])
        e0, e1 = float(E[qi, 0]), float(E[qi, 1])
        c1, c2, c3, c4 = e0 * e0 - CS2, e1 * e0, e0 * e1, e1 * e1 - CS2
        pkey = (c1, c2, c3, c4)
        p_term = pab_memo.get(pkey)
        if p_term is None:
            pab = t1 * c1
            if c2 != 0.0:
                pab = pab + t2 * c2
            if c3 != 0.0:
                pab = pab + t3 * c3
            pab = pab + t4 * c4
            p_term = pab * _HICS4
            pab_memo[pkey] = p_term
        if e1 == 0.0:
            m = _ICS2 * (u0 * e0)
        elif e0 == 0.0:
            m = _ICS2 * (u1 * e1)
        else:
            m = _ICS2 * (u0 * e0 + u1 * e1)
        w = float(W_Q[qi])
        wrho = wrho_memo.get(w)
        if wrho is None:
            wrho = w * rho_tgt
            wrho_memo[w] = wrho
        recon = wrho * (1.0 + m + p_term)
        f_new[qi] = jnp.where(valid[q] & skip_n, recon, f_new[qi])

    # ---- macro (OBSTACLE passthrough of pre-macro rho / tip vel) ----
    macro_rho = f_new[0]
    for q in range(1, 9):
        macro_rho = macro_rho + f_new[q]
    rho_n = jnp.where(is_obs, rho_mid, macro_rho)
    mom_x = f_new[1] - f_new[3] + f_new[5] - f_new[6] - f_new[7] + f_new[8]
    mom_y = f_new[2] - f_new[4] + f_new[5] + f_new[6] - f_new[7] - f_new[8]
    safe_rho = jnp.where(rho_n == 0, 1.0, rho_n)
    inv_rho = 1.0 / safe_rho
    un0 = jnp.where(is_obs, vel0_m, mom_x * inv_rho)
    un1 = jnp.where(is_obs, vel1_m, mom_y * inv_rho)
    return f_new, rho_n, un0, un1


def _make_kernel_a(cfg_c, TH, tile_map, shard=False, xw=None):
    """Streaming + solid-fluid coupling + macro over one TH-row tile.

    ``shard=True`` builds the per-shard variant (fused_jrl_sharded.py):
    the kernel gains an SMEM global-row-offset scalar and (11, 8, W)
    cross-shard y-halo piece blocks (f x9 + vel x2, real row adjacent to
    the body) that replace the within-shard BlockSpec wrap on the
    first/last tiles — the `fused_sharded._lean_tiled_step` pattern.

    ``xw=(x_ext, w)`` (shard-only) selects the EXTENDED-WINDOW 2D-mesh
    mode: the off scalar gains the shard's global column, the kernel
    gains per-tile ``(1, planes, TH+2, x_ext)`` x-neighbour extension
    windows (real data adjacent to the body, as
    `fused_sharded._lean_tiled_step`), every plane is lane-concatenated
    to width w + 2*x_ext, the update runs window-parametric in x, and
    the central w body lanes are sliced into the outputs."""
    vel_obs = cfg_c["vel_obs"]
    inflow_h = cfg_c["inflow_h"]
    assert xw is None or shard, "xw mode is shard-only"
    x_ext, w_body = xw if xw else (0, cfg_c["W"])
    wf = w_body + 2 * x_ext

    def kernel(*refs):
        lw_ref = rw_ref = None
        if shard and xw:
            (step_ref, off_ref, f_tp, f_m, f_bt, vel_tp, vel_m, vel_bt,
             rho_blk, tpP, btP, lw_ref, rw_ref,
             f_out, rho_out, vel_out) = refs
        elif shard:
            (step_ref, off_ref, f_tp, f_m, f_bt, vel_tp, vel_m, vel_bt,
             rho_blk, tpP, btP, f_out, rho_out, vel_out) = refs
        else:
            (step_ref, f_tp, f_m, f_bt, vel_tp, vel_m, vel_bt, rho_blk,
             f_out, rho_out, vel_out) = refs
            tpP = btP = None
        pid = pl.program_id(0)
        t0 = tile_map(pid) * TH
        first = last = None
        gx0 = 0
        if shard:
            t0 = t0 + off_ref[0]
            first = pid == 0
            last = pid == pl.num_programs(0) - 1
            if xw:
                gx0 = off_ref[1] - x_ext

        def stitch(tp, mid_, bt, pi):
            top = tp[..., -1:, :]
            bot = bt[..., 0:1, :]
            if shard:
                top = jnp.where(first, tpP[pi, -1:, :], top)
                bot = jnp.where(last, btP[pi, 0:1, :], bot)
            rows_w = jnp.concatenate([top, mid_, bot], axis=-2)
            if xw:
                rows_w = jnp.concatenate(
                    [lw_ref[0, pi], rows_w, rw_ref[0, pi]], axis=-1
                )
            return rows_w

        step_idx = step_ref[0, 0]
        walks = inflow_h + step_idx * vel_obs
        walks_int = jnp.floor(walks + 0.5).astype(jnp.int32)

        f_pad = [stitch(f_tp[q], f_m[q], f_bt[q], q) for q in range(9)]
        vel_pad = (
            stitch(vel_tp[0], vel_m[0], vel_bt[0], 9),
            stitch(vel_tp[1], vel_m[1], vel_bt[1], 10),
        )
        rho_mid = rho_blk[:]
        if xw:
            # rho has no halo: it only passes through at OBSTACLE cells,
            # and the extension lanes' outputs are discarded below
            z = jnp.zeros((TH, x_ext), jnp.float32)
            rho_mid = jnp.concatenate([z, rho_mid, z], axis=-1)
        f_new, rho_n, un0, un1 = _fluid_a_update(
            cfg_c, TH, t0, walks, walks_int, f_pad, vel_pad, rho_mid,
            gx0=gx0, wf=wf if xw else None,
        )
        if xw:
            f_new = [a[:, x_ext : x_ext + w_body] for a in f_new]
            rho_n = rho_n[:, x_ext : x_ext + w_body]
            un0 = un0[:, x_ext : x_ext + w_body]
            un1 = un1[:, x_ext : x_ext + w_body]
        for q in range(9):
            f_out[q] = f_new[q]
        rho_out[:] = rho_n
        vel_out[0] = un0
        vel_out[1] = un1

    return kernel


def _make_kernel_b(cfg_c, TH, tile_map, shard=False, xw=None):
    """Axisymmetric BGK collision over one TH-row tile (post-macro
    stencils on the stitched rho/vel neighbour blocks).

    ``shard=True``: SMEM row offset + (3, 8, W) cross-shard y-halo
    pieces (rho + vel x2), as `_make_kernel_a`. ``xw=(x_ext, w)``:
    extended-window 2D-mesh mode — per-tile (1, 3, TH+2, x_ext)
    rho/vel extension windows; f is LOCAL to the collision, so its
    extension lanes are zero-filled and the body lanes sliced out."""
    vel_obs = cfg_c["vel_obs"]
    inflow_h = cfg_c["inflow_h"]
    assert xw is None or shard, "xw mode is shard-only"
    x_ext, w_body = xw if xw else (0, cfg_c["W"])
    wf = w_body + 2 * x_ext

    def kernel(*refs):
        lw_ref = rw_ref = None
        if shard and xw:
            (step_ref, off_ref, f_m, rho_tp, rho_m, rho_bt, vel_tp, vel_m,
             vel_bt, tpP, btP, lw_ref, rw_ref, f_out) = refs
        elif shard:
            (step_ref, off_ref, f_m, rho_tp, rho_m, rho_bt, vel_tp, vel_m,
             vel_bt, tpP, btP, f_out) = refs
        else:
            (step_ref, f_m, rho_tp, rho_m, rho_bt, vel_tp, vel_m, vel_bt,
             f_out) = refs
            tpP = btP = None
        pid = pl.program_id(0)
        t0 = tile_map(pid) * TH
        first = last = None
        gx0 = 0
        if shard:
            t0 = t0 + off_ref[0]
            first = pid == 0
            last = pid == pl.num_programs(0) - 1
            if xw:
                gx0 = off_ref[1] - x_ext

        def stitch(tp, mid_, bt, pi):
            top = tp[..., -1:, :]
            bot = bt[..., 0:1, :]
            if shard:
                top = jnp.where(first, tpP[pi, -1:, :], top)
                bot = jnp.where(last, btP[pi, 0:1, :], bot)
            rows_w = jnp.concatenate([top, mid_, bot], axis=-2)
            if xw:
                rows_w = jnp.concatenate(
                    [lw_ref[0, pi], rows_w, rw_ref[0, pi]], axis=-1
                )
            return rows_w

        step_idx = step_ref[0, 0]
        walks = inflow_h + step_idx * vel_obs
        walks_int = jnp.floor(walks + 0.5).astype(jnp.int32)

        fq = [f_m[q] for q in range(9)]
        if xw:
            z = jnp.zeros((TH, x_ext), jnp.float32)
            fq = [jnp.concatenate([z, a, z], axis=-1) for a in fq]
        f_new = _fluid_b_update(
            cfg_c, TH, t0, walks, walks_int, fq,
            stitch(rho_tp[:], rho_m[:], rho_bt[:], 0),
            (stitch(vel_tp[0], vel_m[0], vel_bt[0], 1),
             stitch(vel_tp[1], vel_m[1], vel_bt[1], 2)),
            gx0=gx0, wf=wf if xw else None,
        )
        if xw:
            f_new = [a[:, x_ext : x_ext + w_body] for a in f_new]
        for q in range(9):
            f_out[q] = f_new[q]

    return kernel


def _fluid_b_update(cfg_c, rows, t0, walks, walks_int, fq, rho_pad,
                    vel_pad, gx0=0, wf=None):
    """Axisymmetric BGK collision on a ``rows``-row window (post-macro
    stencils on the padded rho/vel planes). Window-parametric body
    shared by the single-step kernel B and the k-step kernel; same
    wrap-safe gy-mod-H convention as `_fluid_a_update`. ``fq`` is the
    post-stream f list (rows, W); ``rho_pad``/(vel_pad pair) are
    (rows+2, W). Reference: `LBM_collision_2d.py:343-427`."""
    H, W = cfg_c["H"], cfg_c["W"]
    if wf is None:
        wf = W
    tau = cfg_c["tau"]
    fy = cfg_c["fy"]
    eps = 1e-10

    gy = jax.lax.rem(
        t0 + jax.lax.broadcasted_iota(jnp.int32, (rows, wf), 0) + H, H
    )
    gx = gx0 + jax.lax.broadcasted_iota(jnp.int32, (rows, wf), 1)
    at_y0 = gy == 0
    at_yH = gy == H - 1
    at_x0 = gx == 0
    at_xW = gx == W - 1
    xs = gx.astype(jnp.float32) + 0.5
    gy_p = jax.lax.rem(
        t0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (rows + 2, wf), 0) + H, H
    )
    gx_p = gx0 + jax.lax.broadcasted_iota(jnp.int32, (rows + 2, wf), 1)
    xs_p = gx_p.astype(jnp.float32) + 0.5

    flags_p, _, _, _ = _geometry(cfg_c, gy_p, gx_p, walks, walks_int)
    flags = flags_p[1:-1, :]  # gy_p[1:-1] == gy by construction
    obs_pad = (flags_p == OBSTACLE).astype(jnp.float32)
    is_fluid = flags == FLUID
    is_obs = flags == OBSTACLE
    ctx = _TileCtx(rows, wf, at_y0, at_yH, at_x0, at_xW, is_fluid)

    no8 = {
        (sx, sy): ctx.at_(obs_pad, sx, sy) > 0.5
        for sx in (-1, 0, 1)
        for sy in (-1, 0, 1)
        if (sx, sy) != (0, 0)
    }

    rho_p = rho_pad
    vel_p0, vel_p1 = vel_pad
    rho_n = rho_p[1:-1, :]
    un0 = vel_p0[1:-1, :]
    un1 = vel_p1[1:-1, :]

    # feq with the Guo half-force shift (constant body force (0, fy))
    safe_rho = jnp.where(rho_n == 0, 1.0, rho_n)
    sh = jnp.where(rho_n <= eps, 0.0, 0.5 * fy / safe_rho)
    feq_n = _feq9(rho_n, un0, un1 + sh)

    r = xs
    ur = un0
    # reciprocals of the radius cover every /r in the source terms
    # (A1, mu/r, ur/r, the 1/(2r) of A2): 4 divides -> 2. Mosaic
    # gotchas (r5, bisected on-chip): the numerators must be
    # materialized ones planes (`1.0 / xs_p` scalar-over-iota hits the
    # array.h:480 limits<=dim CHECK), and the mid-rows reciprocal must
    # NOT be a row slice of the padded one (slicing the row-constant
    # lazy quotient hits the same CHECK) — so inv_r is its own divide.
    inv_xs_p = jnp.ones((rows + 2, wf), jnp.float32) / xs_p
    inv_r = jnp.ones((rows, wf), jnp.float32) / xs
    A1_pad = (-rho_p * vel_p0) * inv_xs_p
    A1 = A1_pad[1:-1, :]
    visc = CS2 * (tau - 0.5)
    mu = visc * rho_n
    pressure_pad = rho_p * CS2
    mom0_pad = rho_p * vel_p0 * vel_p0
    mom1_pad = rho_p * vel_p0 * vel_p1

    def grad_blocked(pad, want_gy=False):
        def val(sx, sy):
            return ctx.at_(pad, sx, sy)

        gxx = jnp.zeros((rows, wf), jnp.float32)
        bx = jnp.zeros((rows, wf), bool)
        p = no8[(1, 0)] | no8[(-1, 0)]
        gxx = gxx + jnp.where(p, 0.0, 4.0 * (val(1, 0) - val(-1, 0)))
        bx = bx | p
        p = no8[(1, 1)] | no8[(-1, 1)]
        gxx = gxx + jnp.where(p, 0.0, val(1, 1) - val(-1, 1))
        bx = bx | p
        p = no8[(-1, -1)] | no8[(1, -1)]
        gxx = gxx + jnp.where(p, 0.0, val(1, -1) - val(-1, -1))
        bx = bx | p
        gxx = jnp.where(bx | is_obs, 0.0, gxx) * _I12
        if not want_gy:  # 3 of 4 call sites discard gyy
            return gxx, None

        gyy = jnp.zeros((rows, wf), jnp.float32)
        by = jnp.zeros((rows, wf), bool)
        p = no8[(0, 1)] | no8[(0, -1)]
        gyy = gyy + jnp.where(p, 0.0, 4.0 * (val(0, 1) - val(0, -1)))
        by = by | p
        p = no8[(1, 1)] | no8[(1, -1)]
        gyy = gyy + jnp.where(p, 0.0, val(1, 1) - val(1, -1))
        by = by | p
        p = no8[(-1, 1)] | no8[(-1, -1)]
        gyy = gyy + jnp.where(p, 0.0, val(-1, 1) - val(-1, -1))
        by = by | p
        gyy = jnp.where(by | is_obs, 0.0, gyy) * _I12
        return gxx, gyy

    def div_free(m0_pad, m1_pad):
        d = 4.0 * (ctx.at_(m0_pad, 1, 0) - ctx.at_(m0_pad, -1, 0))
        d = d + ctx.at_(m0_pad, 1, 1) - ctx.at_(m0_pad, -1, 1)
        d = d + ctx.at_(m0_pad, 1, -1) - ctx.at_(m0_pad, -1, -1)
        d = d + 4.0 * (ctx.at_(m1_pad, 0, 1) - ctx.at_(m1_pad, 0, -1))
        d = d + ctx.at_(m1_pad, 1, 1) - ctx.at_(m1_pad, 1, -1)
        d = d + ctx.at_(m1_pad, -1, 1) - ctx.at_(m1_pad, -1, -1)
        return jnp.where(is_obs, 0.0, d * _I12)

    gu_x, _ = grad_blocked(vel_p0)
    gv_x, _ = grad_blocked(vel_p1)
    gp_x, _ = grad_blocked(pressure_pad)
    div_m = div_free(mom0_pad, mom1_pad)
    A2 = (gp_x + div_m) * (0.5 * inv_r)
    ga1_x, ga1_y = grad_blocked(A1_pad, want_gy=True)
    mu_r = mu * inv_r
    F2_0 = mu_r * (gu_x - ur * inv_r) + un0 * A1 - (tau - 1.0) * CS2 * ga1_x
    F2_1 = mu_r * gv_x + un1 * A1 - (tau - 1.0) * CS2 * ga1_y

    # Gq source, CSE'd across directions: the e.F2 projection depends
    # on e only up to sign within REFL pairs (IEEE negation is
    # sign-symmetric), so 4 scaled forms cover q=1..8; q=0's projection
    # is an exact +-0 the sum absorbs. Same scheme as _feq9.
    inv_tau = 1.0 / tau
    base_g = A1 + A2
    g_x = F2_0 * _ICS2
    g_y = F2_1 * _ICS2
    g_s = (F2_0 + F2_1) * _ICS2
    g_d = (F2_0 - F2_1) * _ICS2
    proj = [None, g_x, g_y, -g_x, -g_y, g_s, -g_d, -g_s, g_d]
    f_out = []
    for q in range(9):
        Gq = (base_g if q == 0 else base_g + proj[q]) * float(W_Q[q])
        collided = fq[q] + inv_tau * (feq_n[q] - fq[q]) + Gq
        f_out.append(jnp.where(is_obs, fq[q], collided))
    return f_out


# ---------------------------------------------------------------------------
# LEAN interior-tile bodies (r5): away from the moving tip and the
# global y walls, a tile's flags are statically known — FLUID everywhere
# except the col-(W-1) OUTFLOW column (`_geometry`: the tip obeys
# gy < walks for every shape, the top wall is row H-1, row 0 is in tile
# 0). There the full update collapses: no geometry evaluation, no
# sub-grid bounce (no obstacle neighbours), no solid-fluid coupling, no
# obstacle-pair stencil masks, no tip overwrites — the step is pulls +
# x-edge rules + macro (A) and feq + axisymmetric source + BGK (B).
# ~1480 -> ~560 issue slots/cell-step (roofline_jrl). The split runner
# (`_fluid_k_split_chunk`) applies these to tiles whose 2k-row halo
# reach is provably obstacle-free and the full kernel elsewhere.
# ---------------------------------------------------------------------------


def _fluid_a_lean(cfg_c, rows, f_pad):
    """Interior-tile A update: streaming + x-edge rules + macro only.

    Semantically equal to `_fluid_a_update` whenever no cell in the
    window is OBSTACLE/row-0/row-(H-1) and no obstacle cell is within
    stencil reach: nbr_obs is all-false (streamed == pulled), is_obs is
    all-false (no bounce swap, no macro passthrough), the SFC valid
    masks are all-false (reconstruction untouched), and of_mask reduces
    to the col-(W-1) OUTFLOW column."""
    W = cfg_c["W"]
    gx = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1)
    at_x0 = gx == 0
    at_xW = gx == W - 1
    is_fluid = jnp.logical_not(at_xW)
    ctx = _TileCtx(rows, W, None, None, at_x0, at_xW, is_fluid)

    f_new = [f_pad[0][1:-1, :]]
    for q in range(1, 9):
        ex, ey = int(E[q, 0]), int(E[q, 1])
        val = ctx.pull(f_pad[q], ex, ey)
        if q in AXIS_X_IN:
            val = jnp.where(at_x0, ctx.pull_x0(f_pad[int(MX[q])], ey), val)
        f_new.append(val)

    # OUTFLOW col W-1: copy all 9 from the inward (x) neighbour
    for q in range(9):
        f_new[q] = jnp.where(
            at_xW, pltpu.roll(f_new[q], 1, axis=1), f_new[q]
        )

    rho_n = f_new[0]
    for q in range(1, 9):
        rho_n = rho_n + f_new[q]
    mom_x = f_new[1] - f_new[3] + f_new[5] - f_new[6] - f_new[7] + f_new[8]
    mom_y = f_new[2] - f_new[4] + f_new[5] + f_new[6] - f_new[7] - f_new[8]
    safe_rho = jnp.where(rho_n == 0, 1.0, rho_n)
    inv_rho = 1.0 / safe_rho
    return f_new, rho_n, mom_x * inv_rho, mom_y * inv_rho


def _fluid_b_lean(cfg_c, rows, fq, rho_pad, vel_pad):
    """Interior-tile B update: axisymmetric BGK without the obstacle
    machinery of `_fluid_b_update` (no geometry, no obstacle-pair
    stencil masks, no OBSTACLE passthrough)."""
    W = cfg_c["W"]
    tau = cfg_c["tau"]
    fy = cfg_c["fy"]
    eps = 1e-10

    gx = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1)
    at_x0 = gx == 0
    at_xW = gx == W - 1
    xs = gx.astype(jnp.float32) + 0.5
    gx_p = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, W), 1)
    xs_p = gx_p.astype(jnp.float32) + 0.5
    is_fluid = jnp.logical_not(at_xW)
    ctx = _TileCtx(rows, W, None, None, at_x0, at_xW, is_fluid)

    rho_p = rho_pad
    vel_p0, vel_p1 = vel_pad
    rho_n = rho_p[1:-1, :]
    un0 = vel_p0[1:-1, :]
    un1 = vel_p1[1:-1, :]

    safe_rho = jnp.where(rho_n == 0, 1.0, rho_n)
    sh = jnp.where(rho_n <= eps, 0.0, 0.5 * fy / safe_rho)
    feq_n = _feq9(rho_n, un0, un1 + sh)

    ur = un0
    # materialized numerators + unsliced mid reciprocal: see the
    # `_fluid_b_update` note (Mosaic lazy-array CHECK, bisected r5)
    inv_xs_p = jnp.ones((rows + 2, W), jnp.float32) / xs_p
    inv_r = jnp.ones((rows, W), jnp.float32) / xs
    A1_pad = (-rho_p * vel_p0) * inv_xs_p
    A1 = A1_pad[1:-1, :]
    visc = CS2 * (tau - 0.5)
    mu = visc * rho_n
    pressure_pad = rho_p * CS2
    mom0_pad = rho_p * vel_p0 * vel_p0
    mom1_pad = rho_p * vel_p0 * vel_p1

    def grad_x(pad):
        return (
            4.0 * (ctx.at_(pad, 1, 0) - ctx.at_(pad, -1, 0))
            + (ctx.at_(pad, 1, 1) - ctx.at_(pad, -1, 1))
            + (ctx.at_(pad, 1, -1) - ctx.at_(pad, -1, -1))
        ) * _I12

    def grad_y(pad):
        return (
            4.0 * (ctx.at_(pad, 0, 1) - ctx.at_(pad, 0, -1))
            + (ctx.at_(pad, 1, 1) - ctx.at_(pad, 1, -1))
            + (ctx.at_(pad, -1, 1) - ctx.at_(pad, -1, -1))
        ) * _I12

    def div_free(m0_pad, m1_pad):
        d = 4.0 * (ctx.at_(m0_pad, 1, 0) - ctx.at_(m0_pad, -1, 0))
        d = d + ctx.at_(m0_pad, 1, 1) - ctx.at_(m0_pad, -1, 1)
        d = d + ctx.at_(m0_pad, 1, -1) - ctx.at_(m0_pad, -1, -1)
        d = d + 4.0 * (ctx.at_(m1_pad, 0, 1) - ctx.at_(m1_pad, 0, -1))
        d = d + ctx.at_(m1_pad, 1, 1) - ctx.at_(m1_pad, 1, -1)
        d = d + ctx.at_(m1_pad, -1, 1) - ctx.at_(m1_pad, -1, -1)
        return d * _I12

    gu_x = grad_x(vel_p0)
    gv_x = grad_x(vel_p1)
    gp_x = grad_x(pressure_pad)
    div_m = div_free(mom0_pad, mom1_pad)
    A2 = (gp_x + div_m) * (0.5 * inv_r)
    ga1_x = grad_x(A1_pad)
    ga1_y = grad_y(A1_pad)
    mu_r = mu * inv_r
    F2_0 = mu_r * (gu_x - ur * inv_r) + un0 * A1 - (tau - 1.0) * CS2 * ga1_x
    F2_1 = mu_r * gv_x + un1 * A1 - (tau - 1.0) * CS2 * ga1_y

    inv_tau = 1.0 / tau
    base_g = A1 + A2
    g_x = F2_0 * _ICS2
    g_y = F2_1 * _ICS2
    g_s = (F2_0 + F2_1) * _ICS2
    g_d = (F2_0 - F2_1) * _ICS2
    proj = [None, g_x, g_y, -g_x, -g_y, g_s, -g_d, -g_s, g_d]
    f_out = []
    for q in range(9):
        Gq = (base_g if q == 0 else base_g + proj[q]) * float(W_Q[q])
        f_out.append(fq[q] + inv_tau * (feq_n[q] - fq[q]) + Gq)
    return f_out


def _fluid_a_bt(cfg_c, rows, f_pad, vel_pad, rho_mid):
    """BELOW-TIP A update for FLAT shapes: tiles that sit entirely
    >= 2k+2 rows UNDER the advancing tip row (and exclude global rows
    0/H-1). There the geometry is LANE-static: the tip occupies
    gx < rg on every row (`_geometry` flat branch), phi reduces to the
    column distance tx wherever any consumer reads it (cells where the
    true phi is the row term ty are deep obstacle, where both forms
    are < -eps and every consumer agrees), and the obstacle-neighbour
    masks collapse to gx-compares — no geometry evaluation, no
    obs-plane pulls, no row-varying selects. Exactly equal to
    `_fluid_a_update` under those conditions (the split runner's
    margins prove them per tile)."""
    W = cfg_c["W"]
    rg_i = jnp.int32(cfg_c["rg"])
    vel_obs = cfg_c["vel_obs"]
    box_r = cfg_c["box_r"]
    rg = cfg_c["rg"]
    eps = 1e-10

    gx = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1)
    at_x0 = gx == 0
    at_xW = gx == W - 1
    obs_l = gx < rg_i
    is_fluid = jnp.logical_not(obs_l | at_xW)
    ctx = _TileCtx(rows, W, None, None, at_x0, at_xW, is_fluid)

    gx_p = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, W), 1)
    tip_p = gx_p < rg_i

    xs = gx.astype(jnp.float32) + 0.5
    phi = (xs - (rg - box_r)) - box_r  # tx

    def shifted_obs(s):
        """Lane form of the obstacle mask read at x + s (both the pull
        at (x - ex) with the x0 axis collapse and the minmax-clamped
        stencil read agree with the plain compare — boundary cases
        derived in the r5 bt notes: gx+s < rg)."""
        return (gx + s) < rg_i

    vel_p0, vel_p1 = vel_pad
    vel_p0 = jnp.where(tip_p, 0.0, vel_p0)
    vel_p1 = jnp.where(tip_p, vel_obs, vel_p1)

    fq = [f_pad[q][1:-1, :] for q in range(9)]

    t = phi
    w1a = 2.0 * t - 1.0
    w1b = 2.0 - 2.0 * t
    w2a = 2.0 * t
    w2b = 1.0 - 2.0 * t
    in_v1 = (t >= 0.5) & (t <= 1.0)
    in_v2 = (t >= 0.0) & (t <= 0.5)
    raw_in = [fq[0]] + [None] * 8
    streamed = [fq[0]] + [None] * 8
    for q in range(1, 9):
        ex, ey = int(E[q, 0]), int(E[q, 1])
        val = ctx.pull(f_pad[q], ex, ey)
        if q in AXIS_X_IN:
            val = jnp.where(at_x0, ctx.pull_x0(f_pad[int(MX[q])], ey), val)
        raw_in[q] = val
        nbr_obs = shifted_obs(-ex)  # pulled mask: obstacle at x - ex
        f_this = fq[int(REFL[q])]
        nxt = ctx.pull(f_pad[int(REFL[q])], -ex, -ey)
        if q in AXIS_X_OUT:
            oq = int(MX[q])
            nxt = jnp.where(
                at_x0, ctx.pull_x0(f_pad[int(REFL[oq])], -ey), nxt
            )
        v1 = w1a * val + w1b * f_this
        v2 = w2a * f_this + w2b * nxt
        v_obs = jnp.where(in_v1, v1, jnp.where(in_v2, v2, f_this))
        streamed[q] = jnp.where(nbr_obs, v_obs, val)

    f_new = [fq[0]]
    for p in range(1, 9):
        f_new.append(jnp.where(obs_l, raw_in[int(REFL[p])], streamed[p]))

    for q in range(9):  # OUTFLOW col W-1 only (no global row 0 here)
        f_new[q] = jnp.where(
            at_xW, pltpu.roll(f_new[q], 1, axis=1), f_new[q]
        )

    # ---- solid-fluid coupling (lane-static masks; real vel pulls) ----
    t_ok = (phi > -eps) & (phi <= 1.0 + eps)
    skip = obs_l | at_xW
    rho_tgt = f_new[0]
    for q in range(1, 9):
        rho_tgt = rho_tgt + f_new[q]
    vel_tgt_x = jnp.zeros((rows, W), jnp.float32)
    vel_tgt_y = jnp.zeros((rows, W), jnp.float32)
    count = jnp.zeros((rows, W), jnp.float32)
    valid = [jnp.zeros((rows, W), bool)]
    for q in range(1, 9):
        ex, ey = int(E[q, 0]), int(E[q, 1])
        nbr_obs = shifted_obs(ex)  # stencil read at x + ex
        v_q = nbr_obs & t_ok
        valid.append(v_q)
        vmask = v_q.astype(jnp.float32)
        count = count + vmask
        tq = jnp.where(v_q, phi, 0.0)
        ux = ctx.at_(vel_p0, -ex, -ey)
        uy = ctx.at_(vel_p1, -ex, -ey)
        if q in AXIS_X_IN:
            ux = jnp.where(at_x0, -ux, ux)
        obs_uy = jnp.where(shifted_obs(ex), vel_obs, 0.0)
        inv_den = 1.0 / (tq + 1.0)
        vel_tgt_x = vel_tgt_x + vmask * (tq * ux) * inv_den
        vel_tgt_y = vel_tgt_y + vmask * (tq * uy + obs_uy) * inv_den
        qi = int(REFL[q])
        e1i = float(E[qi, 1])
        if e1i != 0.0:
            rho_tgt = rho_tgt + vmask * 6.0 * float(W_Q[q]) * (e1i * obs_uy)
    safe_count = jnp.where(count > 0, count, 1.0)
    inv_cnt = 1.0 / safe_count
    u0 = vel_tgt_x * inv_cnt
    u1 = vel_tgt_y * inv_cnt

    def grad12(pad):
        gxx = (
            4.0 * (ctx.at_(pad, 1, 0) - ctx.at_(pad, -1, 0))
            + (ctx.at_(pad, 1, 1) - ctx.at_(pad, -1, 1))
            + (ctx.at_(pad, 1, -1) - ctx.at_(pad, -1, -1))
        ) * _I12
        gyy = (
            4.0 * (ctx.at_(pad, 0, 1) - ctx.at_(pad, 0, -1))
            + (ctx.at_(pad, 1, 1) - ctx.at_(pad, 1, -1))
            + (ctx.at_(pad, -1, 1) - ctx.at_(pad, -1, -1))
        ) * _I12
        return gxx, gyy

    g00, g01 = grad12(vel_p0)
    g10, g11 = grad12(vel_p1)
    tau = cfg_c["tau"]
    t1 = u0 * u0 - CS2 * tau * (g00 + g00)
    t2 = u1 * u0 - CS2 * tau * (g10 + g01)
    t3 = u0 * u1 - CS2 * tau * (g01 + g10)
    t4 = u1 * u1 - CS2 * tau * (g11 + g11)
    skip_n = jnp.logical_not(skip)
    pab_memo = {}
    wrho_memo = {}
    for q in range(1, 9):
        qi = int(REFL[q])
        e0, e1 = float(E[qi, 0]), float(E[qi, 1])
        c1, c2, c3, c4 = e0 * e0 - CS2, e1 * e0, e0 * e1, e1 * e1 - CS2
        pkey = (c1, c2, c3, c4)
        p_term = pab_memo.get(pkey)
        if p_term is None:
            pab = t1 * c1
            if c2 != 0.0:
                pab = pab + t2 * c2
            if c3 != 0.0:
                pab = pab + t3 * c3
            pab = pab + t4 * c4
            p_term = pab * _HICS4
            pab_memo[pkey] = p_term
        if e1 == 0.0:
            m = _ICS2 * (u0 * e0)
        elif e0 == 0.0:
            m = _ICS2 * (u1 * e1)
        else:
            m = _ICS2 * (u0 * e0 + u1 * e1)
        w = float(W_Q[qi])
        wrho = wrho_memo.get(w)
        if wrho is None:
            wrho = w * rho_tgt
            wrho_memo[w] = wrho
        recon = wrho * (1.0 + m + p_term)
        f_new[qi] = jnp.where(valid[q] & skip_n, recon, f_new[qi])

    macro_rho = f_new[0]
    for q in range(1, 9):
        macro_rho = macro_rho + f_new[q]
    rho_n = jnp.where(obs_l, rho_mid, macro_rho)
    mom_x = f_new[1] - f_new[3] + f_new[5] - f_new[6] - f_new[7] + f_new[8]
    mom_y = f_new[2] - f_new[4] + f_new[5] + f_new[6] - f_new[7] - f_new[8]
    safe_rho = jnp.where(rho_n == 0, 1.0, rho_n)
    inv_rho = 1.0 / safe_rho
    # obstacle cells carry the tip-overwritten velocity: exactly
    # (0, vel_obs) on a flat tip
    un0 = jnp.where(obs_l, 0.0, mom_x * inv_rho)
    un1 = jnp.where(obs_l, vel_obs, mom_y * inv_rho)
    return f_new, rho_n, un0, un1


def _fluid_b_bt(cfg_c, rows, fq, rho_pad, vel_pad):
    """BELOW-TIP B update for FLAT shapes: `_fluid_b_update` with the
    lane-static flags of `_fluid_a_bt` (no geometry evaluation; the
    obstacle-pair stencil masks are gx-compares)."""
    W = cfg_c["W"]
    rg_i = jnp.int32(cfg_c["rg"])
    tau = cfg_c["tau"]
    fy = cfg_c["fy"]
    eps = 1e-10

    gx = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1)
    at_x0 = gx == 0
    at_xW = gx == W - 1
    xs = gx.astype(jnp.float32) + 0.5
    gx_p = jax.lax.broadcasted_iota(jnp.int32, (rows + 2, W), 1)
    xs_p = gx_p.astype(jnp.float32) + 0.5
    obs_l = gx < rg_i
    is_fluid = jnp.logical_not(obs_l | at_xW)
    is_obs = obs_l
    ctx = _TileCtx(rows, W, None, None, at_x0, at_xW, is_fluid)

    def shifted_obs(s):
        return (gx + s) < rg_i

    rho_p = rho_pad
    vel_p0, vel_p1 = vel_pad
    rho_n = rho_p[1:-1, :]
    un0 = vel_p0[1:-1, :]
    un1 = vel_p1[1:-1, :]

    safe_rho = jnp.where(rho_n == 0, 1.0, rho_n)
    sh = jnp.where(rho_n <= eps, 0.0, 0.5 * fy / safe_rho)
    feq_n = _feq9(rho_n, un0, un1 + sh)

    ur = un0
    inv_xs_p = jnp.ones((rows + 2, W), jnp.float32) / xs_p
    inv_r = jnp.ones((rows, W), jnp.float32) / xs
    A1_pad = (-rho_p * vel_p0) * inv_xs_p
    A1 = A1_pad[1:-1, :]
    visc = CS2 * (tau - 0.5)
    mu = visc * rho_n
    pressure_pad = rho_p * CS2
    mom0_pad = rho_p * vel_p0 * vel_p0
    mom1_pad = rho_p * vel_p0 * vel_p1

    # obstacle-pair masks: lane compares (row shifts don't change the
    # below-tip obstacle pattern)
    px = shifted_obs(1) | shifted_obs(-1)

    def grad_blocked(pad, want_gy=False):
        def val(sx, sy):
            return ctx.at_(pad, sx, sy)

        gxx = jnp.where(px, 0.0, 4.0 * (val(1, 0) - val(-1, 0)))
        gxx = gxx + jnp.where(px, 0.0, val(1, 1) - val(-1, 1))
        gxx = gxx + jnp.where(px, 0.0, val(1, -1) - val(-1, -1))
        gxx = jnp.where(px | is_obs, 0.0, gxx) * _I12
        if not want_gy:
            return gxx, None

        # y-pairs share the same column -> pair mask is obs_l itself
        gyy = jnp.where(obs_l, 0.0, 4.0 * (val(0, 1) - val(0, -1)))
        gyy = gyy + jnp.where(
            shifted_obs(1), 0.0, val(1, 1) - val(1, -1))
        gyy = gyy + jnp.where(
            shifted_obs(-1), 0.0, val(-1, 1) - val(-1, -1))
        gyy = jnp.where(obs_l | shifted_obs(1) | shifted_obs(-1) | is_obs,
                        0.0, gyy) * _I12
        return gxx, gyy

    def div_free(m0_pad, m1_pad):
        d = 4.0 * (ctx.at_(m0_pad, 1, 0) - ctx.at_(m0_pad, -1, 0))
        d = d + ctx.at_(m0_pad, 1, 1) - ctx.at_(m0_pad, -1, 1)
        d = d + ctx.at_(m0_pad, 1, -1) - ctx.at_(m0_pad, -1, -1)
        d = d + 4.0 * (ctx.at_(m1_pad, 0, 1) - ctx.at_(m1_pad, 0, -1))
        d = d + ctx.at_(m1_pad, 1, 1) - ctx.at_(m1_pad, 1, -1)
        d = d + ctx.at_(m1_pad, -1, 1) - ctx.at_(m1_pad, -1, -1)
        return jnp.where(is_obs, 0.0, d * _I12)

    gu_x, _ = grad_blocked(vel_p0)
    gv_x, _ = grad_blocked(vel_p1)
    gp_x, _ = grad_blocked(pressure_pad)
    div_m = div_free(mom0_pad, mom1_pad)
    A2 = (gp_x + div_m) * (0.5 * inv_r)
    ga1_x, ga1_y = grad_blocked(A1_pad, want_gy=True)
    mu_r = mu * inv_r
    F2_0 = mu_r * (gu_x - ur * inv_r) + un0 * A1 - (tau - 1.0) * CS2 * ga1_x
    F2_1 = mu_r * gv_x + un1 * A1 - (tau - 1.0) * CS2 * ga1_y

    inv_tau = 1.0 / tau
    base_g = A1 + A2
    g_x = F2_0 * _ICS2
    g_y = F2_1 * _ICS2
    g_s = (F2_0 + F2_1) * _ICS2
    g_d = (F2_0 - F2_1) * _ICS2
    proj = [None, g_x, g_y, -g_x, -g_y, g_s, -g_d, -g_s, g_d]
    f_out = []
    for q in range(9):
        Gq = (base_g if q == 0 else base_g + proj[q]) * float(W_Q[q])
        collided = fq[q] + inv_tau * (feq_n[q] - fq[q]) + Gq
        f_out.append(jnp.where(is_obs, fq[q], collided))
    return f_out


def _cfg_consts(cfg) -> dict:
    H, W = cfg.eff_res
    return dict(
        H=H, W=W,
        tau=float(cfg.tau),
        vel_obs=float(cfg.vel_obs),
        rg=float(cfg.Rg_radius),
        box_r=float(cfg.box_radius),
        inflow_h=float(cfg.inflow_height),
        fy=float(-cfg.gravity_strength),
        flat=cfg.shape in ("cylinder", "infiniteplane"),
    )


def _specs(H, W, TH):
    n = H // TH

    def mid(i):
        return i

    def up(i):
        return jax.lax.rem(i - 1 + n, n)

    def dn(i):
        return jax.lax.rem(i + 1, n)

    def b2(im):
        return pl.BlockSpec((TH, W), lambda i, im=im: (im(i), 0),
                            memory_space=pltpu.VMEM)

    def b3(im, c=9):
        return pl.BlockSpec((c, TH, W), lambda i, im=im: (0, im(i), 0),
                            memory_space=pltpu.VMEM)

    return mid, up, dn, b2, b3


def _one_tiled_step(f, rho, vel, step_scalar, cfg_key, TH):
    cfg_c = dict(cfg_key)
    H, W = cfg_c["H"], cfg_c["W"]
    n = H // TH
    f32 = jnp.float32
    mid, up, dn, b2, b3 = _specs(H, W, TH)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    step_arr = step_scalar.reshape(1, 1)

    ka = _make_kernel_a(cfg_c, TH, lambda i: i)
    f1, rho1, vel1 = pl.pallas_call(
        ka,
        grid=(n,),
        in_specs=[smem, b3(up), b3(mid), b3(dn), b3(up, 2), b3(mid, 2),
                  b3(dn, 2), b2(mid)],
        out_specs=[b3(mid), b2(mid), b3(mid, 2)],
        out_shape=[
            jax.ShapeDtypeStruct((9, H, W), f32),
            jax.ShapeDtypeStruct((H, W), f32),
            jax.ShapeDtypeStruct((2, H, W), f32),
        ],
        compiler_params=_VMEM_PARAMS,
    )(step_arr, f, f, f, vel, vel, vel, rho)

    kb = _make_kernel_b(cfg_c, TH, lambda i: i)
    f2 = pl.pallas_call(
        kb,
        grid=(n,),
        in_specs=[smem, b3(mid), b2(up), b2(mid), b2(dn), b3(up, 2),
                  b3(mid, 2), b3(dn, 2)],
        out_specs=b3(mid),
        out_shape=jax.ShapeDtypeStruct((9, H, W), f32),
        compiler_params=_VMEM_PARAMS,
    )(step_arr, f1, rho1, rho1, rho1, vel1, vel1, vel1)
    return f2, rho1, vel1


@partial(jax.jit, static_argnames=("cfg_key", "TH", "k"))
def _tiled_chunk(f, rho, vel, start_step, cfg_key, TH, k):
    """k steps as one XLA program (2k pallas calls, 1 dispatch)."""
    step = jnp.asarray(start_step, jnp.float32)
    for j in range(k):
        f, rho, vel = _one_tiled_step(f, rho, vel, step + float(j), cfg_key, TH)
    return f, rho, vel


# ---------------------------------------------------------------------------
# k-step temporal blocking: one pallas call advances k fluid steps.
#
# Each fluid step consumes a 2-row dependency halo (streaming/SFC one
# row, then the post-macro axisymmetric collision stencils one more),
# so a k-step tile pass reads +-2k halo rows and runs a shrinking level
# pyramid: level lvl = k-1..0 applies the A update (stream+SFC+macro)
# on TH + 2(2lvl+1) rows and the B update (axisymmetric BGK) on two
# fewer; each level's outputs are exactly the next level's padded
# inputs (`fused_sharded._lean_tiled_step` scheme applied to the
# two-kernel JRL step). The tip geometry is analytic per level from the
# in-kernel step index, so nothing but f/vel/rho crosses HBM. Halo rows
# ride in 8-row neighbour groups (vs the A/B pair's full neighbour-tile
# fetches), so HBM traffic per step drops ~4k-fold and k <= 4.
# ---------------------------------------------------------------------------


def _make_fluid_k_kernel(cfg_c, TH, k, shard=False, tile_map=None):
    """k fused fluid steps over one TH-row tile with +-2k-row halos.

    ``shard=True``: SMEM global-row-offset scalar + (12, 8, W)
    cross-shard y-halo piece blocks (f x9 + vel x2 + rho, real rows
    adjacent to the body) swapped in on the first/last tiles.
    ``tile_map``: grid-index -> tile-index remap for the lean-split
    runner's FULL call (its grid covers only the boundary tiles)."""
    vel_obs = cfg_c["vel_obs"]
    inflow_h = cfg_c["inflow_h"]
    hk = 2 * k

    def kernel(*refs):
        if shard:
            (step_ref, off_ref, f_m, f_up, f_dn, vel_m, vel_up, vel_dn,
             rho_m, rho_up, rho_dn, tpP, btP,
             f_out, rho_out, vel_out) = refs
        else:
            (step_ref, f_m, f_up, f_dn, vel_m, vel_up, vel_dn,
             rho_m, rho_up, rho_dn, f_out, rho_out, vel_out) = refs
            tpP = btP = None
        pid = pl.program_id(0)
        t0 = (tile_map(pid) if tile_map is not None else pid) * TH
        first = last = None
        if shard:
            t0 = t0 + off_ref[0]
            first = pid == 0
            last = pid == pl.num_programs(0) - 1

        def winp(up, mid_, dn, pi):
            top = up[..., -hk:, :]
            bot = dn[..., :hk, :]
            if shard:
                top = jnp.where(first, tpP[pi, -hk:, :], top)
                bot = jnp.where(last, btP[pi, :hk, :], bot)
            return jnp.concatenate([top, mid_, bot], axis=-2)

        step0 = step_ref[0, 0]
        f_cur = [winp(f_up[q], f_m[q], f_dn[q], q) for q in range(9)]
        v0_cur = winp(vel_up[0], vel_m[0], vel_dn[0], 9)
        v1_cur = winp(vel_up[1], vel_m[1], vel_dn[1], 10)
        r_cur = winp(rho_up[:], rho_m[:], rho_dn[:], 11)[1:-1, :]

        for lvl in range(k - 1, -1, -1):
            ra = TH + 2 * (2 * lvl + 1)
            t0a = t0 - (2 * lvl + 1)
            step = step0 + float(k - 1 - lvl)
            walks = inflow_h + step * vel_obs
            walks_int = jnp.floor(walks + 0.5).astype(jnp.int32)
            f1, rho1, u0, u1 = _fluid_a_update(
                cfg_c, ra, t0a, walks, walks_int, f_cur,
                (v0_cur, v1_cur), r_cur,
            )
            f_cur = _fluid_b_update(
                cfg_c, ra - 2, t0a + 1, walks, walks_int,
                [a[1:-1, :] for a in f1], rho1, (u0, u1),
            )
            v0_cur = u0[1:-1, :]
            v1_cur = u1[1:-1, :]
            r_cur = rho1[2:-2, :] if lvl else rho1[1:-1, :]

        for q in range(9):
            f_out[q] = f_cur[q]
        rho_out[:] = r_cur
        vel_out[0] = v0_cur
        vel_out[1] = v1_cur

    return kernel


def _k_specs(H, W, TH):
    """Mid/up/dn BlockSpecs for the k-step kernels: the mid block is the
    full tile, the halo rows come from the adjacent 8-row GROUPS of the
    same arrays (wrapped mod H — periodic, as `_specs`), not full
    neighbour tiles."""
    g = TH // 8
    G = H // 8

    def upg(i, g=g, G=G):
        return jax.lax.rem(i * g - 1 + G, G)

    def dng(i, g=g, G=G):
        return jax.lax.rem((i + 1) * g, G)

    def m2():
        return pl.BlockSpec((TH, W), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def m3(c=9):
        return pl.BlockSpec((c, TH, W), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    def h2(im):
        return pl.BlockSpec((8, W), lambda i, im=im: (im(i), 0),
                            memory_space=pltpu.VMEM)

    def h3(im, c=9):
        return pl.BlockSpec((c, 8, W), lambda i, im=im: (0, im(i), 0),
                            memory_space=pltpu.VMEM)

    return upg, dng, m2, m3, h2, h3


@partial(jax.jit, static_argnames=("cfg_key", "TH", "k", "reps"))
def _fluid_k_chunk(f, rho, vel, start_step, cfg_key, TH, k, reps):
    """``reps`` k-step kernel passes as one XLA program."""
    cfg_c = dict(cfg_key)
    H, W = cfg_c["H"], cfg_c["W"]
    n = H // TH
    f32 = jnp.float32
    upg, dng, m2, m3, h2, h3 = _k_specs(H, W, TH)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    kern = _make_fluid_k_kernel(cfg_c, TH, k)

    step = jnp.asarray(start_step, f32)
    for _ in range(reps):
        f, rho, vel = pl.pallas_call(
            kern,
            grid=(n,),
            in_specs=[smem, m3(), h3(upg), h3(dng), m3(2), h3(upg, 2),
                      h3(dng, 2), m2(), h2(upg), h2(dng)],
            out_specs=[m3(), m2(), m3(2)],
            out_shape=[
                jax.ShapeDtypeStruct((9, H, W), f32),
                jax.ShapeDtypeStruct((H, W), f32),
                jax.ShapeDtypeStruct((2, H, W), f32),
            ],
            compiler_params=_VMEM_PARAMS,
        )(step.reshape(1, 1), f, f, f, vel, vel, vel, rho, rho, rho)
        step = step + float(k)
    return f, rho, vel


def _make_fluid_k_lean_kernel(cfg_c, k):
    """k fused LEAN fluid steps (interior tiles only): same shrinking
    A/B level pyramid as `_make_fluid_k_kernel`, with the lean bodies.
    Consumes ONLY f (the lean step never reads the stored vel/rho —
    they are recomputed per level from f), so the call skips 3 input
    planes of HBM traffic; the three trailing refs are the full call's
    output buffers, aliased through so the untouched interior blocks of
    this call's outputs land in the same arrays (input_output_aliases,
    `_fluid_k_split_chunk`)."""
    hk = 2 * k

    def kernel(f_m, f_up, f_dn, _fb, _rb, _vb, f_out, rho_out, vel_out):
        def winp(up, mid_, dn):
            return jnp.concatenate(
                [up[..., -hk:, :], mid_, dn[..., :hk, :]], axis=-2
            )

        TH = f_out.shape[-2]
        f_cur = [winp(f_up[q], f_m[q], f_dn[q]) for q in range(9)]
        v0_cur = v1_cur = r_cur = None
        for lvl in range(k - 1, -1, -1):
            ra = TH + 2 * (2 * lvl + 1)
            f1, rho1, u0, u1 = _fluid_a_lean(cfg_c, ra, f_cur)
            f_cur = _fluid_b_lean(
                cfg_c, ra - 2, [a[1:-1, :] for a in f1], rho1,
                (u0, u1),
            )
            v0_cur = u0[1:-1, :]
            v1_cur = u1[1:-1, :]
            r_cur = rho1[2:-2, :] if lvl else rho1[1:-1, :]

        for q in range(9):
            f_out[q] = f_cur[q]
        rho_out[:] = r_cur
        vel_out[0] = v0_cur
        vel_out[1] = v1_cur

    return kernel


def _make_fluid_k_bt_kernel(cfg_c, k):
    """k fused BELOW-TIP fluid steps (flat shapes, tiles fully under
    the tip): the `_make_fluid_k_kernel` pyramid with the bt bodies.
    Same input set as the full kernel minus the step scalar (the bt
    geometry is walks-independent); three trailing alias refs as in
    the lean kernel."""
    hk = 2 * k

    def kernel(f_m, f_up, f_dn, vel_m, vel_up, vel_dn,
               rho_m, rho_up, rho_dn, _fb, _rb, _vb,
               f_out, rho_out, vel_out):
        def winp(up, mid_, dn):
            return jnp.concatenate(
                [up[..., -hk:, :], mid_, dn[..., :hk, :]], axis=-2
            )

        TH = f_out.shape[-2]
        f_cur = [winp(f_up[q], f_m[q], f_dn[q]) for q in range(9)]
        v0_cur = winp(vel_up[0], vel_m[0], vel_dn[0])
        v1_cur = winp(vel_up[1], vel_m[1], vel_dn[1])
        r_cur = winp(rho_up[:], rho_m[:], rho_dn[:])[1:-1, :]

        for lvl in range(k - 1, -1, -1):
            ra = TH + 2 * (2 * lvl + 1)
            f1, rho1, u0, u1 = _fluid_a_bt(
                cfg_c, ra, f_cur, (v0_cur, v1_cur), r_cur)
            f_cur = _fluid_b_bt(
                cfg_c, ra - 2, [a[1:-1, :] for a in f1], rho1, (u0, u1))
            v0_cur = u0[1:-1, :]
            v1_cur = u1[1:-1, :]
            r_cur = rho1[2:-2, :] if lvl else rho1[1:-1, :]

        for q in range(9):
            f_out[q] = f_cur[q]
        rho_out[:] = r_cur
        vel_out[0] = v0_cur
        vel_out[1] = v1_cur

    return kernel


@partial(jax.jit,
         static_argnames=("cfg_key", "TH", "k", "reps", "fr", "fb"))
def _fluid_k_split_chunk(f, rho, vel, start_step, cfg_key, TH, k, reps, fr,
                         fb=0):
    """``reps`` k-step passes, each as a FULL pass over the boundary
    tiles {0, fb+1..fr, n-1}, an optional BELOW-TIP pass over tiles
    {1..fb} (flat shapes only; fb=0 disables), plus a LEAN pass over
    the interior tiles {fr+1..n-2} — combined without copies by
    aliasing each later call's outputs onto the previous call's output
    buffers (each grid writes only its own blocks; the aliased buffers
    keep the rest). ``fr``/``fb`` are chosen by the runner so every
    lean tile's 2k-row halo reach is provably free of obstacle cells
    and global y walls, and every bt tile's reach lies fully under the
    tip row."""
    cfg_c = dict(cfg_key)
    H, W = cfg_c["H"], cfg_c["W"]
    n = H // TH
    nl = n - 2 - fr  # lean tiles (0 = bt-only split, late travel)
    assert nl >= 0 and (nl > 0 or fb > 0)
    assert 0 <= fb <= fr and (fb == 0 or TH > 2 * k)
    f32 = jnp.float32
    upg, dng, m2, m3, h2, h3 = _k_specs(H, W, TH)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    g = TH // 8

    def ti(i):  # full-call grid index -> tile index
        if fb == 0:
            return jnp.where(i <= fr, i, n - 1)
        return jnp.where(
            i == 0, 0, jnp.where(i <= fr - fb, fb + i, n - 1))

    def m2t():
        return pl.BlockSpec((TH, W), lambda i: (ti(i), 0),
                            memory_space=pltpu.VMEM)

    def m3t(c=9):
        return pl.BlockSpec((c, TH, W), lambda i: (0, ti(i), 0),
                            memory_space=pltpu.VMEM)

    def h2t(im):
        return pl.BlockSpec((8, W), lambda i, im=im: (im(ti(i)), 0),
                            memory_space=pltpu.VMEM)

    def h3t(im, c=9):
        return pl.BlockSpec((c, 8, W), lambda i, im=im: (0, im(ti(i)), 0),
                            memory_space=pltpu.VMEM)

    # lean-call specs: tile index fr+1+i; halo groups from the adjacent
    # tiles (no wrap needed — interior by construction)
    def l2():
        return pl.BlockSpec((TH, W), lambda i: (fr + 1 + i, 0),
                            memory_space=pltpu.VMEM)

    def l3(c=9):
        return pl.BlockSpec((c, TH, W), lambda i: (0, fr + 1 + i, 0),
                            memory_space=pltpu.VMEM)

    def lh3(up):
        if up:
            return pl.BlockSpec(
                (9, 8, W), lambda i: (0, (fr + 1 + i) * g - 1, 0),
                memory_space=pltpu.VMEM)
        return pl.BlockSpec(
            (9, 8, W), lambda i: (0, (fr + 2 + i) * g, 0),
            memory_space=pltpu.VMEM)

    # bt-call specs: tile index 1 + i (tiles {1..fb}; interior, no wrap)
    def bti(i):
        return 1 + i

    def b2s():
        return pl.BlockSpec((TH, W), lambda i: (bti(i), 0),
                            memory_space=pltpu.VMEM)

    def b3s(c=9):
        return pl.BlockSpec((c, TH, W), lambda i: (0, bti(i), 0),
                            memory_space=pltpu.VMEM)

    def bh2(up):
        return pl.BlockSpec(
            (8, W), lambda i: (bti(i) * g - 1 if up else
                               (bti(i) + 1) * g, 0),
            memory_space=pltpu.VMEM)

    def bh3(up, c=9):
        return pl.BlockSpec(
            (c, 8, W), lambda i: (0, bti(i) * g - 1 if up else
                                  (bti(i) + 1) * g, 0),
            memory_space=pltpu.VMEM)

    kern_full = _make_fluid_k_kernel(cfg_c, TH, k, tile_map=ti)
    kern_bt = _make_fluid_k_bt_kernel(cfg_c, k) if fb else None
    kern_lean = _make_fluid_k_lean_kernel(cfg_c, k)
    out_shapes = [
        jax.ShapeDtypeStruct((9, H, W), f32),
        jax.ShapeDtypeStruct((H, W), f32),
        jax.ShapeDtypeStruct((2, H, W), f32),
    ]
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    step = jnp.asarray(start_step, f32)
    for _ in range(reps):
        fF, rF, vF = pl.pallas_call(
            kern_full,
            grid=(fr - fb + 2,),
            in_specs=[smem, m3t(), h3t(upg), h3t(dng), m3t(2),
                      h3t(upg, 2), h3t(dng, 2), m2t(), h2t(upg),
                      h2t(dng)],
            out_specs=[m3t(), m2t(), m3t(2)],
            out_shape=out_shapes,
            compiler_params=_VMEM_PARAMS,
        )(step.reshape(1, 1), f, f, f, vel, vel, vel, rho, rho, rho)
        if fb:
            fF, rF, vF = pl.pallas_call(
                kern_bt,
                grid=(fb,),
                in_specs=[b3s(), bh3(True), bh3(False), b3s(2),
                          bh3(True, 2), bh3(False, 2), b2s(),
                          bh2(True), bh2(False),
                          any_spec, any_spec, any_spec],
                out_specs=[b3s(), b2s(), b3s(2)],
                out_shape=out_shapes,
                input_output_aliases={9: 0, 10: 1, 11: 2},
                compiler_params=_VMEM_PARAMS,
            )(f, f, f, vel, vel, vel, rho, rho, rho, fF, rF, vF)
        if nl:
            f, rho, vel = pl.pallas_call(
                kern_lean,
                grid=(nl,),
                in_specs=[l3(), lh3(True), lh3(False),
                          any_spec, any_spec, any_spec],
                out_specs=[l3(), l2(), l3(2)],
                out_shape=out_shapes,
                input_output_aliases={3: 0, 4: 1, 5: 2},
                compiler_params=_VMEM_PARAMS,
            )(f, f, f, fF, rF, vF)
        else:
            f, rho, vel = fF, rF, vF
        step = step + float(k)
    return f, rho, vel


def pick_tile_rows(cfg) -> int:
    H, _ = cfg.eff_res
    for TH in (64, 32, 16, 8):
        if H % TH == 0 and H // TH >= 3:
            return TH
    raise ValueError(f"H={H} not tileable (need H % 8 == 0, >= 3 tiles)")


def make_tiled_fluid_runner(cfg, tile_rows: int | None = None,
                            unroll: int = 8, k: int | None = None,
                            lean_split: bool = True):
    """Drop-in replacement for `models.jrl.make_fluid_runner` at sizes
    beyond the whole-domain fused kernel's VMEM budget. Same signature
    (state, fields, start_step, n); dispatches ceil(n/(unroll*k)) XLA
    programs. ``k`` > 1 selects the temporally-blocked kernel (k fluid
    steps per pallas call, +-2k-row halos; k <= 4); remainder steps
    fall back to the single-step A/B pair.

    ``lean_split`` (default on): tiles whose 2k-row halo reach is
    provably obstacle-free — the tip obeys ``gy < walks`` for every
    shape (`_geometry`), so everything safely above the advancing tip
    and below the top wall — run the LEAN interior kernel
    (`_fluid_a_lean`/`_fluid_b_lean`, ~2.6x fewer issue slots) while
    the boundary tiles run the full kernel, combined copy-free via
    output aliasing (`_fluid_k_split_chunk`). The frontier tile is a
    host-static per-chunk choice (walks advances one row per
    ~1/vel_obs >> unroll*k steps), so at most n distinct chunk
    variants compile over a whole phase."""
    TH = tile_rows if tile_rows is not None else pick_tile_rows(cfg)
    cfg_c = _cfg_consts(cfg)
    cfg_key = tuple(sorted(cfg_c.items()))
    H = cfg_c["H"]
    n_tiles = H // TH
    vel_obs = cfg_c["vel_obs"]
    inflow_h = cfg_c["inflow_h"]
    kk = 1 if k is None else int(k)
    if not 1 <= kk <= 4:
        raise ValueError(f"k={kk} out of range (halo groups hold 2k <= 8)")
    if (kk > 1 or lean_split) and (TH % 8 or cfg.eff_res[0] % 8):
        raise ValueError("k > 1 / lean_split need 8-aligned tiles and "
                         "grid height")

    flat = cfg_c["flat"]

    def frontier(s_end):
        """Last tile the FULL kernel must cover at steps < s_end: the
        deepest row an obstacle cell can influence within one k-block
        is walks_int - 1 + 2k (A+B widen by 2 rows/step), +1 rounding
        guard."""
        walks = inflow_h + float(s_end) * vel_obs
        reach = int(walks + 0.5) + 2 * kk + 2
        return reach // TH

    def below(s_start):
        """Last tile the BELOW-TIP kernel may cover at steps >= s_start
        (flat shapes): every computed row of the tile's 2k-row pyramid
        reach must stay >= 2 rows under the tip row for the whole
        chunk, i.e. (t+1)*TH - 1 + 2k + 2 <= walks_int(start) - 1."""
        if not (flat and TH > 2 * kk):
            return 0
        wi = int(inflow_h + float(s_start) * vel_obs + 0.5)
        return max(0, (wi - 2 * kk - 2) // TH - 1)

    def run(state, fields, start_step, n: int):
        del fields
        f, rho, vel = state["f"], state["rho"], state["vel"]
        s = int(start_step)
        end = s + int(n)
        while end - s >= kk:
            reps = min(unroll, (end - s) // kk)
            fr = frontier(s + reps * kk) if lean_split else n_tiles
            fb = min(below(s), n_tiles - 2) if lean_split else 0
            if fr <= n_tiles - 3:
                f, rho, vel = _fluid_k_split_chunk(
                    f, rho, vel, float(s), cfg_key, TH, kk, reps, fr,
                    min(fb, fr))
            elif fb >= 1:
                # late travel: no lean tiles left, but (flat shapes)
                # most tiles sit fully under the tip -> bt-only split
                f, rho, vel = _fluid_k_split_chunk(
                    f, rho, vel, float(s), cfg_key, TH, kk, reps,
                    n_tiles - 2, fb)
            elif kk > 1:
                f, rho, vel = _fluid_k_chunk(f, rho, vel, float(s),
                                             cfg_key, TH, kk, reps)
            else:
                break
            s += reps * kk
        while s < end:
            j = min(unroll, end - s)
            f, rho, vel = _tiled_chunk(f, rho, vel, float(s), cfg_key, TH, j)
            s += j
        return {"f": f, "rho": rho, "vel": vel}

    return run


# ---------------------------------------------------------------------------
# Concentration (C) lattice: tiled balance + approach kernels.
#
# Unlike the fluid phase, the convection collision is LOCAL (the
# axisymmetric advection-diffusion source `LBM_collision_2d.py:382-384`
# has no stencils), so each step is ONE kernel with 1-row halos.
# Reference: `demo_2d_LBM_JRL_C_*.py:230-253` (balance), `:294-385`
# (approach with tip-disk integrals).
# ---------------------------------------------------------------------------

INFLOW = int(CellType.INFLOW)
INFLOW_2 = int(CellType.INFLOW_2)


def _c_cfg_consts(cfg) -> dict:
    H, W = cfg.eff_res
    return dict(
        H=H, W=W,
        tau_D=float(cfg.tau_D),
        v=float(cfg.vel_obs_conv),
        rg=float(cfg.Rg_radius),
        box_r=float(cfg.box_radius),
        inflow_h=float(cfg.inflow_height),
        inflow_h_int=int(cfg.inflow_height_int),
        rint=int(cfg.radius_obs_int),
        flat=cfg.shape in ("cylinder", "infiniteplane"),
        is_neg=bool(cfg.is_negative),
        clamp=bool(cfg.clamp_C),
    )


def _stream_c(ctx, hq, h_pad, obs_pad, phi, flags, at_masks, cv=None):
    """h streaming with flag BCs; shared by balance (phi=None, cv=None)
    and approach (sub-grid bounce + INFLOW_2 feq with the local C_vel)."""
    at_y0, at_yH, at_x0, at_xW = at_masks
    TH, W = ctx.TH, ctx.W
    is_obs = flags == OBSTACLE
    in_mask = flags == INFLOW
    in2_mask = flags == INFLOW_2
    of_mask = flags == OUTFLOW

    raw_in = [hq[0]] + [None] * 8
    streamed = [hq[0]] + [None] * 8
    for q in range(1, 9):
        ex, ey = int(E[q, 0]), int(E[q, 1])
        val = ctx.pull(h_pad[q], ex, ey)
        if q in AXIS_X_IN:
            val = jnp.where(at_x0, ctx.pull(h_pad[int(MX[q])], ex, ey), val)
        raw_in[q] = val
        nbr_obs = ctx.pull(obs_pad, ex, ey) > 0.5
        f_this = hq[int(REFL[q])]
        if phi is None:
            v_obs = f_this  # plain half-way bounce (balance: no phi)
        else:
            nxt = ctx.pull(h_pad[int(REFL[q])], -ex, -ey)
            if q in AXIS_X_OUT:
                oq = int(MX[q])
                nxt = jnp.where(
                    at_x0, ctx.pull(h_pad[int(REFL[oq])], -ex, -ey), nxt
                )
            tt = phi
            v1 = (2.0 * tt - 1.0) * val + (2.0 - 2.0 * tt) * f_this
            v2 = (2.0 * tt) * f_this + (1.0 - 2.0 * tt) * nxt
            v_obs = jnp.where(
                (tt >= 0.5) & (tt <= 1.0),
                v1,
                jnp.where((tt >= 0.0) & (tt <= 0.5), v2, f_this),
            )
        streamed[q] = jnp.where(nbr_obs, v_obs, val)

    h_new = [hq[0]]
    for p in range(1, 9):
        h_new.append(jnp.where(is_obs, raw_in[int(REFL[p])], streamed[p]))

    # INFLOW: feq(0, u) == 0 sink; INFLOW_2: feq(1, C_vel) reservoir
    if cv is None:
        feq_in2 = [float(W_Q[q]) * jnp.ones((TH, W), jnp.float32)
                   for q in range(9)]
    else:
        feq_in2 = _feq9(jnp.ones((TH, W), jnp.float32), cv[0], cv[1])
    for q in range(9):
        g = jnp.where(in_mask, 0.0, h_new[q])
        h_new[q] = jnp.where(in2_mask, feq_in2[q], g)

    # OUTFLOW: copy all 9 from the inward neighbour (within-tile)
    for q in range(9):
        g = h_new[q]
        g = jnp.where(at_y0, pltpu.roll(g, TH - 1, axis=0), g)
        g = jnp.where(at_yH, pltpu.roll(g, 1, axis=0), g)
        g = jnp.where(at_x0, pltpu.roll(g, W - 1, axis=1), g)
        g = jnp.where(at_xW, pltpu.roll(g, 1, axis=1), g)
        h_new[q] = jnp.where(of_mask, g, h_new[q])
    return h_new, in_mask, in2_mask, is_obs


def _make_c_balance_kernel(cfg_c, TH, shard=False, xw=None):
    """One balance step per tile: zero velocity, fixed flags.

    ``shard=True``: SMEM row offset + cross-shard y-halo pieces —
    (1, 8, W) flags (kept separate from the f32 planes: dtypes differ)
    and (9, 8, W) h. ``xw=(x_ext, w)``: extended-window 2D-mesh mode
    (per-tile flag/h x-extension windows; body lanes sliced out —
    `_make_kernel_a`)."""
    W = cfg_c["W"]
    tau_D = cfg_c["tau_D"]
    inv_tau = 1.0 / tau_D
    rate_coef = 1.0 - 0.5 / tau_D
    assert xw is None or shard, "xw mode is shard-only"
    x_ext, w_body = xw if xw else (0, W)
    wf = w_body + 2 * x_ext

    def kernel(*refs):
        lwFl = rwFl = lwH = rwH = None
        if shard and xw:
            (off_ref, fl_tp, fl_m, fl_bt, h_tp, h_m, h_bt, c_blk,
             tpFl, btFl, tpH, btH, lwFl, rwFl, lwH, rwH,
             h_out, c_out) = refs
        elif shard:
            (off_ref, fl_tp, fl_m, fl_bt, h_tp, h_m, h_bt, c_blk,
             tpFl, btFl, tpH, btH, h_out, c_out) = refs
        else:
            (fl_tp, fl_m, fl_bt, h_tp, h_m, h_bt, c_blk, h_out,
             c_out) = refs
            tpFl = btFl = tpH = btH = None
        pid = pl.program_id(0)
        t0 = pid * TH
        first = last = None
        gx0 = 0
        if shard:
            t0 = t0 + off_ref[0]
            first = pid == 0
            last = pid == pl.num_programs(0) - 1
            if xw:
                gx0 = off_ref[1] - x_ext

        def stitch(tp, mid_, bt, tpp, btp, lw, rw, pi):
            top = tp[..., -1:, :]
            bot = bt[..., 0:1, :]
            if shard:
                top = jnp.where(first, tpp[pi, -1:, :], top)
                bot = jnp.where(last, btp[pi, 0:1, :], bot)
            rows_w = jnp.concatenate([top, mid_, bot], axis=-2)
            if xw:
                rows_w = jnp.concatenate(
                    [lw[0, pi], rows_w, rw[0, pi]], axis=-1
                )
            return rows_w

        H = cfg_c["H"]
        gy = t0 + jax.lax.broadcasted_iota(jnp.int32, (TH, wf), 0)
        gx = gx0 + jax.lax.broadcasted_iota(jnp.int32, (TH, wf), 1)
        at_masks = (gy == 0, gy == H - 1, gx == 0, gx == W - 1)
        r = gx.astype(jnp.float32) + 0.5

        flags_pad = stitch(fl_tp[:], fl_m[:], fl_bt[:], tpFl, btFl,
                           lwFl, rwFl, 0)
        flags = flags_pad[1:-1, :]
        obs_pad = (flags_pad == OBSTACLE).astype(jnp.float32)
        is_fluid = flags == FLUID
        ctx = _TileCtx(TH, wf, *at_masks, is_fluid)

        h_pad = [stitch(h_tp[q], h_m[q], h_bt[q], tpH, btH, lwH, rwH, q)
                 for q in range(9)]
        hq = [p[1:-1, :] for p in h_pad]
        C = c_blk[:]
        if xw:
            z = jnp.zeros((TH, x_ext), jnp.float32)
            C = jnp.concatenate([z, C, z], axis=-1)

        h_new, in_mask, in2_mask, is_obs = _stream_c(
            ctx, hq, h_pad, obs_pad, None, flags, at_masks
        )
        C = jnp.where(in_mask, 0.0, C)
        C = jnp.where(in2_mask, 1.0, C)

        macro_C = h_new[0]
        for q in range(1, 9):
            macro_C = macro_C + h_new[q]
        C_n = jnp.where(is_obs, C, macro_C)

        # u = 0: feq = w_q C; Gi vanishes; per-direction axisymmetric rate
        h_coll = []
        for q in range(9):
            w_rate = inv_tau + rate_coef * float(E[q, 0]) / r
            collided = h_new[q] + w_rate * (float(W_Q[q]) * C_n - h_new[q])
            h_coll.append(jnp.where(is_obs, h_new[q], collided))
        if xw:
            h_coll = [a[:, x_ext : x_ext + w_body] for a in h_coll]
            C_n = C_n[:, x_ext : x_ext + w_body]
        for q in range(9):
            h_out[q] = h_coll[q]
        c_out[:] = C_n

    return kernel


def _make_c_approach_kernel(cfg_c, TH, shard=False, xw=None):
    """One approach step per tile + per-tile partial disk integrals.

    The stored-velocity frame pair is interpolated OUTSIDE the kernel
    (per step, in jnp) and arrives as a plain [2, TH, W] mid-block; the
    moving-tip geometry is analytic per tile (strict phi < 0, head-row
    INFLOW sink — `C_ethaline:296-304`).

    ``shard=True``: SMEM row offset + cross-shard y-halo pieces
    ((1, 8, W) base flags, (9, 8, W) h). Both modes emit per-tile
    partial disk integrals through the acc output: every term is a
    row-masked sum of tile-local values (no cross-row roll), so the
    partials are exact however the disk rows land on tile or shard
    boundaries — the caller sums them (and, sharded, psums them).
    """
    import math as _math

    H, W = cfg_c["H"], cfg_c["W"]
    tau_D = cfg_c["tau_D"]
    inv_tau = 1.0 / tau_D
    rate_coef = 1.0 - 0.5 / tau_D
    v = cfg_c["v"]
    rg = cfg_c["rg"]
    box_r = cfg_c["box_r"]
    inflow_h = cfg_c["inflow_h"]
    inflow_h_int = cfg_c["inflow_h_int"]
    rint = cfg_c["rint"]
    flat = cfg_c["flat"]
    is_neg = cfg_c["is_neg"]

    def tip(gy, gx, walks, walks_int, base):
        xs = gx.astype(jnp.float32) + 0.5
        ys = gy.astype(jnp.float32) + 0.5
        tx = (xs - (rg - box_r)) - box_r
        ty = (ys - (walks - box_r)) - box_r
        ty_top = -(ys - float(H))
        if flat:
            phi = jnp.maximum(tx, ty)
            if is_neg:
                phi = jnp.minimum(phi, ty_top)
            obs = (gy < walks_int) & (gx < jnp.int32(rg))
        else:
            align = (xs + ys - (rg + walks)) * (1.0 / jnp.sqrt(2.0))
            phi = jnp.maximum(ty, align)
            if is_neg:
                phi = jnp.minimum(phi, ty_top)
            obs = (phi < 0) | ((gy < inflow_h_int) & (gx < jnp.int32(rg)))
        flags = jnp.where(obs, OBSTACLE, base)
        head = (gy == walks_int - 1) & (gx < rint)
        return jnp.where(head, INFLOW, flags), phi

    assert xw is None or shard, "xw mode is shard-only"
    # xw mode zero-fills the stored velocity in extension lanes (below);
    # cv feeds feq_in2 at INFLOW_2 cells, so the x_ext >= 2 exactness of
    # the first extension lane's C_n (read by the flat flux roll) relies
    # on no INFLOW_2 cell ever sitting on a disk-integral read lane.
    # INFLOW_2 lives at gy=0 gx>=Rg, the right column, and the top row
    # (models/jrl.py::c_init) — all outside gx <= rint — enforced here
    # (ADVICE r4).
    assert int(rint) < int(rg) and int(rint) < W - 1, (rint, rg, W)
    x_ext, w_body = xw if xw else (0, W)
    wf = w_body + 2 * x_ext

    def kernel(*refs):
        lwFl = rwFl = lwH = rwH = None
        if shard and xw:
            (step_ref, off_ref, fl_tp, fl_m, fl_bt, h_tp, h_m, h_bt,
             c_blk, vel_m, tpFl, btFl, tpH, btH, lwFl, rwFl, lwH, rwH,
             h_out, c_out, acc_out) = refs
        elif shard:
            (step_ref, off_ref, fl_tp, fl_m, fl_bt, h_tp, h_m, h_bt,
             c_blk, vel_m, tpFl, btFl, tpH, btH, h_out, c_out,
             acc_out) = refs
        else:
            (step_ref, fl_tp, fl_m, fl_bt, h_tp, h_m, h_bt, c_blk, vel_m,
             h_out, c_out, acc_out) = refs
            tpFl = btFl = tpH = btH = None
        pid = pl.program_id(0)
        t0 = pid * TH
        first = last = None
        gx0 = 0
        if shard:
            t0 = t0 + off_ref[0]
            first = pid == 0
            last = pid == pl.num_programs(0) - 1
            if xw:
                gx0 = off_ref[1] - x_ext

        def stitch(tp, mid_, bt, tpp, btp, lw, rw, pi):
            top = tp[..., -1:, :]
            bot = bt[..., 0:1, :]
            if shard:
                top = jnp.where(first, tpp[pi, -1:, :], top)
                bot = jnp.where(last, btp[pi, 0:1, :], bot)
            rows_w = jnp.concatenate([top, mid_, bot], axis=-2)
            if xw:
                rows_w = jnp.concatenate(
                    [lw[0, pi], rows_w, rw[0, pi]], axis=-1
                )
            return rows_w

        step_idx = step_ref[0, 0]
        walks = inflow_h + step_idx * v
        walks_int = jnp.floor(walks + 0.5).astype(jnp.int32)

        gy = t0 + jax.lax.broadcasted_iota(jnp.int32, (TH, wf), 0)
        gx = gx0 + jax.lax.broadcasted_iota(jnp.int32, (TH, wf), 1)
        at_masks = (gy == 0, gy == H - 1, gx == 0, gx == W - 1)
        gy_p = jax.lax.rem(
            t0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (TH + 2, wf), 0) + H,
            H,
        )
        gx_p = gx0 + jax.lax.broadcasted_iota(jnp.int32, (TH + 2, wf), 1)
        r = gx.astype(jnp.float32) + 0.5
        area_w = jnp.where(
            (gx >= 0) & (gx < rint),
            _math.pi * (2.0 * gx.astype(jnp.float32) + 1.0), 0.0,
        )
        if xw:
            # only BODY lanes contribute to this shard's disk-integral
            # partials (the extension lanes replicate the x neighbours'
            # body cells and would double-count across the psum)
            lx = jax.lax.broadcasted_iota(jnp.int32, (TH, wf), 1)
            area_w = jnp.where(
                (lx >= x_ext) & (lx < x_ext + w_body), area_w, 0.0
            )

        flags_pad_base = stitch(fl_tp[:], fl_m[:], fl_bt[:], tpFl, btFl,
                                lwFl, rwFl, 0)
        flags, phi = tip(gy, gx, walks, walks_int,
                         flags_pad_base[1:-1, :])
        flags_pad, _ = tip(gy_p, gx_p, walks, walks_int, flags_pad_base)
        obs_pad = (flags_pad == OBSTACLE).astype(jnp.float32)
        is_fluid = flags == FLUID
        ctx = _TileCtx(TH, wf, *at_masks, is_fluid)

        C = c_blk[:]
        if xw:
            z = jnp.zeros((TH, x_ext), jnp.float32)
            C = jnp.concatenate([z, C, z], axis=-1)
        C = jnp.where(flags == OBSTACLE, 0.0, C)

        # C_vel from the (host-interpolated) stored velocity
        tip_block = (gy < walks_int) & (gx < jnp.int32(rg))
        v0_m, v1_m = vel_m[0], vel_m[1]
        if xw:
            z = jnp.zeros((TH, x_ext), jnp.float32)
            v0_m = jnp.concatenate([z, v0_m, z], axis=-1)
            v1_m = jnp.concatenate([z, v1_m, z], axis=-1)
        cv0 = jnp.where(tip_block, 0.0, v0_m * v)
        cv1 = jnp.where(tip_block, v, v1_m * v)

        h_pad = [stitch(h_tp[q], h_m[q], h_bt[q], tpH, btH, lwH, rwH, q)
                 for q in range(9)]
        hq = [p[1:-1, :] for p in h_pad]
        h_new, in_mask, in2_mask, is_obs = _stream_c(
            ctx, hq, h_pad, obs_pad, phi, flags, at_masks, cv=(cv0, cv1)
        )
        C = jnp.where(in_mask, 0.0, C)
        C = jnp.where(in2_mask, 1.0, C)

        macro_C = h_new[0]
        for q in range(1, 9):
            macro_C = macro_C + h_new[q]
        C_n = jnp.where(is_obs, C, macro_C)
        if cfg_c["clamp"]:
            C_n = jnp.clip(C_n, 0.0, 1.0)

        feq_n = _feq9(C_n, cv0, cv1)
        ur = cv0
        h_coll = []
        for q in range(9):
            s_q = rate_coef * float(E[q, 0]) / r
            w_rate = inv_tau + s_q
            Gq = -(ur / r) * feq_n[q] * (1.0 - 0.5 / tau_D - 0.5 * s_q)
            collided = h_new[q] + w_rate * (feq_n[q] - h_new[q]) + Gq
            h_coll.append(jnp.where(is_obs, h_new[q], collided))
        if xw:
            h_coll = [a[:, x_ext : x_ext + w_body] for a in h_coll]
            c_out[:] = C_n[:, x_ext : x_ext + w_body]
        else:
            c_out[:] = C_n
        for q in range(9):
            h_out[q] = h_coll[q]

        # per-tile partial integrals (`C_ethaline:364-385`; flat flux form
        # `C_cylinder:344-358`) -> lanes 0..3 of this tile's acc row.
        # Every term is a row-masked sum of TILE-LOCAL values — the flat
        # flux form's dC_z = C[wi] - C[wi-1] is split into two row sums
        # (each row's partial comes from whichever tile owns it) instead
        # of an axis-0 roll, which would wrap within the tile whenever
        # the disk row lands on a tile-local row 0 (at TH=8 the moving
        # tip head crosses such a row every 8 rows of travel).
        disk = C_n * area_w
        row_m1 = (gy == walks_int - 1).astype(jnp.float32)
        row_in = (gy == walks_int).astype(jnp.float32)
        row_cur = (gy == walks_int + 1).astype(jnp.float32)
        sum_in = jnp.sum(disk * row_in)
        sum_cur = jnp.sum(disk * row_cur)
        if flat:
            rC = (gx.astype(jnp.float32) + 0.5) * C_n
            # lane i reads lane i+1; on the window (xw mode) the body's
            # last lane reads the first right-extension lane, whose C_n
            # is exact given x_ext >= 2 (the runner enforces this)
            rC_next = pltpu.roll(rC, wf - 1, axis=1)
            dcr = (rC_next - rC) / r * area_w
            sum_m1 = jnp.sum(disk * row_m1)
            new_inflow = (sum_in - sum_m1) + jnp.sum(dcr * row_in)
            new_current = (sum_cur - sum_in) + jnp.sum(dcr * row_cur)
        else:
            new_inflow = sum_in
            new_current = sum_cur
        rec_u = jnp.sum(cv0 * area_w * row_cur)
        rec_v = jnp.sum(cv1 * area_w * row_cur)
        # acc block is (1, 8, 128) — 8 sublanes because Mosaic requires
        # block[-2] % 8 == 0 (a (1, 128) row block compiles in interpret
        # mode but is REJECTED by the real-TPU lowering); values live on
        # sublane 0, the rest stay zero and vanish in the caller's sum
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
        vals = (
            jnp.where(lane == 0, new_inflow, 0.0)
            + jnp.where(lane == 1, new_current, 0.0)
            + jnp.where(lane == 2, rec_u, 0.0)
            + jnp.where(lane == 3, rec_v, 0.0)
        )
        acc_out[:] = jnp.where(sub == 0, vals, 0.0)

    return kernel


def _c_one_balance_step(h, C, flags, cfg_key, TH):
    cfg_c = dict(cfg_key)
    H, W = cfg_c["H"], cfg_c["W"]
    n = H // TH
    f32 = jnp.float32
    _, up, dn, b2, b3 = _specs(H, W, TH)
    mid = lambda i: i  # noqa: E731
    k = _make_c_balance_kernel(cfg_c, TH)
    return pl.pallas_call(
        k,
        grid=(n,),
        in_specs=[b2(up), b2(mid), b2(dn), b3(up), b3(mid), b3(dn), b2(mid)],
        out_specs=[b3(mid), b2(mid)],
        out_shape=[
            jax.ShapeDtypeStruct((9, H, W), f32),
            jax.ShapeDtypeStruct((H, W), f32),
        ],
        compiler_params=_VMEM_PARAMS,
    )(flags, flags, flags, h, h, h, C)


@partial(jax.jit, static_argnames=("cfg_key", "TH", "k"))
def _c_balance_chunk(h, C, flags, cfg_key, TH, k):
    for _ in range(k):
        h, C = _c_one_balance_step(h, C, flags, cfg_key, TH)
    return h, C


def make_tiled_balance_runner(cfg, flags, tile_rows: int | None = None,
                              unroll: int = 8):
    """Drop-in replacement for `models.jrl.make_balance_runner` beyond
    the whole-domain VMEM budget."""
    TH = tile_rows if tile_rows is not None else pick_tile_rows(cfg)
    cfg_key = tuple(sorted(_c_cfg_consts(cfg).items()))

    def run(state, fields, n: int):
        del fields
        h, C = state["h"], state["C"]
        s = 0
        while s < int(n):
            k = min(unroll, int(n) - s)
            h, C = _c_balance_chunk(h, C, flags, cfg_key, TH, k)
            s += k
        return {"C": C, "h": h}

    return run


def _c_one_approach_step(h, C, base_flags, vel_field, step_scalar,
                         cfg_key, TH, n_frames):
    cfg_c = dict(cfg_key)
    H, W = cfg_c["H"], cfg_c["W"]
    n = H // TH
    f32 = jnp.float32
    _, up, dn, b2, b3 = _specs(H, W, TH)
    mid = lambda i: i  # noqa: E731
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    # stored-velocity interpolation in tip-position space (jnp, outside
    # the kernel; `models/jrl.py::make_approach_step`)
    v = cfg_c["v"]
    x_interval = 0.1
    x_comp = step_scalar * v
    b = jnp.clip(jnp.floor(x_comp / x_interval), 0.0, float(n_frames - 1))
    t = x_comp / x_interval - b
    bi = b.astype(jnp.int32)
    v0 = jax.lax.dynamic_index_in_dim(vel_field, bi, axis=0, keepdims=False)
    v1 = jax.lax.dynamic_index_in_dim(
        vel_field, jnp.minimum(bi + 1, n_frames - 1), axis=0, keepdims=False
    )
    vel = jnp.where(b + 1.0 < float(n_frames), v0 * (1.0 - t) + v1 * t, v0)

    kacc = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    k = _make_c_approach_kernel(cfg_c, TH)
    h2, C2, acc = pl.pallas_call(
        k,
        grid=(n,),
        in_specs=[smem, b2(up), b2(mid), b2(dn), b3(up), b3(mid), b3(dn),
                  b2(mid), b3(mid, 2)],
        out_specs=[b3(mid), b2(mid), kacc],
        out_shape=[
            jax.ShapeDtypeStruct((9, H, W), f32),
            jax.ShapeDtypeStruct((H, W), f32),
            jax.ShapeDtypeStruct((n, 8, 128), f32),
        ],
        compiler_params=_VMEM_PARAMS,
    )(step_scalar.reshape(1, 1), base_flags, base_flags, base_flags,
      h, h, h, C, vel)
    sums = jnp.sum(acc, axis=(0, 1))
    return h2, C2, (sums[0], sums[1], sums[2], sums[3])


@partial(jax.jit, static_argnames=("cfg_key", "TH", "k", "n_frames"))
def _c_approach_chunk(h, C, base_flags, vel_field, start_step, acc0,
                      cfg_key, TH, k, n_frames):
    infl, curr, ru, rv, cnt = acc0
    step = jnp.asarray(start_step, jnp.float32)
    for j in range(k):
        h, C, (i_, c_, u_, v_) = _c_one_approach_step(
            h, C, base_flags, vel_field, step + float(j), cfg_key, TH,
            n_frames,
        )
        infl = infl + i_
        curr = curr + c_
        ru, rv = u_, v_
        cnt = cnt + 1.0
    return h, C, (infl, curr, ru, rv, cnt)


def make_tiled_approach_runner(cfg, vel_field, tile_rows: int | None = None,
                               unroll: int = 8):
    """Drop-in replacement for `models.jrl.make_approach_runner` beyond
    the whole-domain VMEM budget. Same (state, fields, start_step, n) ->
    (state, acc) contract; `fields` must carry `base_flags`."""
    TH = tile_rows if tile_rows is not None else pick_tile_rows(cfg)
    cfg_key = tuple(sorted(_c_cfg_consts(cfg).items()))
    frames = jnp.asarray(vel_field, jnp.float32)
    n_frames = int(frames.shape[0])

    def run(state, fields, start_step, n: int):
        h, C = state["h"], state["C"]
        base_flags = fields["base_flags"]
        z = jnp.zeros((), jnp.float32)
        acc = (z, z, z, z, z)
        s = int(start_step)
        end = s + int(n)
        while s < end:
            k = min(unroll, end - s)
            h, C, acc = _c_approach_chunk(
                h, C, base_flags, frames, float(s), acc, cfg_key, TH, k,
                n_frames,
            )
            s += k
        acc_d = {
            "inflow_sum": acc[0],
            "current_sum": acc[1],
            "count": acc[4],
            "rec_u": acc[2],
            "rec_v": acc[3],
        }
        return ({"C": C, "h": h}, acc_d)

    return run
