"""Fused whole-step Pallas kernels for the cylinder-channel scene.

One fused pass performs the complete lattice update that the reference
issues as ~6 separate dispatches per step (propagation kernel,
solid-fluid coupling kernel, torch macro reduce, torch MRT collision —
`demo_2d_LBM_cylinder.py:138-174`): pull-streaming with flag boundary
conditions, curved-boundary reconstruction, macroscopic moments, and MRT
collision.

Performance structure:
* static two-call specialization by row-tile: "interior" tiles (plain
  channel between the two OBSTACLE wall columns — ~90-95% of a 2048^2
  domain) run a lean kernel with static wall bounce-back masks; the
  "band" tiles (cylinder +margin, INFLOW row, OUTFLOW row) run the
  full-boundary kernel, writing into the interior call's buffers via
  `input_output_aliases`. (A per-tile `pl.when` gate was measured to be
  useless: Mosaic hoists the pure computation out of the branch.)
* y-halos are expressed as additional BlockSpec inputs whose index maps
  point at the neighbouring row-blocks of the same arrays; Mosaic
  double-buffers and overlaps all block DMA with compute (a manual-DMA
  variant ran ~2x slower on DMA-wait serialization).

Semantics notes (differences from the unfused ops, dynamics-neutral for
this scene):
* contact-angle border extrapolation is skipped — it only rewrites rho at
  OBSTACLE cells (collision passthrough; the demo's 90-degree angle has a
  zero slope term anyway);
* OUTFLOW cells are assumed to lie on the global border (true for every
  reference scene);
* force == 0 and obs_vel == 0 (static cylinder; both hold in the demo).

Validated against the unfused jnp step in tests/test_fused.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jrl_lbm_tpu import lattice
from jrl_lbm_tpu.ops import collide as _collide
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


def _feq_terms(rho, ux, uy):
    """Equilibrium (works for both scalars and tiles) -> 9 values."""
    uv = ux * ux + uy * uy
    out = []
    for q in range(9):
        ex, ey = float(E[q, 0]), float(E[q, 1])
        eu = ex * ux + ey * uy
        w = float(W_Q[q])
        out.append(
            rho * w * (1.0 + eu / CS2 + 0.5 * eu * eu / (CS2 * CS2) - 0.5 * uv / CS2)
        )
    return out


def _mrt_apply(A, fb, feq_n, is_obs, f_out, st=None):
    """Unrolled M^-1 S M relaxation + obstacle passthrough. ``st(val, q)``
    converts to the storage format (bf16 deviation) before the write."""
    d = [feq_n[q] - fb[q] for q in range(9)]
    for a in range(9):
        omega = A[a][0] * d[0]
        for b in range(1, 9):
            omega = omega + A[a][b] * d[b]
        val = jnp.where(is_obs, fb[a], fb[a] + omega)
        f_out[a] = val if st is None else st(val, a)


# --- bf16 deviation storage (docs/PERFORMANCE.md bf16 experiment) -----------
# f populations sit near the lattice weights (rho ~ 1, u << 1), so raw
# bf16 would put its ~0.4% relative noise on O(0.1..0.45) values. Storing
# the DEVIATION g_q = f_q - w_q instead keeps the stored magnitudes at
# O(rho-1, u) ~ 1e-2, recovering ~1.5 decimal digits. The weight shift
# commutes with streaming (w_q is constant per plane and w[REFL[q]] ==
# w[q]), so load = g + w_q, store = f - w_q, everything else unchanged.

def _mk_ld_st(bf16_dev):
    if not bf16_dev:
        return (lambda x, q: x), None

    def ld(x, q):
        return x.astype(jnp.float32) + float(W_Q[q])

    def st(x, q):
        return (x - float(W_Q[q])).astype(jnp.bfloat16)

    return ld, st


def f_to_storage(f, bf16_dev: bool):
    """State-prep: convert an f32 f to the kernel storage format."""
    if not bf16_dev:
        return f
    w = jnp.asarray(W_Q, jnp.float32)[:, None, None]
    return (f - w).astype(jnp.bfloat16)


def f_from_storage(g, bf16_dev: bool):
    if not bf16_dev:
        return g
    w = jnp.asarray(W_Q, jnp.float32)[:, None, None]
    return g.astype(jnp.float32) + w


def _stitch(tp, mid, bt):
    """[TH+2, W] padded plane from a row-block and its neighbours."""
    return jnp.concatenate([tp[..., -1:, :], mid, bt[..., 0:1, :]], axis=-2)


# ---------------------------------------------------------------------------
# Full-boundary kernel (all six cell types) — for band tiles and as the
# generic fallback for arbitrary flag fields.
# ---------------------------------------------------------------------------

def _make_full_kernel(H, W, TH, tau, inflow_density, inflow_vx, inflow_vy,
                      minv_s_m, has_inflow2, tile_map, bf16_dev=False):
    A = [[float(minv_s_m[a][b]) for b in range(9)] for a in range(9)]
    FEQ_IN = _feq_terms(inflow_density, inflow_vx, inflow_vy)
    ld, st = _mk_ld_st(bf16_dev)

    def kernel(
        fl_tp, fl_m, fl_bt,
        f_tp, f_m, f_bt,
        vel_tp, vel_m, vel_bt,
        rho_blk, phi_blk,
        f_out, rho_out, vel_out,
    ):
        t0 = tile_map(pl.program_id(0)) * TH

        gy = t0 + jax.lax.broadcasted_iota(jnp.int32, (TH, W), 0)
        gx = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 1)
        at_y0 = gy == 0
        at_yH = gy == H - 1
        at_x0 = gx == 0
        at_xW = gx == W - 1

        flags_pad = _stitch(fl_tp[:], fl_m[:], fl_bt[:])
        flags = fl_m[:]
        is_fluid = flags == FLUID
        not_fluid = jnp.logical_not(is_fluid)
        is_obs = flags == OBSTACLE

        def pull(plane_pad, ex, ey, style):
            """Value at cell from (y-ey, x-ex) with the reference's
            flag-dependent neighbour rules (propagation.cu:84-87 /
            collision_2d.cu:69-72)."""

            def rows(yoff):
                return plane_pad[1 + yoff : 1 + yoff + TH, :]

            def shift_x(arr, xoff):
                if xoff == 0:
                    return arr
                return pltpu.roll(arr, (-xoff) % W, axis=1)

            def cands(e_comp, lo_mask, hi_mask):
                cs = [(None, -e_comp)]
                if e_comp == 1:
                    off = 1 if style == "reflect" else 0
                    cs.append((lo_mask & not_fluid, off))
                elif e_comp == -1:
                    off = -1 if style == "reflect" else 0
                    cs.append((hi_mask & not_fluid, off))
                return cs

            v = None
            for my, yo in cands(ey, at_y0, at_yH):
                for mx, xo in cands(ex, at_x0, at_xW):
                    patch = shift_x(rows(yo), xo)
                    if v is None:
                        v = patch
                        continue
                    m = mx if my is None else (my if mx is None else (mx & my))
                    v = jnp.where(m, patch, v)
            return v

        obs_pad = (flags_pad == OBSTACLE).astype(jnp.float32)
        phi = phi_blk[:]
        rho_prev = rho_blk[:]
        eps = 1e-10
        t_ok = (phi > -eps) & (phi <= 1.0 + eps)

        f_pad = [ld(_stitch(f_tp[q], f_m[q], f_bt[q]), q) for q in range(9)]
        f_mid = [ld(f_m[q], q) for q in range(9)]
        vel_pad = [_stitch(vel_tp[c], vel_m[c], vel_bt[c]) for c in range(2)]
        vel_x = vel_m[0]
        vel_y = vel_m[1]

        # ---- streaming with sub-grid interpolation bounce-back ----
        raw_in = [f_mid[0]]
        for q in range(1, 9):
            ex, ey = int(E[q, 0]), int(E[q, 1])
            raw_in.append(pull(f_pad[q], ex, ey, "reflect"))
        f_new = [f_mid[0]]
        for q in range(1, 9):
            ex, ey = int(E[q, 0]), int(E[q, 1])
            nbr_obs = pull(obs_pad, ex, ey, "reflect") > 0.5
            f_this = f_mid[int(REFL[q])]
            nxt = pull(f_pad[int(REFL[q])], -ex, -ey, "reflect")
            v1 = (2.0 * phi - 1.0) * raw_in[q] + (2.0 - 2.0 * phi) * f_this
            v2 = (2.0 * phi) * f_this + (1.0 - 2.0 * phi) * nxt
            v_obs = jnp.where(t_ok, jnp.where(phi >= 0.5, v1, v2), f_this)
            streamed = jnp.where(nbr_obs, v_obs, raw_in[q])
            f_new.append(jnp.where(is_obs, raw_in[int(REFL[q])], streamed))

        # ---- INFLOW: constant plug equilibrium ----
        in_mask = flags == INFLOW
        for q in range(9):
            f_new[q] = jnp.where(in_mask, FEQ_IN[q], f_new[q])
        rho_after = jnp.where(in_mask, inflow_density, rho_prev)
        velx_after = jnp.where(in_mask, inflow_vx, vel_x)
        vely_after = jnp.where(in_mask, inflow_vy, vel_y)

        if has_inflow2:
            in2_mask = flags == INFLOW_2
            feq_in2 = _feq_terms(jnp.ones((TH, W), jnp.float32), vel_x, vel_y)
            for q in range(9):
                f_new[q] = jnp.where(in2_mask, feq_in2[q], f_new[q])
            rho_after = jnp.where(in2_mask, 1.0, rho_after)

        # ---- OUTFLOW: copy from the inward neighbour (global borders) ----
        of_mask = flags == OUTFLOW
        for q in range(9):
            g = f_new[q]
            g = jnp.where(at_y0, pltpu.roll(g, TH - 1, axis=0), g)
            g = jnp.where(at_yH, pltpu.roll(g, 1, axis=0), g)
            g = jnp.where(at_x0, pltpu.roll(g, W - 1, axis=1), g)
            g = jnp.where(at_xW, pltpu.roll(g, 1, axis=1), g)
            f_new[q] = jnp.where(of_mask, g, f_new[q])

        # ---- solid-fluid coupling (static obstacle: obs_vel == 0) ----
        skip = is_obs | at_xW | at_yH
        rho_tgt = f_new[0]
        for q in range(1, 9):
            rho_tgt = rho_tgt + f_new[q]
        vel_tgt_x = jnp.zeros((TH, W), jnp.float32)
        vel_tgt_y = jnp.zeros((TH, W), jnp.float32)
        count = jnp.zeros((TH, W), jnp.float32)
        valid = []
        tq = jnp.where(t_ok, phi, 0.0)
        for q in range(9):
            ex, ey = int(E[q, 0]), int(E[q, 1])
            nbr_obs = pull(obs_pad, -ex, -ey, "minmax") > 0.5
            v_q = nbr_obs & t_ok
            valid.append(v_q)
            vmask = v_q.astype(jnp.float32)
            count = count + vmask
            ux = pull(vel_pad[0], ex, ey, "minmax")
            uy = pull(vel_pad[1], ex, ey, "minmax")
            vel_tgt_x = vel_tgt_x + vmask * tq * ux / (tq + 1.0)
            vel_tgt_y = vel_tgt_y + vmask * tq * uy / (tq + 1.0)
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

        g00, g01 = grad12(vel_pad[0])
        g10, g11 = grad12(vel_pad[1])

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

        # ---- macro + MRT ----
        macro_rho = f_new[0]
        for q in range(1, 9):
            macro_rho = macro_rho + f_new[q]
        rho_n = jnp.where(is_obs, rho_after, macro_rho)
        mom_x = f_new[1] - f_new[3] + f_new[5] - f_new[6] - f_new[7] + f_new[8]
        mom_y = f_new[2] - f_new[4] + f_new[5] + f_new[6] - f_new[7] - f_new[8]
        safe_rho = jnp.where(rho_n == 0, 1.0, rho_n)
        u_x = jnp.where(is_obs, velx_after, mom_x / safe_rho)
        u_y = jnp.where(is_obs, vely_after, mom_y / safe_rho)

        _mrt_apply(A, f_new, _feq_terms(rho_n, u_x, u_y), is_obs, f_out, st)
        rho_out[:] = rho_n
        vel_out[0] = u_x
        vel_out[1] = u_y

    return kernel


# ---------------------------------------------------------------------------
# Interior kernel: plain channel tiles (FLUID interior, OBSTACLE wall
# columns at x=0 and x=W-1, nothing else).
#
# Bandwidth structure: a TH-row tile only needs ONE halo row from each
# y-neighbour, and only for the three populations streaming in that
# direction (ey=+1 pulls from y-1; ey=-1 from y+1). Fetching whole
# (9, TH, W) neighbour blocks (the original design) tripled the f read
# traffic; here the halos are six (1, 8, W) blocks — the minimal
# 8-row-aligned slice Mosaic can DMA — cutting f reads from 27 to
# 9 + 48/TH row-planes per tile (TH=32: 1.17x amplification vs 3x).
#
# The wall columns' rho/vel are time-invariant under the macro obstacle
# passthrough (rho stays at its initial value `wall_density`, vel at 0),
# so the kernel does not read rho/vel at all.
# ---------------------------------------------------------------------------

# populations needing a y-halo row: ey=+1 pulls from the row above the
# tile; ey=-1 from the row below (E rows 2,5,6 / 4,7,8)
UP_Q = (2, 5, 6)
DN_Q = (4, 7, 8)


def _make_interior_kernel(W, TH, minv_s_m, wall_density, bf16_dev=False):
    A = [[float(minv_s_m[a][b]) for b in range(9)] for a in range(9)]
    ld, st = _mk_ld_st(bf16_dev)

    def kernel(
        f_m, up2, up5, up6, dn4, dn7, dn8,
        f_out, rho_out, vel_out,
    ):
        up = {2: ld(up2[0], 2), 5: ld(up5[0], 5), 6: ld(up6[0], 6)}
        dn = {4: ld(dn4[0], 4), 7: ld(dn7[0], 7), 8: ld(dn8[0], 8)}
        fm = [ld(f_m[q], q) for q in range(9)]
        gx = jax.lax.broadcasted_iota(jnp.int32, (TH, W), 1)
        at_x0 = gx == 0
        at_xW = gx == W - 1
        is_obs = at_x0 | at_xW  # static wall columns
        nbr_lo = gx == 1  # pull neighbour is the left wall
        nbr_hi = gx == W - 2

        def pull(q):
            ex, ey = int(E[q, 0]), int(E[q, 1])
            if ey == 1:  # value from row y-1: halo row t0-1 + mid[:-1]
                rows = jnp.concatenate([up[q][-1:, :], fm[q][:-1, :]], axis=0)
            elif ey == -1:  # from row y+1: mid[1:] + halo row t0+TH
                rows = jnp.concatenate([fm[q][1:, :], dn[q][0:1, :]], axis=0)
            else:
                rows = fm[q]
            if ex == 0:
                return rows
            base = pltpu.roll(rows, ex % W, axis=1)
            # wall cells reflect-clamp: col0 pulls from col1, col W-1 from
            # col W-2 (propagation.cu:84-85)
            if ex == 1:
                return jnp.where(at_x0, pltpu.roll(rows, W - 1, axis=1), base)
            return jnp.where(at_xW, pltpu.roll(rows, 1, axis=1), base)

        raw_in = [fm[0]] + [pull(q) for q in range(1, 9)]
        f_new = [raw_in[0]]
        for q in range(1, 9):
            ex = int(E[q, 0])
            streamed = raw_in[q]
            if ex == 1:
                streamed = jnp.where(nbr_lo, fm[int(REFL[q])], streamed)
            elif ex == -1:
                streamed = jnp.where(nbr_hi, fm[int(REFL[q])], streamed)
            f_new.append(jnp.where(is_obs, raw_in[int(REFL[q])], streamed))

        macro_rho = f_new[0]
        for q in range(1, 9):
            macro_rho = macro_rho + f_new[q]
        rho_n = jnp.where(is_obs, wall_density, macro_rho)
        mom_x = f_new[1] - f_new[3] + f_new[5] - f_new[6] - f_new[7] + f_new[8]
        mom_y = f_new[2] - f_new[4] + f_new[5] + f_new[6] - f_new[7] - f_new[8]
        safe_rho = jnp.where(rho_n == 0, 1.0, rho_n)
        u_x = jnp.where(is_obs, 0.0, mom_x / safe_rho)
        u_y = jnp.where(is_obs, 0.0, mom_y / safe_rho)

        _mrt_apply(A, f_new, _feq_terms(rho_n, u_x, u_y), is_obs, f_out, st)
        rho_out[:] = rho_n
        vel_out[0] = u_x
        vel_out[1] = u_y

    return kernel


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------

def _band_tiles(cfg, T):
    """Interior-tile (T-row) indices that need the full-boundary kernel:
    the INFLOW tile (0), the OUTFLOW tile (n-1), and [b0, b1] covering
    the cylinder +-margin."""
    H, _ = cfg.res
    n = H // T
    cy = cfg.center[1]
    r = cfg.D / 2.0
    margin = 4.0
    b0 = max(0, int((cy - r - margin) // T))
    b1 = min(n - 1, int((cy + r + margin) // T))
    return n, b0, b1


def _full_specs(H, W, TH, tile_map):
    """BlockSpecs for the full kernel: 3 row-blocks per haloed input."""
    n = H // TH

    def mid(i):
        return tile_map(i)

    def up(i):
        return jax.lax.rem(tile_map(i) - 1 + n, n)

    def dn(i):
        return jax.lax.rem(tile_map(i) + 1, n)

    def b2(im):
        return pl.BlockSpec((TH, W), lambda i: (im(i), 0), memory_space=pltpu.VMEM)

    def b3(im, c=9):
        return pl.BlockSpec(
            (c, TH, W), lambda i: (0, im(i), 0), memory_space=pltpu.VMEM
        )

    in_specs = [
        b2(up), b2(mid), b2(dn),  # flags
        b3(up), b3(mid), b3(dn),  # f
        b3(up, 2), b3(mid, 2), b3(dn, 2),  # vel
        b2(mid),  # rho
        b2(mid),  # phi
    ]
    out_specs = [b3(mid), b2(mid), b3(mid, 2)]
    return in_specs, out_specs


@partial(
    jax.jit,
    static_argnames=(
        "H", "W", "T", "BT", "tau", "inflow_density", "inflow_vx", "inflow_vy",
        "minv_s_m", "has_inflow2", "b0", "b1", "bf16_dev",
    ),
)
def _fused_step_split(f, rho, vel, flags, phi, H, W, T, BT, tau,
                      inflow_density, inflow_vx, inflow_vy, minv_s_m,
                      has_inflow2, b0, b1, bf16_dev=False):
    """Two-call split: interior tiles of T rows (lean kernel, minimal
    halos), band tiles of BT rows (full-boundary kernel) covering
    interior-tile indices {0, b0..b1, n-1}. T and BT may differ (the
    interior kernel's traffic scales as 9 + 48/T row-planes, so it wants
    large tiles; the full kernel's VMEM footprint wants small ones)."""
    n = H // T
    T8 = T // 8
    n_band_tiles = (b1 - b0 + 1) + 2
    n_int = n - n_band_tiles
    c1 = b0 - 1
    gap = b1 - b0 + 2

    def int_map(i):
        # interior tiles: [1 .. b0-1] then [b1+1 .. n-2]
        return jnp.where(i < c1, i + 1, i + gap)

    f32 = jnp.float32
    fst = jnp.bfloat16 if bf16_dev else f32

    # ---- interior call (creates the output buffers) ----
    def ib2():
        return pl.BlockSpec(
            (T, W), lambda i: (int_map(i), 0), memory_space=pltpu.VMEM
        )

    def ib3(c=9):
        return pl.BlockSpec(
            (c, T, W), lambda i: (0, int_map(i), 0), memory_space=pltpu.VMEM
        )

    def halo(q, up):
        if up:  # 8-row block holding row t0-1 (its last row)
            im = lambda i, q=q: (q, T8 * int_map(i) - 1, 0)
        else:  # 8-row block holding row t0+T (its first row)
            im = lambda i, q=q: (q, T8 * (int_map(i) + 1), 0)
        return pl.BlockSpec((1, 8, W), im, memory_space=pltpu.VMEM)

    ik = _make_interior_kernel(W, T, minv_s_m, float(inflow_density),
                               bf16_dev=bf16_dev)
    f1, rho1, vel1 = pl.pallas_call(
        ik,
        grid=(n_int,),
        in_specs=[ib3()]
        + [halo(q, up=True) for q in UP_Q]
        + [halo(q, up=False) for q in DN_Q],
        out_specs=[ib3(), ib2(), ib3(2)],
        out_shape=[
            jax.ShapeDtypeStruct((9, H, W), fst),
            jax.ShapeDtypeStruct((H, W), f32),
            jax.ShapeDtypeStruct((2, H, W), f32),
        ],
    )(f, f, f, f, f, f, f)

    # ---- band call: BT-row tiles over rows [0,T) + [b0*T,(b1+1)*T) +
    # [H-T,H), compact outputs merged into the interior buffers with
    # in-place row updates. (An input_output_aliases pass-through was
    # measured to force full-array copies, tripling the step time.) ----
    TB = T // BT  # band tiles per interior tile
    a_ = TB
    b_ = (b1 - b0 + 1) * TB
    nH = H // BT

    def band_map(i):
        return jnp.where(
            i < a_,
            i,
            jnp.where(i < a_ + b_, b0 * TB + (i - a_), nH - TB + (i - a_ - b_)),
        )

    n_band = 2 * TB + b_
    bk = _make_full_kernel(
        H, W, BT, tau, inflow_density, inflow_vx, inflow_vy, minv_s_m,
        has_inflow2, band_map, bf16_dev=bf16_dev,
    )
    in_specs, _ = _full_specs(H, W, BT, band_map)
    compact_out = [
        pl.BlockSpec((9, BT, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((BT, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, BT, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    ]
    f2c, rho2c, vel2c = pl.pallas_call(
        bk,
        grid=(n_band,),
        in_specs=in_specs,
        out_specs=compact_out,
        out_shape=[
            jax.ShapeDtypeStruct((9, n_band * BT, W), fst),
            jax.ShapeDtypeStruct((n_band * BT, W), f32),
            jax.ShapeDtypeStruct((2, n_band * BT, W), f32),
        ],
    )(flags, flags, flags, f, f, f, vel, vel, vel, rho, phi)

    # merge: band compact rows are [tile 0 | tiles b0..b1 | tile n-1]
    nb_mid = (b1 - b0 + 1) * T

    def merge(full, compact):
        full = jax.lax.dynamic_update_slice_in_dim(
            full, compact[..., 0:T, :], 0, axis=full.ndim - 2
        )
        full = jax.lax.dynamic_update_slice_in_dim(
            full, compact[..., T : T + nb_mid, :], b0 * T, axis=full.ndim - 2
        )
        full = jax.lax.dynamic_update_slice_in_dim(
            full, compact[..., T + nb_mid :, :], H - T, axis=full.ndim - 2
        )
        return full

    return merge(f1, f2c), merge(rho1, rho2c), merge(vel1, vel2c)


@partial(
    jax.jit,
    static_argnames=(
        "H", "W", "TH", "tau", "inflow_density", "inflow_vx", "inflow_vy",
        "minv_s_m", "has_inflow2", "bf16_dev",
    ),
)
def _fused_step_generic(f, rho, vel, flags, phi, H, W, TH, tau,
                        inflow_density, inflow_vx, inflow_vy, minv_s_m,
                        has_inflow2, bf16_dev=False):
    n = H // TH
    f32 = jnp.float32
    fst = jnp.bfloat16 if bf16_dev else f32
    k = _make_full_kernel(
        H, W, TH, tau, inflow_density, inflow_vx, inflow_vy, minv_s_m,
        has_inflow2, lambda i: i, bf16_dev=bf16_dev,
    )
    in_specs, out_specs = _full_specs(H, W, TH, lambda i: i)
    return pl.pallas_call(
        k,
        grid=(n,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((9, H, W), fst),
            jax.ShapeDtypeStruct((H, W), f32),
            jax.ShapeDtypeStruct((2, H, W), f32),
        ],
    )(flags, flags, flags, f, f, f, vel, vel, vel, rho, phi)


def make_fused_step(cfg, tile_rows: int = 8, split: bool = True,
                    interior_rows: int = 32, bf16_dev: bool = False):
    """Fused-step function with the same (state, fields) API as
    `models.cylinder.make_step`. Assumes obs_vel == 0, force == 0, and
    initial wall rho == cfg.density / wall vel == 0 (all hold for the
    static-cylinder scene; the macro obstacle passthrough keeps the wall
    values at their initial state forever)."""
    H, W = cfg.res
    assert H % tile_rows == 0, "H must be divisible by the tile height"
    minv_s_m, _ = _collide.mrt_matrices(cfg.tau)
    minv_t = tuple(tuple(float(x) for x in row) for row in minv_s_m)
    # interior tiles want to be large (halo traffic ~ 48/T row-planes);
    # shrink until the band geometry leaves interior tiles to run on
    T = interior_rows
    use_split = False
    while split and T >= 8:
        if H % T == 0 and T % tile_rows == 0:
            n, b0, b1 = _band_tiles(cfg, T)
            if b0 >= 1 and b1 <= n - 2 and (n - ((b1 - b0 + 1) + 2)) > 0:
                use_split = True
                break
        T //= 2

    def step(state, fields):
        common = (
            state["f"], state["rho"], state["vel"],
            fields["flags"], fields["phi_obs"],
        )
        if use_split:
            f, rho_new, vel_new = _fused_step_split(
                *common, H, W, T, tile_rows, float(cfg.tau),
                float(cfg.density), 0.0, float(cfg.Vmax), minv_t, False,
                b0, b1, bf16_dev=bf16_dev,
            )
        else:
            f, rho_new, vel_new = _fused_step_generic(
                *common, H, W, tile_rows, float(cfg.tau),
                float(cfg.density), 0.0, float(cfg.Vmax), minv_t, False,
                bf16_dev=bf16_dev,
            )
        return {"f": f, "rho": rho_new, "vel": vel_new}

    return step


def make_fused_cylinder_runner(cfg, tile_rows: int = 8, split: bool = True,
                               interior_rows: int = 32,
                               bf16_dev: bool = False):
    """Runner advancing n steps by dispatching the jitted step per
    iteration. (Wrapping the two pallas calls in lax.fori_loop was
    measured ~5x slower: the while-loop carry forces XLA to copy the
    state buffers every iteration; per-step dispatch overhead is tiny by
    comparison at 2048^2.)"""
    step = make_fused_step(cfg, tile_rows, split=split,
                           interior_rows=interior_rows, bf16_dev=bf16_dev)

    def run(state, fields, n: int):
        for _ in range(n):
            state = step(state, fields)
        return state

    return run
