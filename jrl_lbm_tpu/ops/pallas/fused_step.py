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

import itertools
import os
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


# opposite-direction population pairs of this E ordering (REFL[q] = q̄)
_QPAIRS = ((1, 3), (2, 4), (5, 7), (6, 8))


def _feq_terms(rho, ux, uy):
    """Equilibrium (works for both scalars and tiles) -> 9 values.

    Division-free common-subexpression form of
    w_q rho (1 + eu/cs2 + eu^2/(2 cs4) - u^2/(2 cs2)): opposite
    directions share eu^2, the diagonal pairs share eu = ux±uy. Exact
    algebra — only the f32 summation order differs from the naive form.
    """
    uv = ux * ux + uy * uy
    base = 1.0 - 1.5 * uv
    eus = {1: ux, 2: uy, 5: ux + uy, 6: uy - ux}
    out = [None] * 9
    out[0] = rho * (float(W_Q[0]) * base)
    for q, qb in _QPAIRS:
        eu = eus[q]
        c = base + 4.5 * (eu * eu)
        e3 = 3.0 * eu
        rw = rho * float(W_Q[q])
        out[q] = rw * (c + e3)
        out[qb] = rw * (c - e3)
    return out


def _pair_decomp(A):
    """Even/odd decomposition of the 9x9 relaxation matrix over the
    opposite-direction pair basis u_p = d_q + d_q̄, v_p = d_q - d_q̄:
    A[q]·d = Σ_p a_p u_p + Σ_p b_p v_p with a/b = (A[q][i] ± A[q][ī])/2.
    Because every MRT moment has definite parity under e -> -e, paired
    output rows share their even part (a_q̄ = a_q, b_q̄ = -b_q) — the
    check below verifies this numerically and returns None on failure
    (caller falls back to the dense 81-FMA loop)."""
    ev = {}
    od = {}
    for q in range(9):
        ev[q] = [A[q][0]] + [0.5 * (A[q][i] + A[q][j]) for i, j in _QPAIRS]
        od[q] = [0.5 * (A[q][i] - A[q][j]) for i, j in _QPAIRS]
    tol = 1e-10
    for q, qb in _QPAIRS:
        if any(abs(x - y) > tol for x, y in zip(ev[q], ev[qb])):
            return None
        if any(abs(x + y) > tol for x, y in zip(od[q], od[qb])):
            return None
    if any(abs(x) > tol for x in od[0]):
        return None
    return ev, od


def _mrt_apply(A, fb, feq_n, is_obs, f_out, st=None):
    """Unrolled M^-1 S M relaxation + obstacle passthrough. ``st(val, q)``
    converts to the storage format (bf16 deviation) before the write.

    Paired even/odd form: opposite directions share the even-moment dot
    product (the full 9x9 contraction is 81 FMAs; this is ~66 ops).
    Exact algebra for any parity-respecting MRT matrix."""
    d = [feq_n[q] - fb[q] for q in range(9)]
    dec = _pair_decomp(A)

    def put(q, val):
        val = jnp.where(is_obs, fb[q], val)
        f_out[q] = val if st is None else st(val, q)

    if dec is None:  # nonstandard relaxation matrix: dense fallback
        for a in range(9):
            omega = A[a][0] * d[0]
            for b in range(1, 9):
                omega = omega + A[a][b] * d[b]
            put(a, fb[a] + omega)
        return

    ev, od = dec
    u = [d[0]] + [d[i] + d[j] for i, j in _QPAIRS]
    v = [d[i] - d[j] for i, j in _QPAIRS]

    def dot(coeffs, vals):
        acc = None
        for c, x in zip(coeffs, vals):
            if c == 0.0:
                continue
            term = x if c == 1.0 else c * x
            acc = term if acc is None else acc + term
        return 0.0 if acc is None else acc

    put(0, fb[0] + dot(ev[0], u))
    for q, qb in _QPAIRS:
        e_part = dot(ev[q], u)
        o_part = dot(od[q], v)
        put(q, fb[q] + (e_part + o_part))
        put(qb, fb[qb] + (e_part - o_part))


# --- bf16 deviation storage (docs/PERFORMANCE.md bf16 experiment) -----------
# f populations sit near the lattice weights (rho ~ 1, u << 1), so raw
# bf16 would put its ~0.4% relative noise on O(0.1..0.45) values. Storing
# the DEVIATION g_q = f_q - w_q instead keeps the stored magnitudes at
# O(rho-1, u) ~ 1e-2, recovering ~1.5 decimal digits. The weight shift
# commutes with streaming (w_q is constant per plane and w[REFL[q]] ==
# w[q]), so load = g + w_q, store = f - w_q, everything else unchanged.
#
# Mode "sr" additionally rounds each store STOCHASTICALLY: round-to-
# nearest makes the per-step rounding error systematic (finding 11: it
# acts as added dissipation and suppresses the Re~90 shedding limit
# cycle); stochastic rounding is unbiased, so the error accumulates as a
# random walk instead of a drift. Implementation: add a uniform 16-bit
# integer to the f32 bit pattern and truncate the low 16 bits (the top
# 16 bits of an f32 ARE its bf16 representation); carries propagating
# into the exponent round up to the next binade, which is exactly SR.
# Requires in-kernel PRNG (pltpu.prng_*) — real-TPU only, no interpret
# lowering exists.

# One process-wide seed counter shared by ALL 'sr' kernel factories
# (step and step2): per-factory counters would replay the same
# pltpu.prng_seed values across kernel families in a mixed k=2/k=1 run,
# correlating the stochastic-rounding noise between steps.
_SR_SEED_COUNTER = itertools.count(1)


def _mk_ld_st(bf16_dev):
    if not bf16_dev:
        return (lambda x, q: x), None

    def ld(x, q):
        return x.astype(jnp.float32) + float(W_Q[q])

    if bf16_dev == "sr":
        def st(x, q):
            y = x - float(W_Q[q])
            b = jax.lax.bitcast_convert_type(y, jnp.uint32)
            r = pltpu.prng_random_bits(y.shape)
            if r.dtype != jnp.uint32:
                r = jax.lax.bitcast_convert_type(r, jnp.uint32)
            b = (b + (r & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
            return jax.lax.bitcast_convert_type(b, jnp.float32).astype(
                jnp.bfloat16
            )

        return ld, st

    def st(x, q):
        return (x - float(W_Q[q])).astype(jnp.bfloat16)

    return ld, st


def _seeded(kernel_body, bf16_dev):
    """Prepend an SMEM seed ref + per-tile PRNG seeding when the storage
    mode is stochastic-rounding."""
    if bf16_dev != "sr":
        return kernel_body

    def kernel(seed_ref, *args):
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
        kernel_body(*args)

    return kernel


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
        tqr = tq / (tq + 1.0)  # hoisted: one divide instead of 18
        for q in range(9):
            ex, ey = int(E[q, 0]), int(E[q, 1])
            nbr_obs = pull(obs_pad, -ex, -ey, "minmax") > 0.5
            v_q = nbr_obs & t_ok
            valid.append(v_q)
            vmask = v_q.astype(jnp.float32)
            count = count + vmask
            ux = pull(vel_pad[0], ex, ey, "minmax")
            uy = pull(vel_pad[1], ex, ey, "minmax")
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
        # (A fully fused pair-basis macro+MRT form was tried here and
        # regressed the kernel 2.6x — see docs/PERFORMANCE.md.)
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

    return _seeded(kernel, bf16_dev)


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


def _make_interior_kernel(W, TH, minv_s_m, wall_density, bf16_dev=False,
                          write_macro=True):
    A = [[float(minv_s_m[a][b]) for b in range(9)] for a in range(9)]
    ld, st = _mk_ld_st(bf16_dev)

    def kernel(f_m, up2, up5, up6, dn4, dn7, dn8, f_out, *macro_out):
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
        if write_macro:
            rho_out, vel_out = macro_out
            rho_out[:] = rho_n
            vel_out[0] = u_x
            vel_out[1] = u_y

    return _seeded(kernel, bf16_dev)


# ---------------------------------------------------------------------------
# Temporal blocking (k=2): two lattice steps per kernel pass.
#
# The skip-macro experiment measured writes at ~25-30% of the fused step
# (docs/PERFORMANCE.md): running TWO steps inside one kernel halves the
# per-step f write AND read traffic. The classic overlapped scheme: a
# tile computes step 1 on its rows +-1 extended rows in-register (the
# extended rows are recomputed redundantly by the neighbouring tile, the
# cost is ~(T+2)/T compute), then step 2 on its own rows.
#
# Requirements (all hold for the cylinder split geometry):
# * interior tiles' extended rows and their pull range (+-3 rows of the
#   tile) must be plain-channel rows — the band's 4-row cylinder margin
#   provides exactly this cushion (see _band_tiles);
# * band tiles get their 2-deep halos for free (they already load whole
#   +-BT-row neighbour blocks); phi needs +-1 halo blocks (new inputs);
# * step-1 values computed on a tile's extended rows must equal what the
#   OWNING tile computes for them: both kernels run the same arithmetic
#   in the same order on plain rows, so the redundant computation is
#   bitwise-consistent;
# * OBSTACLE rho is time-invariant at its initial value (cfg.density)
#   in this kernel family (contact-angle extrapolation skipped), so the
#   step-1 obstacle rho passthrough is a scalar — no rho input.
# ---------------------------------------------------------------------------


def _lean_step_rows(fp, R, W, A, wall_density, feq_in_unused=None):
    """One plain-channel step (wall columns at x=0/W-1, everything else
    FLUID) on R rows, given 9 padded (R+2, W) planes. Returns
    (f_new_postcollide, rho, ux, uy) as lists/planes of R rows. Same
    arithmetic, in the same order, as `_make_interior_kernel`."""
    gx = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    at_x0 = gx == 0
    at_xW = gx == W - 1
    is_obs = at_x0 | at_xW
    nbr_lo = gx == 1
    nbr_hi = gx == W - 2

    def mid(q):
        return fp[q][1 : 1 + R, :]

    def pull(q):
        ex, ey = int(E[q, 0]), int(E[q, 1])
        rows = fp[q][1 - ey : 1 - ey + R, :]
        if ex == 0:
            return rows
        base = pltpu.roll(rows, ex % W, axis=1)
        if ex == 1:
            return jnp.where(at_x0, pltpu.roll(rows, W - 1, axis=1), base)
        return jnp.where(at_xW, pltpu.roll(rows, 1, axis=1), base)

    raw_in = [mid(0)] + [pull(q) for q in range(1, 9)]
    f_new = [raw_in[0]]
    for q in range(1, 9):
        ex = int(E[q, 0])
        streamed = raw_in[q]
        if ex == 1:
            streamed = jnp.where(nbr_lo, mid(int(REFL[q])), streamed)
        elif ex == -1:
            streamed = jnp.where(nbr_hi, mid(int(REFL[q])), streamed)
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

    f_out = [None] * 9
    _mrt_apply(A, f_new, _feq_terms(rho_n, u_x, u_y), is_obs, f_out)
    return f_out, rho_n, u_x, u_y


def _make_interior_kernel2(W, T, minv_s_m, wall_density, write_macro=True,
                           bf16_dev=False, k=2):
    """k steps per pass on T-row interior tiles (temporal blocking).
    Halo inputs are whole (9, 8, W) neighbouring row-groups (step j+1
    needs step-j values at +-1 rows, which mix all 9 populations — the
    6-plane channel-split halo of the k=1 kernel no longer suffices);
    the 8-row groups bound k <= 8. Storage conversion touches only the
    HBM edges: loads convert to f32 once, intermediates stay f32 in
    VMEM, the single store converts back. Redundant compute is
    2*(1 + ... + (k-1)) = k(k-1) extra rows per tile per pass."""
    assert 2 <= k <= 8
    A = [[float(minv_s_m[a][b]) for b in range(9)] for a in range(9)]
    ld, st = _mk_ld_st(bf16_dev)

    def kernel(f_m, up, dn, f_out, *macro_out):
        cur = [
            jnp.concatenate(
                [ld(up[q][-k:, :], q), ld(f_m[q], q), ld(dn[q][:k, :], q)],
                axis=0,
            )
            for q in range(9)
        ]  # (T+2k, W): rows t0-k .. t0+T+k-1
        for j in range(k - 1, 0, -1):
            cur, _, _, _ = _lean_step_rows(cur, T + 2 * j, W, A, wall_density)
        f2, rho_n, u_x, u_y = _lean_step_rows(cur, T, W, A, wall_density)
        for q in range(9):
            f_out[q] = f2[q] if st is None else st(f2[q], q)
        if write_macro:
            rho_out, vel_out = macro_out
            rho_out[:] = rho_n
            vel_out[0] = u_x
            vel_out[1] = u_y

    return _seeded(kernel, bf16_dev)


def _full_step_rows(fp, vxp, vyp, flagsp, phi, gy0, R, H, W, A, FEQ_IN,
                    tau, inflow_density, inflow_vx, inflow_vy,
                    wall_density, variant="full"):
    """One full-boundary step on R rows given (R+2, W) padded f/vel/flags
    planes and an (R, W) phi block; gy0 = global row index of out-row 0.
    Same arithmetic, in the same order, as `_make_full_kernel`, with the
    OBSTACLE rho passthrough as the scalar `wall_density` (time-invariant
    in this kernel family). Returns (f_new, rho, ux, uy).

    ``variant`` statically specializes the step for the split-band tile
    sets (pl.when would NOT skip the pure compute — Mosaic hoists it, see
    CLAUDE.md — so dead sections must be cut at trace time):

    * ``"cyl"``  — tiles strictly inside (0, H-1): drops the INFLOW /
      OUTFLOW sections and the y-global-border streaming candidates
      (exact when the tile rows and their pull context exclude rows 0
      and H-1 — guaranteed by the `_band_tiles` b0>=1 / b1<=n-2 split
      precondition).
    * ``"edge"`` — the INFLOW/OUTFLOW tiles: drops the solid-fluid
      coupling (exact when phi stays outside sub-grid-interp range on
      the tile rows, i.e. the cylinder band does not touch tiles 0 /
      n-1) and with it every vel/phi read: pass vxp = vyp = phi = None.
      Wall-column vel passthrough becomes the invariant 0 (the same
      assumption `_make_interior_kernel` documents).
    """
    y_borders = variant != "cyl"
    do_sfc = variant != "edge"
    gx = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    at_x0 = gx == 0
    at_xW = gx == W - 1
    if y_borders:
        gy = gy0 + jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
        at_y0 = gy == 0
        at_yH = gy == H - 1
    else:
        at_y0 = at_yH = None

    flags = flagsp[1 : 1 + R, :]
    is_fluid = flags == FLUID
    not_fluid = jnp.logical_not(is_fluid)
    is_obs = flags == OBSTACLE
    obs_pad = (flagsp == OBSTACLE).astype(jnp.float32)
    eps = 1e-10
    t_ok = (phi > -eps) & (phi <= 1.0 + eps) if do_sfc else None

    def pull(plane_pad, ex, ey, style):
        def rows(yoff):
            return plane_pad[1 + yoff : 1 + yoff + R, :]

        def shift_x(arr, xoff):
            if xoff == 0:
                return arr
            return pltpu.roll(arr, (-xoff) % W, axis=1)

        def cands(e_comp, lo_mask, hi_mask):
            cs = [(None, -e_comp)]
            if lo_mask is None:  # y candidates dropped for "cyl" tiles
                return cs
            if e_comp == 1:
                cs.append((lo_mask & not_fluid, 1 if style == "reflect" else 0))
            elif e_comp == -1:
                cs.append((hi_mask & not_fluid, -1 if style == "reflect" else 0))
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

    f_mid = [fp[q][1 : 1 + R, :] for q in range(9)]
    raw_in = [f_mid[0]]
    for q in range(1, 9):
        ex, ey = int(E[q, 0]), int(E[q, 1])
        raw_in.append(pull(fp[q], ex, ey, "reflect"))
    f_new = [f_mid[0]]
    for q in range(1, 9):
        ex, ey = int(E[q, 0]), int(E[q, 1])
        nbr_obs = pull(obs_pad, ex, ey, "reflect") > 0.5
        f_this = f_mid[int(REFL[q])]
        if do_sfc:
            nxt = pull(fp[int(REFL[q])], -ex, -ey, "reflect")
            v1 = (2.0 * phi - 1.0) * raw_in[q] + (2.0 - 2.0 * phi) * f_this
            v2 = (2.0 * phi) * f_this + (1.0 - 2.0 * phi) * nxt
            v_obs = jnp.where(t_ok, jnp.where(phi >= 0.5, v1, v2), f_this)
        else:  # t_ok is statically all-False on edge tiles
            v_obs = f_this
        streamed = jnp.where(nbr_obs, v_obs, raw_in[q])
        f_new.append(jnp.where(is_obs, raw_in[int(REFL[q])], streamed))

    if y_borders:
        in_mask = flags == INFLOW
        for q in range(9):
            f_new[q] = jnp.where(in_mask, FEQ_IN[q], f_new[q])
        rho_after = jnp.where(in_mask, inflow_density, wall_density)
        if do_sfc:
            velx_after = jnp.where(in_mask, inflow_vx, vxp[1 : 1 + R, :])
            vely_after = jnp.where(in_mask, inflow_vy, vyp[1 : 1 + R, :])
        else:
            velx_after = jnp.where(in_mask, inflow_vx, 0.0)
            vely_after = jnp.where(in_mask, inflow_vy, 0.0)

        of_mask = flags == OUTFLOW
        for q in range(9):
            g = f_new[q]
            g = jnp.where(at_y0, pltpu.roll(g, R - 1, axis=0), g)
            g = jnp.where(at_yH, pltpu.roll(g, 1, axis=0), g)
            g = jnp.where(at_x0, pltpu.roll(g, W - 1, axis=1), g)
            g = jnp.where(at_xW, pltpu.roll(g, 1, axis=1), g)
            f_new[q] = jnp.where(of_mask, g, f_new[q])
    else:
        rho_after = wall_density
        velx_after = vxp[1 : 1 + R, :]
        vely_after = vyp[1 : 1 + R, :]

    if do_sfc:
        skip = is_obs | at_xW
        if y_borders:
            skip = skip | at_yH
        rho_tgt = f_new[0]
        for q in range(1, 9):
            rho_tgt = rho_tgt + f_new[q]
        vel_tgt_x = jnp.zeros((R, W), jnp.float32)
        vel_tgt_y = jnp.zeros((R, W), jnp.float32)
        count = jnp.zeros((R, W), jnp.float32)
        valid = []
        tq = jnp.where(t_ok, phi, 0.0)
        tqr = tq / (tq + 1.0)  # hoisted: one divide instead of 18
        for q in range(9):
            ex, ey = int(E[q, 0]), int(E[q, 1])
            nbr_obs = pull(obs_pad, -ex, -ey, "minmax") > 0.5
            v_q = nbr_obs & t_ok
            valid.append(v_q)
            vmask = v_q.astype(jnp.float32)
            count = count + vmask
            ux = pull(vxp, ex, ey, "minmax")
            uy = pull(vyp, ex, ey, "minmax")
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

        g00, g01 = grad12(vxp)
        g10, g11 = grad12(vyp)

        for q in range(9):
            qi = int(REFL[q])
            e0, e1 = float(E[qi, 0]), float(E[qi, 1])
            pab = (u0 * u0 - CS2 * tau * (g00 + g00)) * (e0 * e0 - CS2)
            pab = pab + (u1 * u0 - CS2 * tau * (g10 + g01)) * (e1 * e0)
            pab = pab + (u0 * u1 - CS2 * tau * (g01 + g10)) * (e0 * e1)
            pab = pab + (u1 * u1 - CS2 * tau * (g11 + g11)) * (e1 * e1 - CS2)
            recon = float(W_Q[qi]) * rho_tgt * (
                1.0 + (1.0 / CS2) * (u0 * e0 + u1 * e1)
                + 0.5 * pab / (CS2 * CS2)
            )
            mask = valid[q] & jnp.logical_not(skip)
            f_new[qi] = jnp.where(mask, recon, f_new[qi])

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


def _make_full_kernel2(H, W, BT, tau, inflow_density, inflow_vx, inflow_vy,
                       minv_s_m, tile_map, bf16_dev=False, k=2,
                       variant="full"):
    """k full-boundary steps per pass on BT-row band tiles. The k-deep
    f/vel/flags halos come from the whole neighbour blocks the k=1 kernel
    already loads (bounding k <= BT); phi halos come from its full
    neighbour blocks. Step j runs on BT + 2(k-j) extended rows; its
    outputs are exactly the padded planes step j+1 needs. The chained
    vel is the step-j macro velocity, which is all later steps consume
    (coupling stencils + INFLOW head; plain-fluid rows never read it).

    ``variant`` specializes per band-tile set (see `_full_step_rows`):
    "cyl" drops the y-border/INFLOW/OUTFLOW code, "edge" drops the
    solid-fluid coupling AND the vel/phi inputs entirely (the kernel
    signature shrinks to flags + f blocks)."""
    assert 2 <= k <= BT
    A = [[float(minv_s_m[a][b]) for b in range(9)] for a in range(9)]
    FEQ_IN = _feq_terms(inflow_density, inflow_vx, inflow_vy)
    ld, st = _mk_ld_st(bf16_dev)

    def stitchk(tp, md, bt):
        return jnp.concatenate([tp[-k:, :], md, bt[:k, :]], axis=0)

    args = (H, W, A, FEQ_IN, tau, inflow_density, inflow_vx, inflow_vy,
            inflow_density)

    def chain(t0, cur, cvx, cvy, flagsp, phip, f_out, rho_out, vel_out):
        rho_n = u_x = u_y = None
        for j in range(1, k + 1):
            R = BT + 2 * (k - j)
            fl = flagsp[j - 1 : j - 1 + R + 2, :]
            ph = None if phip is None else phip[j - 1 : j - 1 + R, :]
            cur, rho_n, u_x, u_y = _full_step_rows(
                cur, cvx, cvy, fl, ph, t0 - (k - j), R, *args,
                variant=variant,
            )
            if variant != "edge":
                cvx, cvy = u_x, u_y
        for q in range(9):
            f_out[q] = cur[q] if st is None else st(cur[q], q)
        rho_out[:] = rho_n
        vel_out[0] = u_x
        vel_out[1] = u_y

    if variant == "edge":

        def kernel(
            fl_tp, fl_m, fl_bt,
            f_tp, f_m, f_bt,
            f_out, rho_out, vel_out,
        ):
            t0 = tile_map(pl.program_id(0)) * BT
            cur = [ld(stitchk(f_tp[q], f_m[q], f_bt[q]), q) for q in range(9)]
            flagsp = stitchk(fl_tp[:], fl_m[:], fl_bt[:])
            chain(t0, cur, None, None, flagsp, None,
                  f_out, rho_out, vel_out)

    else:

        def kernel(
            fl_tp, fl_m, fl_bt,
            f_tp, f_m, f_bt,
            vel_tp, vel_m, vel_bt,
            phi_tp, phi_m, phi_bt,
            f_out, rho_out, vel_out,
        ):
            t0 = tile_map(pl.program_id(0)) * BT
            cur = [
                ld(stitchk(f_tp[q], f_m[q], f_bt[q]), q) for q in range(9)
            ]  # BT+2k rows: t0-k .. t0+BT+k-1
            cvx = stitchk(vel_tp[0], vel_m[0], vel_bt[0])
            cvy = stitchk(vel_tp[1], vel_m[1], vel_bt[1])
            flagsp = stitchk(fl_tp[:], fl_m[:], fl_bt[:])
            if k - 1 > 0:
                phip = jnp.concatenate(
                    [phi_tp[-(k - 1):, :], phi_m[:], phi_bt[: k - 1, :]],
                    axis=0,
                )  # BT+2(k-1) rows: t0-(k-1) .. t0+BT+k-2
            else:
                phip = phi_m[:]
            chain(t0, cur, cvx, cvy, flagsp, phip, f_out, rho_out, vel_out)

    return _seeded(kernel, bf16_dev)


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------

def _band_tiles(cfg, T, margin=4.0):
    """Interior-tile (T-row) indices that need the full-boundary kernel:
    the INFLOW tile (0), the OUTFLOW tile (n-1), and [b0, b1] covering
    the cylinder +-margin. For k-step temporal blocking the margin must
    be >= k+1 rows: interior tiles lean-compute intermediate values up
    to k-1 rows inside the band edge, and those rows' whole +-1
    streaming context must stay outside sub-grid-interp range (t_ok
    reaches ~1 cell past the cylinder surface)."""
    H, _ = cfg.res
    n = H // T
    cy = cfg.center[1]
    r = cfg.D / 2.0
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


def _fused_step_split_impl(f, rho, vel, flags, phi, H, W, T, BT, tau,
                           inflow_density, inflow_vx, inflow_vy, minv_s_m,
                           has_inflow2, b0, b1, bf16_dev=False,
                           write_macro=True, seed=None):
    """Two-call split: interior tiles of T rows (lean kernel, minimal
    halos), band tiles of BT rows (full-boundary kernel) covering
    interior-tile indices {0, b0..b1, n-1}. T and BT may differ (the
    interior kernel's traffic scales as 9 + 48/T row-planes, so it wants
    large tiles; the full kernel's VMEM footprint wants small ones).

    ``write_macro=False`` drops the rho/vel outputs from the interior
    call (write traffic 12 -> 9.x planes/step): interior-row macros are
    only ever consumed at dump instants (recompute them with
    `make_macro_refresh`), while the band kernel — the only per-step
    consumer, through its SFC vel halos — never reaches reconstruction
    range of an interior tile (the band covers the cylinder with a
    4-row margin). Band rows of rho/vel are updated in place into the
    incoming (donated) buffers."""
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
                               bf16_dev=bf16_dev, write_macro=write_macro)
    if write_macro:
        int_out_specs = [ib3(), ib2(), ib3(2)]
        int_out_shape = [
            jax.ShapeDtypeStruct((9, H, W), fst),
            jax.ShapeDtypeStruct((H, W), f32),
            jax.ShapeDtypeStruct((2, H, W), f32),
        ]
    else:
        int_out_specs = [ib3()]
        int_out_shape = [jax.ShapeDtypeStruct((9, H, W), fst)]
    sr = bf16_dev == "sr"
    smem = [pl.BlockSpec(memory_space=pltpu.SMEM)] if sr else []
    seed_i = (seed * 2,) if sr else ()
    seed_b = (seed * 2 + 1,) if sr else ()
    int_out = pl.pallas_call(
        ik,
        grid=(n_int,),
        in_specs=smem + [ib3()]
        + [halo(q, up=True) for q in UP_Q]
        + [halo(q, up=False) for q in DN_Q],
        out_specs=int_out_specs,
        out_shape=int_out_shape,
    )(*seed_i, f, f, f, f, f, f, f)
    if write_macro:
        f1, rho1, vel1 = int_out
    else:
        (f1,), rho1, vel1 = int_out, rho, vel

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
    in_specs = smem + in_specs
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
    )(*seed_b, flags, flags, flags, f, f, f, vel, vel, vel, rho, phi)

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


_SPLIT_STATIC = (
    "H", "W", "T", "BT", "tau", "inflow_density", "inflow_vx", "inflow_vy",
    "minv_s_m", "has_inflow2", "b0", "b1", "bf16_dev", "write_macro",
)
_fused_step_split = jax.jit(_fused_step_split_impl, static_argnames=_SPLIT_STATIC)
# write_macro=False updates band rows of rho/vel in place; donating those
# buffers lets XLA skip the defensive whole-array copy (the caller's step
# loop always discards the previous state).
_fused_step_split_donated = jax.jit(
    _fused_step_split_impl, static_argnames=_SPLIT_STATIC, donate_argnums=(1, 2)
)


_K2_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _fused_step2_split_impl(f, rho, vel, flags, phi, H, W, T, BT, tau,
                            inflow_density, inflow_vx, inflow_vy, minv_s_m,
                            b0, b1, write_macro=False, bf16_dev=False,
                            seed=None, k=2):
    """k lattice steps in one pass (temporal blocking), split into the
    same interior/band tile sets as `_fused_step_split_impl`. Divides
    the per-step f read+write HBM traffic and dispatch count by k at
    ~k(k-1)/(kT) redundant compute. Requires band tiles placed with a
    >= k-row plain-fluid margin (`_band_tiles(margin=...)`): interior
    tiles lean-compute intermediate rows up to k-1 rows inside the band
    region, which must stay out of sub-grid-interp range of the
    geometry."""
    n = H // T
    T8 = T // 8
    n_band_tiles = (b1 - b0 + 1) + 2
    n_int = n - n_band_tiles
    c1 = b0 - 1
    gap = b1 - b0 + 2

    def int_map(i):
        return jnp.where(i < c1, i + 1, i + gap)

    f32 = jnp.float32

    def ib2():
        return pl.BlockSpec(
            (T, W), lambda i: (int_map(i), 0), memory_space=pltpu.VMEM
        )

    def ib3(c=9):
        return pl.BlockSpec(
            (c, T, W), lambda i: (0, int_map(i), 0), memory_space=pltpu.VMEM
        )

    # whole (9, 8, W) halo groups: step j+1 needs step-j values at +-1
    # rows, which mix all 9 populations of rows t0-k..t0-1 / t0+T..t0+T+k-1
    up_spec = pl.BlockSpec(
        (9, 8, W), lambda i: (0, T8 * int_map(i) - 1, 0), memory_space=pltpu.VMEM
    )
    dn_spec = pl.BlockSpec(
        (9, 8, W), lambda i: (0, T8 * (int_map(i) + 1), 0), memory_space=pltpu.VMEM
    )

    ik = _make_interior_kernel2(W, T, minv_s_m, float(inflow_density),
                                write_macro=write_macro, bf16_dev=bf16_dev,
                                k=k)
    fst = jnp.bfloat16 if bf16_dev else f32
    sr = bf16_dev == "sr"
    smem = [pl.BlockSpec(memory_space=pltpu.SMEM)] if sr else []
    # three kernel calls need three globally-unique seed streams: the
    # caller draws TWO counter values (a, b); {2a, 2a+1, 2b} can never
    # collide with each other or with any other call's streams (counter
    # values are unique; evens come from distinct draws, odds likewise)
    seed_i = (seed[0:1] * 2,) if sr else ()
    seed_b = (seed[0:1] * 2 + 1,) if sr else ()
    seed_e = (seed[1:2] * 2,) if sr else ()
    if write_macro:
        int_out_specs = [ib3(), ib2(), ib3(2)]
        int_out_shape = [
            jax.ShapeDtypeStruct((9, H, W), fst),
            jax.ShapeDtypeStruct((H, W), f32),
            jax.ShapeDtypeStruct((2, H, W), f32),
        ]
    else:
        int_out_specs = [ib3()]
        int_out_shape = [jax.ShapeDtypeStruct((9, H, W), fst)]
    int_out = pl.pallas_call(
        ik,
        grid=(n_int,),
        in_specs=smem + [ib3(), up_spec, dn_spec],
        out_specs=int_out_specs,
        out_shape=int_out_shape,
        compiler_params=_K2_VMEM,
    )(*seed_i, f, f, f)
    if write_macro:
        f1, rho1, vel1 = int_out
    else:
        (f1,), rho1, vel1 = int_out, rho, vel

    # ---- band calls (same tile set/merge as the k=1 split, but split
    # further into a "cyl" call (tiles b0..b1, no y-border/in/outflow
    # code) and an "edge" call (tiles 0 and n-1, no solid-fluid coupling
    # and no vel/phi reads) — statically specialized kernels, since
    # pl.when would not skip the dead compute. Exactness preconditions
    # (cylinder band strictly inside (0, n-1)) are the split's b0>=1 /
    # b1<=n-2 invariant, asserted here. ----
    assert b0 >= 1 and b1 <= n - 2
    TB = T // BT
    b_ = (b1 - b0 + 1) * TB
    nH = H // BT

    def cyl_map(i):
        return b0 * TB + i

    def edge_map(i):
        return jnp.where(i < TB, i, nH - 2 * TB + i)

    def mk_specs(im_mid, im_up, im_dn, with_velphi):
        def b2(im):
            return pl.BlockSpec(
                (BT, W), lambda i: (im(i), 0), memory_space=pltpu.VMEM
            )

        def b3(im, c=9):
            return pl.BlockSpec(
                (c, BT, W), lambda i: (0, im(i), 0), memory_space=pltpu.VMEM
            )

        specs = [
            b2(im_up), b2(im_mid), b2(im_dn),  # flags
            b3(im_up), b3(im_mid), b3(im_dn),  # f
        ]
        if with_velphi:
            specs += [
                b3(im_up, 2), b3(im_mid, 2), b3(im_dn, 2),  # vel
                b2(im_up), b2(im_mid), b2(im_dn),  # phi
            ]
        return specs

    def compact_out(nt):
        return (
            [
                pl.BlockSpec(
                    (9, BT, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (BT, W), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (2, BT, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM
                ),
            ],
            [
                jax.ShapeDtypeStruct((9, nt * BT, W), fst),
                jax.ShapeDtypeStruct((nt * BT, W), f32),
                jax.ShapeDtypeStruct((2, nt * BT, W), f32),
            ],
        )

    # cyl tiles sit strictly inside the domain: plain +-1 neighbours
    ck = _make_full_kernel2(
        H, W, BT, tau, inflow_density, inflow_vx, inflow_vy, minv_s_m,
        cyl_map, bf16_dev=bf16_dev, k=k, variant="cyl",
    )
    c_specs, c_shape = compact_out(b_)
    fcc, rhocc, velcc = pl.pallas_call(
        ck,
        grid=(b_,),
        in_specs=smem + mk_specs(
            cyl_map, lambda i: cyl_map(i) - 1, lambda i: cyl_map(i) + 1, True
        ),
        out_specs=c_specs,
        out_shape=c_shape,
        compiler_params=_K2_VMEM,
    )(*seed_b, flags, flags, flags, f, f, f, vel, vel, vel, phi, phi, phi)

    # edge tiles wrap their outward neighbour (masked off by at_y0/at_yH)
    ek = _make_full_kernel2(
        H, W, BT, tau, inflow_density, inflow_vx, inflow_vy, minv_s_m,
        edge_map, bf16_dev=bf16_dev, k=k, variant="edge",
    )
    e_specs, e_shape = compact_out(2 * TB)
    fec, rhoec, velec = pl.pallas_call(
        ek,
        grid=(2 * TB,),
        in_specs=smem + mk_specs(
            edge_map,
            lambda i: jax.lax.rem(edge_map(i) - 1 + nH, nH),
            lambda i: jax.lax.rem(edge_map(i) + 1, nH),
            False,
        ),
        out_specs=e_specs,
        out_shape=e_shape,
        compiler_params=_K2_VMEM,
    )(*seed_e, flags, flags, flags, f, f, f)

    nb_mid = (b1 - b0 + 1) * T

    def merge(full, cyl_c, edge_c):
        full = jax.lax.dynamic_update_slice_in_dim(
            full, edge_c[..., 0:T, :], 0, axis=full.ndim - 2
        )
        full = jax.lax.dynamic_update_slice_in_dim(
            full, cyl_c[..., 0:nb_mid, :], b0 * T, axis=full.ndim - 2
        )
        full = jax.lax.dynamic_update_slice_in_dim(
            full, edge_c[..., T:, :], H - T, axis=full.ndim - 2
        )
        return full

    return (
        merge(f1, fcc, fec),
        merge(rho1, rhocc, rhoec),
        merge(vel1, velcc, velec),
    )


_SPLIT2_STATIC = (
    "H", "W", "T", "BT", "tau", "inflow_density", "inflow_vx", "inflow_vy",
    "minv_s_m", "b0", "b1", "write_macro", "bf16_dev", "k",
)
_fused_step2_split = jax.jit(_fused_step2_split_impl, static_argnames=_SPLIT2_STATIC)
_fused_step2_split_donated = jax.jit(
    _fused_step2_split_impl, static_argnames=_SPLIT2_STATIC, donate_argnums=(1, 2)
)


@partial(
    jax.jit,
    static_argnames=(
        "H", "W", "TH", "tau", "inflow_density", "inflow_vx", "inflow_vy",
        "minv_s_m", "has_inflow2", "bf16_dev",
    ),
)
def _fused_step_generic(f, rho, vel, flags, phi, H, W, TH, tau,
                        inflow_density, inflow_vx, inflow_vy, minv_s_m,
                        has_inflow2, bf16_dev=False, seed=None):
    n = H // TH
    f32 = jnp.float32
    fst = jnp.bfloat16 if bf16_dev else f32
    sr = bf16_dev == "sr"
    k = _make_full_kernel(
        H, W, TH, tau, inflow_density, inflow_vx, inflow_vy, minv_s_m,
        has_inflow2, lambda i: i, bf16_dev=bf16_dev,
    )
    in_specs, out_specs = _full_specs(H, W, TH, lambda i: i)
    if sr:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
    seed_a = (seed,) if sr else ()
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
    )(*seed_a, flags, flags, flags, f, f, f, vel, vel, vel, rho, phi)


def make_macro_refresh(cfg, bf16_dev: bool = False):
    """Recompute rho/vel from f for every non-OBSTACLE cell (OBSTACLE
    macros are time-invariant passthroughs, so the stored values are kept).

    Used with `write_macro=False` steps, whose interior tiles skip the
    per-step rho/vel writes: MRT conserves mass and momentum exactly, so
    the post-collision recompute equals the kernel's pre-collision macro
    up to f32 roundoff."""

    @jax.jit
    def refresh(state, fields):
        f = f_from_storage(state["f"], bf16_dev)
        rho_m = f[0]
        for q in range(1, 9):
            rho_m = rho_m + f[q]
        mom_x = f[1] - f[3] + f[5] - f[6] - f[7] + f[8]
        mom_y = f[2] - f[4] + f[5] + f[6] - f[7] - f[8]
        is_obs = fields["flags"] == OBSTACLE
        safe = jnp.where(rho_m == 0, 1.0, rho_m)
        rho = jnp.where(is_obs, state["rho"], rho_m)
        u_x = jnp.where(is_obs, state["vel"][0], mom_x / safe)
        u_y = jnp.where(is_obs, state["vel"][1], mom_y / safe)
        return dict(state, rho=rho, vel=jnp.stack([u_x, u_y]))

    return refresh


def make_fused_step(cfg, tile_rows: int = 8, split: bool = True,
                    interior_rows: int = 32, bf16_dev: bool = False,
                    write_macro: bool = True):
    """Fused-step function with the same (state, fields) API as
    `models.cylinder.make_step`. Assumes obs_vel == 0, force == 0, and
    initial wall rho == cfg.density / wall vel == 0 (all hold for the
    static-cylinder scene; the macro obstacle passthrough keeps the wall
    values at their initial state forever).

    ``write_macro=False`` (split path only) skips the interior tiles'
    rho/vel writes; state rho/vel stay stale on interior rows until a
    `make_macro_refresh` pass. The returned step DONATES the incoming
    rho/vel buffers in that mode — do not reuse a state dict after
    stepping it."""
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

    skip_macro = (not write_macro) and use_split
    split_fn = _fused_step_split_donated if skip_macro else _fused_step_split
    ctr = _SR_SEED_COUNTER if bf16_dev == "sr" else None

    def step(state, fields):
        seed = (
            jnp.asarray([next(ctr)], jnp.int32) if ctr is not None else None
        )
        common = (
            state["f"], state["rho"], state["vel"],
            fields["flags"], fields["phi_obs"],
        )
        if use_split:
            f, rho_new, vel_new = split_fn(
                *common, H, W, T, tile_rows, float(cfg.tau),
                float(cfg.density), 0.0, float(cfg.Vmax), minv_t, False,
                b0, b1, bf16_dev=bf16_dev, write_macro=not skip_macro,
                seed=seed,
            )
        else:
            f, rho_new, vel_new = _fused_step_generic(
                *common, H, W, tile_rows, float(cfg.tau),
                float(cfg.density), 0.0, float(cfg.Vmax), minv_t, False,
                bf16_dev=bf16_dev, seed=seed,
            )
        return {"f": f, "rho": rho_new, "vel": vel_new}

    step.skip_macro = skip_macro
    return step


def _choose_interior_T(cfg, tile_rows, interior_rows, margin=4.0):
    """Largest interior tile height that leaves interior tiles to run on
    (same policy as make_fused_step). Returns (T, b0, b1) or None."""
    H, _ = cfg.res
    T = interior_rows
    while T >= 8:
        if H % T == 0 and T % tile_rows == 0:
            n, b0, b1 = _band_tiles(cfg, T, margin=margin)
            if b0 >= 1 and b1 <= n - 2 and (n - ((b1 - b0 + 1) + 2)) > 0:
                return T, b0, b1
        T //= 2
    return None


def make_fused_step2(cfg, tile_rows: int = 8, interior_rows: int = 32,
                     write_macro: bool = False, bf16_dev=False, k: int = 2):
    """k-step temporal blocking: advances the state by k lattice steps
    per call, dividing the per-step f HBM traffic and the dispatch count
    by k. Split geometry only (returns None when the domain can't split,
    or when the k-dependent band margin can't be honoured — see
    `_band_tiles`). Supports every storage mode (f32, bf16_dev,
    bf16_dev_sr — the b025_bf16sr validation ran through the k=2 path).

    Like `make_fused_step(write_macro=False)`, the default mode keeps
    interior-row rho/vel stale (refresh with `make_macro_refresh`) and
    DONATES the incoming rho/vel buffers."""
    H, W = cfg.res
    if not (2 <= k <= min(8, tile_rows)):
        return None
    choice = _choose_interior_T(cfg, tile_rows, interior_rows,
                                margin=max(4.0, float(k + 1)))
    if choice is None:
        return None
    T, b0, b1 = choice
    minv_s_m, _ = _collide.mrt_matrices(cfg.tau)
    minv_t = tuple(tuple(float(x) for x in row) for row in minv_s_m)
    fn = _fused_step2_split if write_macro else _fused_step2_split_donated
    ctr = _SR_SEED_COUNTER if bf16_dev == "sr" else None

    def stepk(state, fields):
        # two counter draws: the pass runs THREE kernels (interior, cyl
        # band, edge band) needing three unique seed streams — see the
        # parity-split note in `_fused_step2_split_impl`
        seed = (
            jnp.asarray([next(ctr), next(ctr)], jnp.int32)
            if ctr is not None
            else None
        )
        f, rho_new, vel_new = fn(
            state["f"], state["rho"], state["vel"],
            fields["flags"], fields["phi_obs"],
            H, W, T, tile_rows, float(cfg.tau), float(cfg.density),
            0.0, float(cfg.Vmax), minv_t, b0, b1, write_macro=write_macro,
            bf16_dev=bf16_dev, seed=seed, k=k,
        )
        return {"f": f, "rho": rho_new, "vel": vel_new}

    stepk.skip_macro = not write_macro
    return stepk


def make_fused_cylinder_runner(cfg, tile_rows: int = 16, split: bool = True,
                               interior_rows: int = 32,
                               bf16_dev: bool = False,
                               write_macro: bool = False):
    """Runner advancing n steps by dispatching the jitted step per
    iteration. (Wrapping the two pallas calls in lax.fori_loop was
    measured ~5x slower: the while-loop carry forces XLA to copy the
    state buffers every iteration; per-step dispatch overhead is tiny by
    comparison at 2048^2.)

    By default the steps run with ``write_macro=False`` (interior tiles
    skip the per-step rho/vel writes) and the runner refreshes rho/vel
    once at the end of each ``run`` call, so callers always observe a
    fully consistent state at dump instants. CAUTION: this default
    DONATES the caller's rho/vel buffers — a reference kept to the
    pre-run state dies with "Array has been deleted"; rebind state from
    the return value (all in-repo callers do), or pass
    ``write_macro=True`` to keep the non-donating semantics. When the
    split geometry allows it, pairs of steps run through the double-step
    temporal-blocking kernels (any storage mode).

    ``tile_rows`` (the band-tile height BT) defaults to 16: at k=4 the
    chained band kernel runs BT+2(k-j) extended rows per step, so BT=8
    pays 37.5% redundant band rows vs 18.7% at BT=16 — measured 9676 vs
    10081 MLUPS at the 2048^2 bench (BT=32 is within noise of BT=16;
    validation/results/bench_variants.json)."""
    step = make_fused_step(cfg, tile_rows, split=split,
                           interior_rows=interior_rows, bf16_dev=bf16_dev,
                           write_macro=write_macro)
    step2 = step4 = None
    if split:
        step2 = make_fused_step2(cfg, tile_rows, interior_rows=interior_rows,
                                 write_macro=write_macro, bf16_dev=bf16_dev)
        if os.environ.get("LBM_FUSED_K", "4") == "4":
            step4 = make_fused_step2(cfg, tile_rows,
                                     interior_rows=interior_rows,
                                     write_macro=write_macro,
                                     bf16_dev=bf16_dev, k=4)
    skip = (step.skip_macro
            or (step2 is not None and step2.skip_macro)
            or (step4 is not None and step4.skip_macro))
    refresh = make_macro_refresh(cfg, bf16_dev=bf16_dev) if skip else None

    def run(state, fields, n: int):
        m = n
        if step4 is not None:
            while m >= 4:
                state = step4(state, fields)
                m -= 4
        if step2 is not None:
            while m >= 2:
                state = step2(state, fields)
                m -= 2
        for _ in range(m):
            state = step(state, fields)
        if refresh is not None and n > 0:
            state = refresh(state, fields)
        return state

    return run
