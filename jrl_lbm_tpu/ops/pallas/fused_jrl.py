"""Fused whole-loop Pallas kernel for the axisymmetric JRL fluid phase.

The JRL tip-approach workloads run tens of millions of steps on tiny
grids (128x64 at refine=1: `vel_obs ~ 1e-5` lattice units per step, so
`total_steps ~ 1e7`, `demo_2d_LBM_JRL_fluid_cylinder.py:201-203`). At
that size the unfused jnp path is bound by per-op HBM round-trips inside
the `lax.fori_loop` body (~65 us/step measured), not by arithmetic.

This kernel keeps the ENTIRE state (f, rho, vel) in VMEM for a whole
multi-step stretch: one `pallas_call` runs `n` steps with an in-kernel
`lax.fori_loop`, recomputing the moving-tip geometry (flags, phi,
obs_vel) each step from the loop index — the same
pure-function-of-step-index design as `models/jrl.py::make_fluid_step`,
just never leaving VMEM. HBM is touched once per call instead of ~50
times per step.

Physics per step (identical to the unfused ops, validated in
tests/test_fused_jrl.py):
  stream (`ops/stream.py`: pull + reflect-clamp + x=0 axis mirroring +
  sub-grid interpolation bounce + OBSTACLE store + OUTFLOW border copy)
  -> solid-fluid coupling (`ops/coupling.py`: moving-wall target
  velocity/density, 12-point velocity gradients, nonequilibrium
  pressure-tensor reconstruction)
  -> macro moments (`ops/macro.py`, OBSTACLE passthrough)
  -> BGK collision with the axisymmetric LINE_X_EQ_0 source
  (`ops/collide.py`: A1/A2/F2 terms with obstacle-pair-blocked isotropic
  grad/div stencils).

Reference call stack being fused: `demo_2d_LBM_JRL_fluid_*.py:201-236`
(propagation.cu, solid_fluid_coupling.cu, LBM_collision_2d.py:343-471).

Constraints: whole-domain single tile (the grid must fit VMEM, roughly
H*W <= 131072 cells = refine 4 at the 128x64 base); LINE_X_EQ_0 only
(the only axis any demo uses); the body force is the constant
rho_init * gravity field the demos build once at init (rho_init == 1).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

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

# Whole-domain VMEM budget. The fluid kernel's footprint (carry + refs +
# stencil temporaries) is ~24 MB at 131072 cells (512x256, refine 4) —
# above Mosaic's default 16 MB scoped-vmem limit but well within the
# chip's physical VMEM, so the kernels request a raised limit below.
# 131072 cells is validated on hardware (90.5 us/step at 512x256).
MAX_FUSED_CELLS = 131072

_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _feq9(rho, ux, uy):
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


def _layout(H, W, transposed):
    """(shape, y-axis, x-axis) of the in-kernel 2D tiles.

    The physics is on an (H=y, W=x) grid; the default layout stores it
    that way, putting x on the 128-wide lane dimension. The JRL base
    grids are 128x64 — x = 64 lanes leaves HALF the VPU idle on every
    op. ``transposed`` stores tiles as (W, H) so the 128-divisible y
    axis rides the lanes (measured ~1.5x on the collision tail; see
    docs/PERFORMANCE.md). Pure layout change: same ops, axes swapped."""
    return ((W, H), 1, 0) if transposed else ((H, W), 0, 1)


def _t2(a):
    """Swap the trailing (y, x) dims (layout transpose at kernel edges)."""
    return jnp.swapaxes(a, -1, -2)


def _want_transposed(cfg) -> bool:
    """Transposed layout pays when x underfills the 128-lane dimension
    (refine-1 JRL grids are 128x64)."""
    _, W = cfg.eff_res
    return W < 128


class _FluidKey(NamedTuple):
    """Config fields the fluid kernel bakes in (jit/Mosaic cache key);
    the step count is an SMEM scalar so segment lengths don't multiply
    kernel variants."""

    eff_res: tuple
    tau: float
    vel_obs: float
    Rg_radius: int
    box_radius: float
    inflow_height: float
    gravity_strength: float
    shape: str


def _fluid_key(cfg) -> "_FluidKey":
    return _FluidKey(
        eff_res=tuple(cfg.eff_res),
        tau=float(cfg.tau),
        vel_obs=float(cfg.vel_obs),
        Rg_radius=int(cfg.Rg_radius),
        box_radius=float(cfg.box_radius),
        inflow_height=float(cfg.inflow_height),
        gravity_strength=float(cfg.gravity_strength),
        shape=str(cfg.shape),
    )


def _make_jrl_fluid_kernel(cfg, transposed=False):
    """Kernel body closure (`cfg` is a `_FluidKey`). All cfg-derived
    quantities are Python floats (baked into the kernel); only
    (f, rho, vel, start_step, n) are traced."""
    H, W = cfg.eff_res
    SHP, AY, AX = _layout(H, W, transposed)
    tau = float(cfg.tau)
    vel_obs = float(cfg.vel_obs)
    rg = float(cfg.Rg_radius)
    box_r = float(cfg.box_radius)
    inflow_h = float(cfg.inflow_height)
    # constant body force: force = rho_init * gravity with rho_init == 1
    # everywhere (density_fluid == density_wall == 1, `fluid_init`)
    fy = float(-cfg.gravity_strength)
    flat = cfg.shape in ("cylinder", "infiniteplane")
    eps = 1e-10

    def kernel(start_ref, n_ref, f_ref, rho_ref, vel_ref,
               f_out, rho_out, vel_out):
        iy = jax.lax.broadcasted_iota(jnp.int32, SHP, AY)
        ix = jax.lax.broadcasted_iota(jnp.int32, SHP, AX)
        at_x0 = ix == 0
        at_xW = ix == W - 1
        at_y0 = iy == 0
        at_yH = iy == H - 1
        xs = ix.astype(jnp.float32) + 0.5  # mesh[0] (= r, radial coord)
        ys = iy.astype(jnp.float32) + 0.5  # mesh[1]

        # base flags (`models/jrl.py::fluid_base_flags`): top row OBSTACLE,
        # column 0 FLUID (symmetry axis), other borders OUTFLOW
        base_flags = jnp.where(
            at_yH,
            OBSTACLE,
            jnp.where(
                at_x0, FLUID, jnp.where(at_y0 | at_xW, OUTFLOW, FLUID)
            ),
        )

        start = start_ref[0, 0]

        def step(i, carry):
            f, rho, vel0, vel1 = carry
            fq = [f[q] for q in range(9)]
            step_idx = start + i.astype(jnp.float32)
            walks = inflow_h + step_idx * vel_obs
            walks_int = jnp.floor(walks + 0.5).astype(jnp.int32)

            # ---- moving-tip geometry (pure function of walks) ----
            # tip SDF: box-corner max + top-wall union (utils/sdf.py)
            tx = (xs - (rg - box_r)) - box_r
            ty = (ys - (walks - box_r)) - box_r
            ty_top = -(ys - float(H))
            if flat:
                phi = jnp.minimum(jnp.maximum(tx, ty), ty_top)
                tip = (iy < walks_int) & (ix < jnp.int32(rg))
                flags = jnp.where(tip, OBSTACLE, base_flags)
                obs_v0 = jnp.zeros(SHP, jnp.float32)
                obs_v1 = jnp.where(tip, vel_obs, 0.0)
                vel0 = jnp.where(tip, 0.0, vel0)
                vel1 = jnp.where(tip, vel_obs, vel1)
            else:
                # 45-degree wedge (jrl_tip_45degree)
                y1 = (walks - box_r) + box_r
                x1 = (rg - box_r) + box_r
                align = (xs + ys - (x1 + y1)) * (1.0 / jnp.sqrt(2.0))
                phi = jnp.minimum(jnp.maximum(ty, align), ty_top)
                tip = phi <= 0
                flags = jnp.where(tip, OBSTACLE, base_flags)
                obs_v0 = jnp.zeros(SHP, jnp.float32)
                obs_v1 = jnp.where(tip & ~at_yH, vel_obs, 0.0)
                vel0 = jnp.where(tip, obs_v0, vel0)
                vel1 = jnp.where(tip, obs_v1, vel1)

            is_fluid = flags == FLUID
            is_obs = flags == OBSTACLE
            obs_m = is_obs.astype(jnp.float32)

            # ---- streaming pulls (ops/stream.py semantics) ----
            def sxp(a, ex, fluid):
                """Value from x - ex; axis collapse at col 0, reflect-clamp
                for non-FLUID (`propagation.cu:76-87`)."""
                if ex == 0:
                    return a
                v = pltpu.roll(a, ex % W, axis=AX)
                if ex == 1:
                    return jnp.where(at_x0, a, v)  # x=0 symmetry axis
                if not fluid:
                    return jnp.where(at_xW, pltpu.roll(a, 1, axis=AX), v)
                return v

            def syp(a, ey, fluid):
                if ey == 0:
                    return a
                v = pltpu.roll(a, ey % H, axis=AY)
                if ey == 1:
                    if not fluid:
                        return jnp.where(at_y0, pltpu.roll(a, H - 1, axis=AY), v)
                    return v
                if not fluid:
                    return jnp.where(at_yH, pltpu.roll(a, 1, axis=AY), v)
                return v

            def pull_both(a, ex, ey):
                vf = syp(sxp(a, ex, True), ey, True)
                vs = syp(sxp(a, ex, False), ey, False)
                return jnp.where(is_fluid, vf, vs)

            raw_in = [fq[0]] + [None] * 8
            streamed = [fq[0]] + [None] * 8
            for q in range(1, 9):
                ex, ey = int(E[q, 0]), int(E[q, 1])
                val = pull_both(fq[q], ex, ey)
                if q in AXIS_X_IN:  # mirror the incoming channel on the axis
                    val = jnp.where(at_x0, pull_both(fq[int(MX[q])], ex, ey), val)
                raw_in[q] = val

                nbr_obs = pull_both(obs_m, ex, ey) > 0.5
                f_this = fq[int(REFL[q])]
                nxt = pull_both(fq[int(REFL[q])], -ex, -ey)
                if q in AXIS_X_OUT:
                    oq = int(MX[q])
                    nxt = jnp.where(
                        at_x0, pull_both(fq[int(REFL[oq])], -ex, -ey), nxt
                    )
                t = phi
                v1 = (2.0 * t - 1.0) * val + (2.0 - 2.0 * t) * f_this
                v2 = (2.0 * t) * f_this + (1.0 - 2.0 * t) * nxt
                v_obs = jnp.where(
                    (t >= 0.5) & (t <= 1.0),
                    v1,
                    jnp.where((t >= 0.0) & (t <= 0.5), v2, f_this),
                )
                streamed[q] = jnp.where(nbr_obs, v_obs, val)

            f_new = [fq[0]]
            for p in range(1, 9):
                f_new.append(
                    jnp.where(is_obs, raw_in[int(REFL[p])], streamed[p])
                )

            # OUTFLOW: copy all 9 populations from the inward neighbour,
            # sequential border order as `ops/stream.py:238-243`
            of_mask = flags == OUTFLOW
            for q in range(9):
                g = f_new[q]
                g = jnp.where(at_y0, pltpu.roll(g, H - 1, axis=AY), g)
                g = jnp.where(at_yH, pltpu.roll(g, 1, axis=AY), g)
                g = jnp.where(at_x0, pltpu.roll(g, W - 1, axis=AX), g)
                g = jnp.where(at_xW, pltpu.roll(g, 1, axis=AX), g)
                f_new[q] = jnp.where(of_mask, g, f_new[q])

            # ---- stencil shifts (ops/stencil.py minmax-clamp semantics) ----
            def axm(a, sx, fluid):
                if sx == 0:
                    return a
                v = pltpu.roll(a, (-sx) % W, axis=AX)
                if sx == -1:  # axis collapse == min clamp at col 0
                    return jnp.where(at_x0, a, v)
                if not fluid:
                    return jnp.where(at_xW, a, v)
                return v

            def aym(a, sy, fluid):
                if sy == 0:
                    return a
                v = pltpu.roll(a, (-sy) % H, axis=AY)
                if sy == -1:
                    if not fluid:
                        return jnp.where(at_y0, a, v)
                    return v
                if not fluid:
                    return jnp.where(at_yH, a, v)
                return v

            def at_(a, sx, sy):
                vf = aym(axm(a, sx, True), sy, True)
                vs = aym(axm(a, sx, False), sy, False)
                return jnp.where(is_fluid, vf, vs)

            # neighbour-obstacle masks, shared by SFC and the Gi stencils
            no8 = {
                (sx, sy): at_(obs_m, sx, sy) > 0.5
                for sx in (-1, 0, 1)
                for sy in (-1, 0, 1)
                if (sx, sy) != (0, 0)
            }

            # ---- solid-fluid coupling (ops/coupling.py) ----
            t = phi
            t_ok = (t > -eps) & (t <= 1.0 + eps)
            skip = is_obs | at_xW | at_yH
            rho_tgt = f_new[0]
            for q in range(1, 9):
                rho_tgt = rho_tgt + f_new[q]
            vel_tgt_x = jnp.zeros(SHP, jnp.float32)
            vel_tgt_y = jnp.zeros(SHP, jnp.float32)
            count = jnp.zeros(SHP, jnp.float32)
            valid = []
            for q in range(9):
                ex, ey = int(E[q, 0]), int(E[q, 1])
                v_q = no8.get((ex, ey), jnp.zeros(SHP, bool)) & t_ok
                valid.append(v_q)
                vmask = v_q.astype(jnp.float32)
                count = count + vmask
                tq = jnp.where(v_q, t, 0.0)
                ux = at_(vel0, -ex, -ey)
                uy = at_(vel1, -ex, -ey)
                if q in AXIS_X_IN:  # mirror radial component on the axis
                    ux = jnp.where(at_x0, -ux, ux)
                obs_ux = at_(obs_v0, ex, ey)
                obs_uy = at_(obs_v1, ex, ey)
                vel_tgt_x = vel_tgt_x + vmask * (tq * ux + obs_ux) / (tq + 1.0)
                vel_tgt_y = vel_tgt_y + vmask * (tq * uy + obs_uy) / (tq + 1.0)
                qi = int(REFL[q])
                rho_tgt = rho_tgt + vmask * 6.0 * float(W_Q[q]) * (
                    float(E[qi, 0]) * obs_ux + float(E[qi, 1]) * obs_uy
                )
            safe_count = jnp.where(count > 0, count, 1.0)
            u0 = vel_tgt_x / safe_count
            u1 = vel_tgt_y / safe_count

            def grad12(a):
                gx = (
                    4.0 * (at_(a, 1, 0) - at_(a, -1, 0))
                    + (at_(a, 1, 1) - at_(a, -1, 1))
                    + (at_(a, 1, -1) - at_(a, -1, -1))
                ) / 12.0
                gy = (
                    4.0 * (at_(a, 0, 1) - at_(a, 0, -1))
                    + (at_(a, 1, 1) - at_(a, 1, -1))
                    + (at_(a, -1, 1) - at_(a, -1, -1))
                ) / 12.0
                return gx, gy

            g00, g01 = grad12(vel0)
            g10, g11 = grad12(vel1)
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

            # ---- macro moments (OBSTACLE passthrough) ----
            macro_rho = f_new[0]
            for q in range(1, 9):
                macro_rho = macro_rho + f_new[q]
            rho_n = jnp.where(is_obs, rho, macro_rho)
            mom_x = f_new[1] - f_new[3] + f_new[5] - f_new[6] - f_new[7] + f_new[8]
            mom_y = f_new[2] - f_new[4] + f_new[5] + f_new[6] - f_new[7] - f_new[8]
            safe_rho = jnp.where(rho_n == 0, 1.0, rho_n)
            un0 = jnp.where(is_obs, vel0, mom_x / safe_rho)
            un1 = jnp.where(is_obs, vel1, mom_y / safe_rho)

            # ---- BGK collision + axisymmetric LINE_X_EQ_0 source ----
            # feq with the Guo half-force shift (force = (0, fy) constant)
            sh = jnp.where(rho_n <= eps, 0.0, 0.5 * fy / safe_rho)
            feq_n = _feq9(rho_n, un0, un1 + sh)

            r = xs
            ur = un0
            A1 = -rho_n * ur / r
            visc = CS2 * (tau - 0.5)
            mu = visc * rho_n
            pressure = rho_n * CS2

            def grad_blocked(a):
                """Obstacle-pair-blocked isotropic gradient (ops/stencil.py
                get_grad; zero at OBSTACLE cells)."""
                def val(sx, sy):
                    return at_(a, sx, sy)

                gx = jnp.zeros(SHP, jnp.float32)
                bx = jnp.zeros(SHP, bool)
                p = no8[(1, 0)] | no8[(-1, 0)]
                gx = gx + jnp.where(p, 0.0, 4.0 * (val(1, 0) - val(-1, 0)))
                bx = bx | p
                p = no8[(1, 1)] | no8[(-1, 1)]
                gx = gx + jnp.where(p, 0.0, val(1, 1) - val(-1, 1))
                bx = bx | p
                p = no8[(-1, -1)] | no8[(1, -1)]
                gx = gx + jnp.where(p, 0.0, val(1, -1) - val(-1, -1))
                bx = bx | p
                gx = jnp.where(bx | is_obs, 0.0, gx) / 12.0

                gy = jnp.zeros(SHP, jnp.float32)
                by = jnp.zeros(SHP, bool)
                p = no8[(0, 1)] | no8[(0, -1)]
                gy = gy + jnp.where(p, 0.0, 4.0 * (val(0, 1) - val(0, -1)))
                by = by | p
                p = no8[(1, 1)] | no8[(1, -1)]
                gy = gy + jnp.where(p, 0.0, val(1, 1) - val(1, -1))
                by = by | p
                p = no8[(-1, 1)] | no8[(-1, -1)]
                gy = gy + jnp.where(p, 0.0, val(-1, 1) - val(-1, -1))
                by = by | p
                gy = jnp.where(by | is_obs, 0.0, gy) / 12.0
                return gx, gy

            def div_free(m0, m1):
                """Isotropic divergence, no pair masking (get_div)."""
                d = 4.0 * (at_(m0, 1, 0) - at_(m0, -1, 0))
                d = d + at_(m0, 1, 1) - at_(m0, -1, 1)
                d = d + at_(m0, 1, -1) - at_(m0, -1, -1)
                d = d + 4.0 * (at_(m1, 0, 1) - at_(m1, 0, -1))
                d = d + at_(m1, 1, 1) - at_(m1, 1, -1)
                d = d + at_(m1, -1, 1) - at_(m1, -1, -1)
                return jnp.where(is_obs, 0.0, d / 12.0)

            gu_x, _ = grad_blocked(un0)
            gv_x, _ = grad_blocked(un1)
            gp_x, _ = grad_blocked(pressure)
            div_m = div_free(rho_n * ur * un0, rho_n * ur * un1)
            A2 = (gp_x + div_m) * (1.0 / (2.0 * r))
            ga1_x, ga1_y = grad_blocked(A1)
            F2_0 = (mu / r) * (gu_x - ur / r) + un0 * A1 - (tau - 1.0) * CS2 * ga1_x
            F2_1 = (mu / r) * gv_x + un1 * A1 - (tau - 1.0) * CS2 * ga1_y

            inv_tau = 1.0 / tau
            f_out_l = []
            for q in range(9):
                e0, e1 = float(E[q, 0]), float(E[q, 1])
                Gq = (A1 + A2 + (e0 * F2_0 + e1 * F2_1) / CS2) * float(W_Q[q])
                collided = f_new[q] + inv_tau * (feq_n[q] - f_new[q]) + Gq
                f_out_l.append(jnp.where(is_obs, f_new[q], collided))

            return (jnp.stack(f_out_l), rho_n, un0, un1)

        f0 = f_ref[:]
        rho0 = rho_ref[:]
        v0 = vel_ref[0]
        v1 = vel_ref[1]
        fN, rhoN, u0N, u1N = jax.lax.fori_loop(
            0, n_ref[0, 0], step, (f0, rho0, v0, v1)
        )
        f_out[:] = fN
        rho_out[:] = rhoN
        vel_out[0] = u0N
        vel_out[1] = u1N

    return kernel


@partial(jax.jit, static_argnames=("key", "transposed"))
def _fused_fluid_run(f, rho, vel, start_step, n, key, transposed=False):
    H, W = key.eff_res
    SHP, _, _ = _layout(H, W, transposed)
    kernel = _make_jrl_fluid_kernel(key, transposed)
    start = jnp.asarray(start_step, jnp.float32).reshape(1, 1)
    n_i = jnp.asarray(n, jnp.int32).reshape(1, 1)
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9,) + SHP, f32),
            jax.ShapeDtypeStruct(SHP, f32),
            jax.ShapeDtypeStruct((2,) + SHP, f32),
        ],
        compiler_params=_VMEM_PARAMS,
    )(start, n_i, f, rho, vel)


def fits_vmem(cfg) -> bool:
    H, W = cfg.eff_res
    return H * W <= MAX_FUSED_CELLS


class _BalanceKey(NamedTuple):
    """Config fields the balance kernel bakes in (jit/Mosaic cache key)."""

    eff_res: tuple
    tau_D: float


def _make_balance_kernel(cfg, transposed=False):
    """C-lattice balance-phase kernel: zero velocity, fixed flags
    (`cfg` is a `_BalanceKey`; the step count is an SMEM scalar).

    Per step (== `models/jrl.py::make_balance_step`): stream h with the
    flag BCs (half-way bounce, INFLOW C=0 sink, INFLOW_2 C=1 reservoir,
    OUTFLOW copy, x=0 axis mirroring) -> C = sum h (OBSTACLE passthrough)
    -> BGK with the per-direction axisymmetric convection rate
    w_q = 1/tau_D + (1 - 0.5/tau_D) e_x / r (`LBM_collision_2d.py:513-529`;
    the convection Gi vanishes at zero velocity). With u = 0 the
    equilibrium reduces to w_q * C.
    """
    H, W = cfg.eff_res
    SHP, AY, AX = _layout(H, W, transposed)
    tau_D = float(cfg.tau_D)
    inv_tau = 1.0 / tau_D
    rate_coef = 1.0 - 0.5 / tau_D

    def kernel(n_ref, flags_ref, h_ref, c_ref, h_out, c_out):
        iy = jax.lax.broadcasted_iota(jnp.int32, SHP, AY)
        ix = jax.lax.broadcasted_iota(jnp.int32, SHP, AX)
        at_x0 = ix == 0
        at_xW = ix == W - 1
        at_y0 = iy == 0
        at_yH = iy == H - 1
        r = ix.astype(jnp.float32) + 0.5

        flags = flags_ref[:]
        is_fluid = flags == FLUID
        is_obs = flags == OBSTACLE
        obs_m = is_obs.astype(jnp.float32)
        in_mask = flags == int(CellType.INFLOW)
        in2_mask = flags == int(CellType.INFLOW_2)
        of_mask = flags == OUTFLOW

        def sxp(a, ex, fluid):
            if ex == 0:
                return a
            v = pltpu.roll(a, ex % W, axis=AX)
            if ex == 1:
                return jnp.where(at_x0, a, v)
            if not fluid:
                return jnp.where(at_xW, pltpu.roll(a, 1, axis=AX), v)
            return v

        def syp(a, ey, fluid):
            if ey == 0:
                return a
            v = pltpu.roll(a, ey % H, axis=AY)
            if ey == 1:
                if not fluid:
                    return jnp.where(at_y0, pltpu.roll(a, H - 1, axis=AY), v)
                return v
            if not fluid:
                return jnp.where(at_yH, pltpu.roll(a, 1, axis=AY), v)
            return v

        def pull_both(a, ex, ey):
            vf = syp(sxp(a, ex, True), ey, True)
            vs = syp(sxp(a, ex, False), ey, False)
            return jnp.where(is_fluid, vf, vs)

        # flags are fixed: hoist the neighbour-obstacle masks out of the loop
        nbr_obs = {
            q: pull_both(obs_m, int(E[q, 0]), int(E[q, 1])) > 0.5
            for q in range(1, 9)
        }
        # per-direction relaxation rate (r-dependent)
        w_rate = [
            inv_tau + rate_coef * float(E[q, 0]) / r for q in range(9)
        ]

        def step(_, carry):
            h, C = carry
            hq = [h[q] for q in range(9)]

            raw_in = [hq[0]] + [None] * 8
            streamed = [hq[0]] + [None] * 8
            for q in range(1, 9):
                ex, ey = int(E[q, 0]), int(E[q, 1])
                val = pull_both(hq[q], ex, ey)
                if q in AXIS_X_IN:
                    val = jnp.where(
                        at_x0, pull_both(hq[int(MX[q])], ex, ey), val
                    )
                raw_in[q] = val
                # no phi: plain half-way bounce from obstacle neighbours
                streamed[q] = jnp.where(nbr_obs[q], hq[int(REFL[q])], val)

            h_new = [hq[0]]
            for p in range(1, 9):
                h_new.append(
                    jnp.where(is_obs, raw_in[int(REFL[p])], streamed[p])
                )

            # INFLOW: feq(0, u) == 0; INFLOW_2: feq(1, 0) == w_q
            for q in range(9):
                g = jnp.where(in_mask, 0.0, h_new[q])
                g = jnp.where(in2_mask, float(W_Q[q]), g)
                h_new[q] = g
            C = jnp.where(in_mask, 0.0, C)
            C = jnp.where(in2_mask, 1.0, C)

            # OUTFLOW border copies (ops/stream.py:238-243 order)
            for q in range(9):
                g = h_new[q]
                g = jnp.where(at_y0, pltpu.roll(g, H - 1, axis=AY), g)
                g = jnp.where(at_yH, pltpu.roll(g, 1, axis=AY), g)
                g = jnp.where(at_x0, pltpu.roll(g, W - 1, axis=AX), g)
                g = jnp.where(at_xW, pltpu.roll(g, 1, axis=AX), g)
                h_new[q] = jnp.where(of_mask, g, h_new[q])

            # macro C + convection BGK (u = 0)
            macro_C = h_new[0]
            for q in range(1, 9):
                macro_C = macro_C + h_new[q]
            C_n = jnp.where(is_obs, C, macro_C)

            h_out_l = []
            for q in range(9):
                collided = h_new[q] + w_rate[q] * (float(W_Q[q]) * C_n - h_new[q])
                h_out_l.append(jnp.where(is_obs, h_new[q], collided))
            return (jnp.stack(h_out_l), C_n)

        hN, cN = jax.lax.fori_loop(0, n_ref[0, 0], step, (h_ref[:], c_ref[:]))
        h_out[:] = hN
        c_out[:] = cN

    return kernel


@partial(jax.jit, static_argnames=("key", "transposed"))
def _fused_balance_run(h, C, flags, n, key, transposed=False):
    H, W = key.eff_res
    SHP, _, _ = _layout(H, W, transposed)
    kernel = _make_balance_kernel(key, transposed)
    n_i = jnp.asarray(n, jnp.int32).reshape(1, 1)
    f32 = jnp.float32
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((9,) + SHP, f32),
            jax.ShapeDtypeStruct(SHP, f32),
        ],
        compiler_params=_VMEM_PARAMS,
    )(n_i, flags, h, C)


def make_fused_balance_runner(cfg, flags):
    """Drop-in replacement for `models.jrl.make_balance_runner` (same
    (state, fields, n) signature) running the whole stretch in VMEM."""
    if not fits_vmem(cfg):
        raise ValueError(
            f"grid {cfg.eff_res} exceeds the fused kernel's VMEM budget"
        )

    tr = _want_transposed(cfg)
    bound_flags = _t2(flags) if tr else flags
    key = _BalanceKey(eff_res=tuple(cfg.eff_res), tau_D=float(cfg.tau_D))
    # keep single kernel dispatches under ~20 s on the tunnel (a
    # production balance interval can be ~9e7 steps); the chunk calls
    # queue without host syncs, so this costs only dispatch
    chunk = 16_777_216

    def run(state, fields, n: int):
        del fields
        h, C = state["h"], state["C"]
        if tr:
            h, C = _t2(h), _t2(C)
        left = int(n)
        while left > 0:
            m = min(left, chunk)
            h, C = _fused_balance_run(h, C, bound_flags, m, key,
                                      transposed=tr)
            left -= m
        if tr:
            h, C = _t2(h), _t2(C)
        return {"C": C, "h": h}

    return run


# Min/max stored-velocity frames held in VMEM per kernel call (a window
# of K frames is 2*K*H*W*4 bytes). A run() call spanning more frames is
# split into ceil(span / (K-1)) kernel calls, so K bounds the steps one
# dispatch can cover: at high Pe (short frame intervals) a small window
# makes the path dispatch-bound. _approach_window() sizes K to ~16 MB.
APPROACH_FRAME_WINDOW = 16
_APPROACH_WINDOW_BYTES = 16 * 1024 * 1024


def _approach_window(H: int, W: int) -> int:
    frame_bytes = 2 * H * W * 4
    return max(
        APPROACH_FRAME_WINDOW, min(128, _APPROACH_WINDOW_BYTES // frame_bytes)
    )


class _CApproachKey(NamedTuple):
    """Exactly the config fields the approach kernel bakes in — the jit/
    Mosaic cache key. Deliberately EXCLUDES Re (the C-lattice kernel does
    not depend on it) and the step/frame counts (passed as SMEM scalars),
    so a whole Re x Pe sweep compiles one kernel variant per Pe instead
    of one per (case, segment length, frame count)."""

    eff_res: tuple
    tau_D: float
    vel_obs_conv: float
    Rg_radius: int
    box_radius: float
    inflow_height: float
    inflow_height_int: int
    radius_obs_int: int
    flat: bool
    is_negative: bool


def _c_approach_key(cfg) -> "_CApproachKey":
    return _CApproachKey(
        eff_res=tuple(cfg.eff_res),
        tau_D=float(cfg.tau_D),
        vel_obs_conv=float(cfg.vel_obs_conv),
        Rg_radius=int(cfg.Rg_radius),
        box_radius=float(cfg.box_radius),
        inflow_height=float(cfg.inflow_height),
        inflow_height_int=int(cfg.inflow_height_int),
        radius_obs_int=int(cfg.radius_obs_int),
        flat=cfg.shape in ("cylinder", "infiniteplane"),
        is_negative=bool(cfg.is_negative),
    )


def _make_approach_kernel(cfg, K, transposed=False):
    """C-lattice approach-phase kernel over a window of K stored-velocity
    frames held in VMEM (`cfg` is a `_CApproachKey`). The per-step frame
    index b = clip(floor(x/0.1), 0, n_frames-1) is monotone in the step
    index, so the call is run as an outer while-loop over constant-frame
    INTERVALS: each interval loads its frame pair once with a dynamic
    leading-dim ref index, finds the interval end by exact scalar binary
    search on the same f32 arithmetic, and runs the steps in an inner
    fori_loop whose body has NO dynamic loads. (A per-step dynamic window
    read serialized Mosaic's pipeline: 23.7 us/step vs ~2 us for the
    other fused JRL paths.) The step count n and frame count n_frames are
    SMEM scalars, so segment lengths don't multiply kernel variants.

    Per step (== `models/jrl.py::make_approach_step`): tip geometry from
    the walk position (strict phi<0 for wedge shapes, rectangular block
    for flat), C zeroed in the tip, velocity = lerp(frame_b, frame_b+1)
    scaled by vel_obs_conv, stream h with sub-grid bounce, macro-C
    (clamped to [0,1] for flat variants), BGK with the per-direction
    axisymmetric rate + convection source, and the tip-disk
    inflow/current integrals accumulated into scalars.
    """
    H, W = cfg.eff_res
    SHP, AY, AX = _layout(H, W, transposed)
    tau_D = float(cfg.tau_D)
    inv_tau = 1.0 / tau_D
    rate_coef = 1.0 - 0.5 / tau_D
    v = float(cfg.vel_obs_conv)
    rg = float(cfg.Rg_radius)
    box_r = float(cfg.box_radius)
    inflow_h = float(cfg.inflow_height)
    inflow_h_int = int(cfg.inflow_height_int)
    rint = int(cfg.radius_obs_int)
    flat = bool(cfg.flat)
    is_neg = bool(cfg.is_negative)
    x_interval = 0.1
    eps = 1e-10
    import math as _math

    def kernel(
        start_ref, b0w_ref, ni_ref, base_ref, win_ref, h_ref, c_ref,
        h_out, c_out, acc_out,
    ):
        iy = jax.lax.broadcasted_iota(jnp.int32, SHP, AY)
        ix = jax.lax.broadcasted_iota(jnp.int32, SHP, AX)
        at_x0 = ix == 0
        at_xW = ix == W - 1
        at_y0 = iy == 0
        at_yH = iy == H - 1
        xs = ix.astype(jnp.float32) + 0.5
        ys = iy.astype(jnp.float32) + 0.5
        r = xs
        # annulus areas pi((i+1)^2 - i^2) = pi(2i+1) on the tip disk
        area_w = jnp.where(
            ix < rint, _math.pi * (2.0 * ix.astype(jnp.float32) + 1.0), 0.0
        )
        w_rate = [inv_tau + rate_coef * float(E[q, 0]) / r for q in range(9)]

        base_flags = base_ref[:]
        start = start_ref[0, 0]
        b0w = b0w_ref[0, 0]  # global frame index of window slot 0
        n_s = ni_ref[0, 0]  # steps this call
        nf_f = ni_ref[0, 1].astype(jnp.float32)  # stored frame count
        init_block = (iy < inflow_h_int) & (ix < jnp.int32(rg))

        def frame_at(i_f32):
            """Per-step frame index (must match the host/unfused f32
            arithmetic exactly)."""
            return jnp.clip(
                jnp.floor((start + i_f32) * v / x_interval),
                0.0, nf_f - 1.0,
            )

        def sxp(a, ex, fluid):
            if ex == 0:
                return a
            vv = pltpu.roll(a, ex % W, axis=AX)
            if ex == 1:
                return jnp.where(at_x0, a, vv)
            if not fluid:
                return jnp.where(at_xW, pltpu.roll(a, 1, axis=AX), vv)
            return vv

        def syp(a, ey, fluid):
            if ey == 0:
                return a
            vv = pltpu.roll(a, ey % H, axis=AY)
            if ey == 1:
                if not fluid:
                    return jnp.where(at_y0, pltpu.roll(a, H - 1, axis=AY), vv)
                return vv
            if not fluid:
                return jnp.where(at_yH, pltpu.roll(a, 1, axis=AY), vv)
            return vv

        def load_pair(b_g):
            """Dynamic window read of the frame pair for frame index b_g
            (outer loop / post-loop only — never in the hot step body)."""
            b_rel = (b_g - b0w).astype(jnp.int32)
            f0 = win_ref[b_rel]
            f1 = win_ref[jnp.minimum(b_rel + 1, K - 1)]
            return f0, f1

        def conv_vel(step_idx, walks_int, f0, f1):
            """Stored-velocity interpolation at a step, with the frame
            pair (f0, f1) for the step's frame index supplied by the
            caller; shared by the step body and the post-loop record
            recomputation."""
            x_comp = step_idx * v
            b_g = jnp.clip(
                jnp.floor(x_comp / x_interval), 0.0, nf_f - 1.0
            )
            t = x_comp / x_interval - b_g
            use_lerp = b_g + 1.0 < nf_f
            u0 = jnp.where(use_lerp, f0[0] * (1.0 - t) + f1[0] * t, f0[0])
            u1 = jnp.where(use_lerp, f0[1] * (1.0 - t) + f1[1] * t, f0[1])
            tip_block = (iy < walks_int) & (ix < jnp.int32(rg))
            cv0 = jnp.where(tip_block, 0.0, u0 * v)
            cv1 = jnp.where(tip_block, v, u1 * v)
            return cv0, cv1

        def step_at(i, carry, f0, f1):
            h, C, acc_in, acc_cur = carry
            hq = [h[q] for q in range(9)]
            step_idx = start + i.astype(jnp.float32)
            walks = inflow_h + step_idx * v
            walks_int = jnp.floor(walks + 0.5).astype(jnp.int32)

            # ---- geometry (strict: phi < 0; `_c_flags_at`) ----
            tx = (xs - (rg - box_r)) - box_r
            ty = (ys - (walks - box_r)) - box_r
            ty_top = -(ys - float(H))
            if flat:
                phi = jnp.maximum(tx, ty)
                if is_neg:
                    phi = jnp.minimum(phi, ty_top)
                obs = (iy < walks_int) & (ix < jnp.int32(rg))
            else:
                x1 = rg
                y1 = walks
                align = (xs + ys - (x1 + y1)) * (1.0 / jnp.sqrt(2.0))
                phi = jnp.maximum(ty, align)
                if is_neg:
                    phi = jnp.minimum(phi, ty_top)
                obs = (phi < 0) | init_block
            flags = jnp.where(obs, OBSTACLE, base_flags)
            head = (iy == walks_int - 1) & (ix < rint)
            flags = jnp.where(head, int(CellType.INFLOW), flags)
            C = jnp.where(flags == OBSTACLE, 0.0, C)

            is_fluid = flags == FLUID
            is_obs = flags == OBSTACLE
            obs_m = is_obs.astype(jnp.float32)
            in_mask = flags == int(CellType.INFLOW)
            in2_mask = flags == int(CellType.INFLOW_2)
            of_mask = flags == OUTFLOW

            # ---- stored-velocity interpolation (interval frame pair) ----
            cv0, cv1 = conv_vel(step_idx, walks_int, f0, f1)

            def pull_both(a, ex, ey):
                vf = syp(sxp(a, ex, True), ey, True)
                vs = syp(sxp(a, ex, False), ey, False)
                return jnp.where(is_fluid, vf, vs)

            # ---- streaming with sub-grid interpolation bounce ----
            raw_in = [hq[0]] + [None] * 8
            streamed = [hq[0]] + [None] * 8
            for q in range(1, 9):
                ex, ey = int(E[q, 0]), int(E[q, 1])
                val = pull_both(hq[q], ex, ey)
                if q in AXIS_X_IN:
                    val = jnp.where(at_x0, pull_both(hq[int(MX[q])], ex, ey), val)
                raw_in[q] = val
                nbr_obs = pull_both(obs_m, ex, ey) > 0.5
                f_this = hq[int(REFL[q])]
                nxt = pull_both(hq[int(REFL[q])], -ex, -ey)
                if q in AXIS_X_OUT:
                    oq = int(MX[q])
                    nxt = jnp.where(
                        at_x0, pull_both(hq[int(REFL[oq])], -ex, -ey), nxt
                    )
                tt = phi
                v1_ = (2.0 * tt - 1.0) * val + (2.0 - 2.0 * tt) * f_this
                v2_ = (2.0 * tt) * f_this + (1.0 - 2.0 * tt) * nxt
                v_obs = jnp.where(
                    (tt >= 0.5) & (tt <= 1.0),
                    v1_,
                    jnp.where((tt >= 0.0) & (tt <= 0.5), v2_, f_this),
                )
                streamed[q] = jnp.where(nbr_obs, v_obs, val)

            h_new = [hq[0]]
            for p in range(1, 9):
                h_new.append(jnp.where(is_obs, raw_in[int(REFL[p])], streamed[p]))

            # INFLOW: feq(0, u) == 0 sink; INFLOW_2: feq(1, local C_vel)
            feq_in2 = _feq9(jnp.ones(SHP, jnp.float32), cv0, cv1)
            for q in range(9):
                g = jnp.where(in_mask, 0.0, h_new[q])
                h_new[q] = jnp.where(in2_mask, feq_in2[q], g)
            C = jnp.where(in_mask, 0.0, C)
            C = jnp.where(in2_mask, 1.0, C)

            # OUTFLOW border copies
            for q in range(9):
                g = h_new[q]
                g = jnp.where(at_y0, pltpu.roll(g, H - 1, axis=AY), g)
                g = jnp.where(at_yH, pltpu.roll(g, 1, axis=AY), g)
                g = jnp.where(at_x0, pltpu.roll(g, W - 1, axis=AX), g)
                g = jnp.where(at_xW, pltpu.roll(g, 1, axis=AX), g)
                h_new[q] = jnp.where(of_mask, g, h_new[q])

            # ---- macro C (+ clamp on flat variants) ----
            macro_C = h_new[0]
            for q in range(1, 9):
                macro_C = macro_C + h_new[q]
            C_n = jnp.where(is_obs, C, macro_C)
            if flat:
                C_n = jnp.clip(C_n, 0.0, 1.0)

            # ---- BGK + convection source (all local) ----
            feq_n = _feq9(C_n, cv0, cv1)
            ur = cv0
            h_out_l = []
            for q in range(9):
                s_q = rate_coef * float(E[q, 0]) / r
                Gq = -(ur / r) * feq_n[q] * (1.0 - 0.5 / tau_D - 0.5 * s_q)
                collided = h_new[q] + w_rate[q] * (feq_n[q] - h_new[q]) + Gq
                h_out_l.append(jnp.where(is_obs, h_new[q], collided))

            # ---- tip-disk integrals (`C_ethaline:364-385`) ----
            # accumulated as masked VECTORS: a per-step scalar jnp.sum
            # would put a cross-lane reduction on the loop-carry critical
            # path every step; the final scalar is reduced once after the
            # loop (sum over steps and cells commutes)
            if flat:
                # flux form dC_z + dC_r (`C_cylinder:344-358`)
                Cm1 = pltpu.roll(C_n, 1, axis=AY)  # C[row-1] at row
                rC = xs * C_n
                rC_next = pltpu.roll(rC, W - 1, axis=AX)  # rC[col+1] at col
                dC = (C_n - Cm1) + (rC_next - rC) / xs
                intg = dC
            else:
                intg = C_n
            acc_in = acc_in + jnp.where(iy == walks_int, intg * area_w, 0.0)
            acc_cur = acc_cur + jnp.where(
                iy == walks_int + 1, intg * area_w, 0.0
            )

            return (jnp.stack(h_out_l), C_n, acc_in, acc_cur)

        def outer_cond(carry):
            return carry[0] < n_s

        def outer_body(carry):
            s_rel, h, C, acc_in, acc_cur = carry
            b_g = frame_at(s_rel.astype(jnp.float32))
            f0, f1 = load_pair(b_g)
            # interval end = first step index > s_rel whose frame index
            # differs (frame_at is monotone nondecreasing): exact
            # lower-bound binary search on the same f32 arithmetic the
            # steps use, so no step ever runs with a stale pair
            def bs(_, lohi):
                lo, hi = lohi
                active = lo < hi
                mid = (lo + hi) // 2
                same = frame_at(mid.astype(jnp.float32)) == b_g
                return (
                    jnp.where(active & same, mid + 1, lo),
                    jnp.where(active & ~same, mid, hi),
                )

            seg_end, _ = jax.lax.fori_loop(
                0, 32, bs, (s_rel + 1, n_s)
            )

            def istep(i, cc):
                return step_at(i, cc, f0, f1)

            h, C, acc_in, acc_cur = jax.lax.fori_loop(
                s_rel, seg_end, istep, (h, C, acc_in, acc_cur)
            )
            return (seg_end, h, C, acc_in, acc_cur)

        zv = jnp.zeros(SHP, jnp.float32)
        _, hN, cN, acc_in, acc_cur = jax.lax.while_loop(
            outer_cond, outer_body,
            (jnp.int32(0), h_ref[:], c_ref[:], zv, zv),
        )
        h_out[:] = hN
        c_out[:] = cN
        infl = jnp.sum(acc_in)
        curr = jnp.sum(acc_cur)
        # record velocities: only the LAST step's value is consumed, so
        # recompute it once post-loop instead of reducing every step
        last_rel = (n_s - 1).astype(jnp.float32)
        last_idx = start + last_rel
        last_wi = jnp.floor(inflow_h + last_idx * v + 0.5).astype(jnp.int32)
        f0L, f1L = load_pair(frame_at(last_rel))
        cv0L, cv1L = conv_vel(last_idx, last_wi, f0L, f1L)
        ru = jnp.sum(jnp.where(iy == last_wi + 1, cv0L * area_w, 0.0))
        rv = jnp.sum(jnp.where(iy == last_wi + 1, cv1L * area_w, 0.0))
        # lane-mask construction ( .at[].set scalar scatter has no Mosaic
        # lowering): acc[0, 0..3] = (inflow, current, rec_u, rec_v)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        acc_out[:] = (
            jnp.where(lane == 0, infl, 0.0)
            + jnp.where(lane == 1, curr, 0.0)
            + jnp.where(lane == 2, ru, 0.0)
            + jnp.where(lane == 3, rv, 0.0)
        )

    return kernel


@partial(jax.jit, static_argnames=("key", "K", "transposed"))
def _fused_approach_seg(h, C, base_flags, frames, start_step, b0w,
                        n, n_frames, infl, curr, key, K, transposed=False):
    """One windowed segment: window slice + kernel + accumulator merge,
    ALL inside one jit. (Eager glue ops between kernel calls cost
    ~9-28 ms EACH to dispatch on the axon tunnel — a per-call slice plus
    four accumulator reads made the high-Pe approach path ~10x slower
    than the kernel itself.)"""
    H, W = key.eff_res
    SHP, _, _ = _layout(H, W, transposed)
    kernel = _make_approach_kernel(key, K, transposed)
    f32 = jnp.float32
    window = jax.lax.dynamic_slice_in_dim(
        frames, jnp.asarray(b0w, jnp.int32), K, axis=0
    )
    start = jnp.asarray(start_step, f32).reshape(1, 1)
    b0 = jnp.asarray(b0w, f32).reshape(1, 1)
    ni = jnp.stack(
        [jnp.asarray(n, jnp.int32), jnp.asarray(n_frames, jnp.int32)]
    ).reshape(1, 2)
    h, C, acc = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((9,) + SHP, f32),
            jax.ShapeDtypeStruct(SHP, f32),
            jax.ShapeDtypeStruct((1, 128), f32),
        ],
        compiler_params=_VMEM_PARAMS,
    )(start, b0, ni, base_flags, window, h, C)
    return (
        h, C, infl + acc[0, 0], curr + acc[0, 1], acc[0, 2], acc[0, 3]
    )


def make_fused_approach_runner(cfg, vel_field):
    """Drop-in replacement for `models.jrl.make_approach_runner`, with the
    stored velocity history bound at construction. Same call signature
    (state, fields, start_step, n) -> (state, acc); `fields` must carry
    `base_flags` (the velocity frames come from the bound `vel_field`).
    Each kernel call carries a K-frame VMEM window; in-kernel, an outer
    interval loop loads each constant-frame pair once (no per-step
    dynamic reads). A call spanning more than K-1 frames is split into
    multiple calls.
    """
    import numpy as np

    if not fits_vmem(cfg):
        raise ValueError(
            f"grid {cfg.eff_res} exceeds the fused kernel's VMEM budget"
        )
    frames = jnp.asarray(vel_field, jnp.float32)
    n_frames = int(frames.shape[0])
    K = _approach_window(*cfg.eff_res)
    if n_frames < K:  # pad so dynamic_slice windows are always K long
        pad = jnp.repeat(frames[-1:], K - n_frames, axis=0)
        frames = jnp.concatenate([frames, pad], axis=0)
    v = np.float32(cfg.vel_obs_conv)
    x_int = np.float32(0.1)
    key = _c_approach_key(cfg)

    tr = _want_transposed(cfg)
    if tr:
        frames = _t2(frames)

    def frame_of(step: int) -> int:
        # must match the kernel/unfused f32 arithmetic exactly
        x = np.float32(np.float32(step) * v)
        return int(np.clip(np.floor(x / x_int), 0, n_frames - 1))

    def run(state, fields, start_step, n: int):
        start = int(start_step)
        h, C = state["h"], state["C"]
        base_flags = fields["base_flags"]
        if tr:
            h, C, base_flags = _t2(h), _t2(C), _t2(base_flags)
        zero = jnp.zeros((), jnp.float32)
        infl = curr = ru = rv = zero
        s = start
        end = start + int(n)
        while s < end:
            b_lo = frame_of(s)
            b0w = min(b_lo, max(0, int(frames.shape[0]) - K))

            def ok(b: int) -> bool:
                # slot b-b0w with slot b+1 available for the lerp; the
                # final frame needs no lerp partner (use_lerp is false)
                if b == n_frames - 1:
                    return b - b0w <= K - 1
                return b - b0w <= K - 2

            if ok(frame_of(end - 1)):
                seg_end = end
            else:
                # first step whose frame falls outside the window
                lo, hi = s + 1, end
                while lo < hi:
                    mid = (lo + hi) // 2
                    if not ok(frame_of(mid)):
                        hi = mid
                    else:
                        lo = mid + 1
                seg_end = lo
            h, C, infl, curr, ru, rv = _fused_approach_seg(
                h, C, base_flags, frames, float(s), float(b0w),
                int(seg_end - s), n_frames, infl, curr,
                key, K, transposed=tr,
            )
            s = seg_end
        if tr:
            h, C = _t2(h), _t2(C)
        acc_d = {
            "inflow_sum": infl,
            "current_sum": curr,
            "count": jnp.asarray(float(n), jnp.float32),
            "rec_u": ru,
            "rec_v": rv,
        }
        return ({"C": C, "h": h}, acc_d)

    return run


def make_fused_fluid_runner(cfg):
    """Drop-in replacement for `models.jrl.make_fluid_runner`: advances n
    steps entirely inside one VMEM-resident kernel. Same signature
    (state, fields, start_step, n) — `fields` is accepted for
    compatibility (geometry/force are recomputed in-kernel)."""
    if cfg.shape not in ("cylinder", "infiniteplane", "45degree", "ethaline"):
        raise ValueError(f"unknown tip shape {cfg.shape}")
    if not fits_vmem(cfg):
        raise ValueError(
            f"grid {cfg.eff_res} exceeds the fused kernel's VMEM budget"
        )

    tr = _want_transposed(cfg)
    key = _fluid_key(cfg)

    def run(state, fields, start_step, n: int):
        del fields
        f, rho, vel = state["f"], state["rho"], state["vel"]
        if tr:
            f, rho, vel = _t2(f), _t2(rho), _t2(vel)
        f, rho, vel = _fused_fluid_run(f, rho, vel, start_step, int(n), key,
                                       transposed=tr)
        if tr:
            f, rho, vel = _t2(f), _t2(rho), _t2(vel)
        return {"f": f, "rho": rho, "vel": vel}

    return run
