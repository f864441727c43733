"""Fused periodic collide-and-stream kernel (shear-layer scene family).

The fully-periodic scenes (`demo_2d_LBM.py` / `demo_2d_LBM_KBC.py`) have
no flags, no obstacles and no boundary conditions, so the whole update
is: pull-stream periodically, take moments, relax (BGK or MRT). This
kernel does all of it in one pass over HBM; y-halos come from
neighbouring BlockSpec row-blocks with wraparound index maps and x-wrap
is a lane roll.
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
from jrl_lbm_tpu.utils.types import KBCType

E = lattice.E

# raw-moment rows of `ops/collide.py::KBC_C_MAT` needed by the shear-part
# split: M20 (row 3), M11 (row 4), M02 (row 5)
_M20_ROW = (0, 1, 0, 1, 0, 1, 1, 1, 1)
_M11_ROW = (0, 0, 0, 0, 0, 1, -1, 1, -1)
_M02_ROW = (0, 0, 1, 0, 1, 1, 1, 1, 1)


def _kbc_apply(f_new, feq_n, rho, u_x, u_y, tau, kbc, f_out):
    """Unrolled entropic KBC Omega = -beta (2 ds + gamma dh); mirrors
    `ops/collide.py::kbc_omega` (KBC A/B: per-cell central moments,
    C/D: raw moments, LBGK: gamma = 2)."""
    beta = 1.0 / (2.0 * tau)
    eps = 1e-10
    df = [f_new[q] - feq_n[q] for q in range(9)]

    if kbc == int(KBCType.LBGK):
        for q in range(9):
            f_out[q] = f_new[q] - beta * 2.0 * df[q]
        return

    def moments(fs):
        if kbc in (int(KBCType.KBC_A), int(KBCType.KBC_B)):
            m20 = m11 = m02 = None
            for q in range(9):
                du = float(E[q, 0]) - u_x
                dv = float(E[q, 1]) - u_y
                t20 = du * du * fs[q]
                t11 = du * dv * fs[q]
                t02 = dv * dv * fs[q]
                m20 = t20 if m20 is None else m20 + t20
                m11 = t11 if m11 is None else m11 + t11
                m02 = t02 if m02 is None else m02 + t02
        else:
            m20 = m11 = m02 = None
            for q in range(9):
                if _M20_ROW[q]:
                    m20 = fs[q] if m20 is None else m20 + fs[q]
                if _M11_ROW[q]:
                    t = fs[q] if _M11_ROW[q] > 0 else -fs[q]
                    m11 = t if m11 is None else m11 + t
                if _M02_ROW[q]:
                    m02 = fs[q] if m02 is None else m02 + fs[q]
        return m20 + m02, m20 - m02, m11  # T, N, PIxy

    include_T = kbc in (int(KBCType.KBC_A), int(KBCType.KBC_C))

    def shear_parts(T, N, PIxy):
        if include_T:
            s0 = rho - T
            sp = 0.25 * (T + N)
            sq = 0.25 * (T - N)
        else:
            s0 = rho
            sp = 0.25 * N
            sq = -0.25 * N
        return [
            s0,
            sp + 0.5 * rho * u_x,
            sq + 0.5 * rho * u_y,
            sp - 0.5 * rho * u_x,
            sq - 0.5 * rho * u_y,
            0.25 * PIxy,
            -0.25 * PIxy,
            0.25 * PIxy,
            -0.25 * PIxy,
        ]

    sf = shear_parts(*moments(f_new))
    se = shear_parts(*moments(feq_n))
    ds = [sf[q] - se[q] for q in range(9)]
    dh = [df[q] - ds[q] for q in range(9)]

    dsdh = dhdh = None
    for q in range(9):
        inv = 1.0 / (feq_n[q] + eps)
        a = ds[q] * dh[q] * inv
        b = dh[q] * dh[q] * inv
        dsdh = a if dsdh is None else dsdh + a
        dhdh = b if dhdh is None else dhdh + b
    gamma = 1.0 / beta - (2.0 - 1.0 / beta) * (dsdh / (dhdh + eps))

    for q in range(9):
        f_out[q] = f_new[q] - beta * (2.0 * ds[q] + gamma * dh[q])


def _make_kernel(W, TH, relax):
    """relax: ('bgk', tau) | ('mrt', MinvSM tuple) | ('kbc', tau, kbc_type)."""
    if relax[0] == "mrt":
        A = [[float(relax[1][a][b]) for b in range(9)] for a in range(9)]

    def kernel(f_tp, f_m, f_bt, f_out, rho_out, vel_out):
        def stitch(tp, m, bt):
            return jnp.concatenate([tp[-1:, :], m, bt[0:1, :]], axis=-2)

        f_new = [f_m[0]]
        for q in range(1, 9):
            ex, ey = int(E[q, 0]), int(E[q, 1])
            pad = stitch(f_tp[q], f_m[q], f_bt[q])
            rows = pad[1 - ey : 1 - ey + TH, :]
            if ex:
                rows = pltpu.roll(rows, ex % W, axis=1)
            f_new.append(rows)

        rho = f_new[0]
        for q in range(1, 9):
            rho = rho + f_new[q]
        mom_x = f_new[1] - f_new[3] + f_new[5] - f_new[6] - f_new[7] + f_new[8]
        mom_y = f_new[2] - f_new[4] + f_new[5] + f_new[6] - f_new[7] - f_new[8]
        safe = jnp.where(rho == 0, 1.0, rho)
        u_x = mom_x / safe
        u_y = mom_y / safe

        feq_n = _feq_terms(rho, u_x, u_y)
        if relax[0] == "bgk":
            inv_tau = 1.0 / relax[1]
            for q in range(9):
                f_out[q] = f_new[q] + inv_tau * (feq_n[q] - f_new[q])
        elif relax[0] == "kbc":
            _kbc_apply(f_new, feq_n, rho, u_x, u_y, relax[1], relax[2], f_out)
        else:
            no_obs = jnp.zeros_like(rho, dtype=jnp.bool_)
            _mrt_apply(A, f_new, feq_n, no_obs, f_out)
        rho_out[:] = rho
        vel_out[0] = u_x
        vel_out[1] = u_y

    return kernel


@partial(jax.jit, static_argnames=("H", "W", "TH", "relax"))
def _fused_periodic_step(f, H, W, TH, relax):
    n = H // TH
    k = _make_kernel(W, TH, relax)

    def b3(im, c=9):
        return pl.BlockSpec((c, TH, W), lambda i, im=im: (0, im(i), 0),
                            memory_space=pltpu.VMEM)

    def b2(im):
        return pl.BlockSpec((TH, W), lambda i, im=im: (im(i), 0),
                            memory_space=pltpu.VMEM)

    up = lambda i: jax.lax.rem(i - 1 + n, n)
    mid = lambda i: i
    dn = lambda i: jax.lax.rem(i + 1, n)
    f32 = jnp.float32
    return pl.pallas_call(
        k,
        grid=(n,),
        in_specs=[b3(up), b3(mid), b3(dn)],
        out_specs=[b3(mid), b2(mid), b3(mid, 2)],
        out_shape=[
            jax.ShapeDtypeStruct((9, H, W), f32),
            jax.ShapeDtypeStruct((H, W), f32),
            jax.ShapeDtypeStruct((2, H, W), f32),
        ],
    )(f, f, f)


def make_fused_periodic_step(cfg, tile_rows: int = 8):
    """Fused step for ShearLayerConfig-like configs (bgk or mrt)."""
    H, W = cfg.res
    assert H % tile_rows == 0
    if cfg.collision == "mrt":
        minv, _ = _collide.mrt_matrices(cfg.tau)
        relax = ("mrt", tuple(tuple(float(x) for x in r) for r in minv))
    elif cfg.collision == "bgk":
        relax = ("bgk", float(cfg.tau))
    elif cfg.collision == "kbc":
        kbc_type = cfg.kbc_type
        if kbc_type is None:
            kbc_type = int(KBCType.KBC_A)  # the reference demo's variant
        relax = ("kbc", float(cfg.tau), int(kbc_type))
    else:
        raise ValueError(
            f"fused periodic kernel supports bgk/mrt/kbc, not {cfg.collision}"
        )

    def step(state, fields):
        f, rho, vel = _fused_periodic_step(state["f"], H, W, tile_rows, relax)
        return {"f": f, "rho": rho, "vel": vel}

    return step


def make_fused_periodic_runner(cfg, tile_rows: int = 8):
    step = make_fused_periodic_step(cfg, tile_rows)

    def run(state, fields, n: int):
        for _ in range(n):
            state = step(state, fields)
        return state

    return run
