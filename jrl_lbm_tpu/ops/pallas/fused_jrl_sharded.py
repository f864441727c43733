"""Sharded row-tiled fused JRL kernels: shard_map × ppermute halos.

Multi-chip JRL at production refine levels (refine >= 8 per chip): the
row-tiled fused kernels of `fused_jrl_tiled.py` run on each shard of a
(ny, nx) mesh, with the cross-shard 1-row y halos travelling as
O(surface) ppermute pieces that the kernels swap in on their first/last
tiles (the `fused_sharded._lean_tiled_step` pattern). Row meshes are
the natural decomposition — JRL domains are H = 2W tall
(`/root/reference/demo/demo_2d_LBM_JRL_fluid_cylinder.py:283`), and the
x=0 symmetry axis plus the x=W-1 outflow wall leave nothing periodic to
split in x — but nx > 1 (2D) meshes are supported through the
EXTENDED-WINDOW mode (the `fused_sharded` ``x_ext`` scheme composed
with the JRL kernels): each shard ppermutes its ``x_ext``-wide edge
lane blocks to its x neighbours, the kernels compute window-parametric
in x on width w + 2*x_ext (`fused_jrl_tiled` ``xw`` mode, all x masks
on global coordinates from the shard's column offset), and the exact
central body lanes are sliced into the outputs.

Three runner families, drop-in sharded twins of the `fused_jrl_tiled`
ones (same (state, fields, ...) contracts, global arrays in/out):

* fluid: kernel A (stream + SFC + macro) then kernel B (axisymmetric
  BGK) per step — two ppermute rounds per step (kernel B's stencils
  read the POST-macro rho/vel halos).
* C balance: one kernel per step; the fixed-flags halo pieces are
  hoisted out of the step loop.
* C approach: one kernel per step; the tip-disk inflow/current
  integrals (`demo_2d_LBM_JRL_C_ethaline.py:364-385`, flat flux form
  `C_cylinder:344-358`) come out of the kernel as per-tile row-masked
  partial sums (exact across tile and shard boundaries) and are
  reduced with one tiny `psum` per step.

The concentration phase is where multi-chip matters most: every sweep
case spends most of its steps there, and the balance phase alone is
O(1e9) steps at reference dt (docs/STATUS.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from jrl_lbm_tpu.ops.pallas import fused_jrl_tiled as T
from jrl_lbm_tpu.parallel.mesh import AXIS_X, AXIS_Y

f32 = jnp.float32


def _pieces(x):
    """Cross-shard 1-row y-halo pieces of a ``(planes, h, w)`` shard
    block, zero-padded to Mosaic's 8-row block granularity: returns
    ``(top, bot)`` of shape ``(planes, 8, w)`` with the real row
    ADJACENT to the body (top's last row, bot's first row) — the layout
    the shard-mode kernels read (`fused_jrl_tiled._make_kernel_a`)."""
    from jrl_lbm_tpu.ops.pallas.fused_sharded import _halo_pieces

    top, bot, _, _ = _halo_pieces(x, AXIS_Y, AXIS_X, cols=False, rows=1)
    z = jnp.zeros(top.shape[:-2] + (7,) + top.shape[-1:], top.dtype)
    return (jnp.concatenate([z, top], axis=-2),
            jnp.concatenate([bot, z], axis=-2))


def _pick_local_tile_rows(h: int) -> int:
    for TH in (64, 32, 16, 8):
        if h % TH == 0:
            return TH
    raise ValueError(f"shard height {h} not tileable (need h % 8 == 0)")


def _xblocks(x, x_ext, interpret=False):
    """y-EXTENDED ``(planes, h+2, x_ext)`` x-neighbour edge blocks of a
    ``(planes, h, w)`` shard block for the 2D-mesh extended-window mode
    (the `fused_sharded` ``xblocks`` pattern at 1-row y extension):
    x-ppermute the ``x_ext``-wide edge lane blocks, then y-ppermute
    their end rows (two-phase — the diagonal corner data rides the
    second hop). JRL x boundaries are non-periodic (x=0 symmetry axis,
    x=W-1 outflow wall), but the x-ring wrap's garbage at the outer
    shards is never read: the at_x0/at_xW masks override every pull
    that would touch it (`fused_jrl_tiled._TileCtx`)."""
    from jrl_lbm_tpu.ops.pallas.fused_sharded import _edge_blocks
    from jrl_lbm_tpu.parallel.halo import _ring_perm

    ny = jax.lax.axis_size(AXIS_Y)
    nx = jax.lax.axis_size(AXIS_X)
    xl, xr = _edge_blocks(x, x_ext, interpret=interpret)
    lb = jax.lax.ppermute(xr, AXIS_X, _ring_perm(nx, 1))
    rb = jax.lax.ppermute(xl, AXIS_X, _ring_perm(nx, -1))
    pyd, pyu = _ring_perm(ny, 1), _ring_perm(ny, -1)

    def yext(b):
        return jnp.concatenate(
            [jax.lax.ppermute(b[..., -1:, :], AXIS_Y, pyd), b,
             jax.lax.ppermute(b[..., :1, :], AXIS_Y, pyu)], axis=-2)

    return yext(lb), yext(rb)


def _ext_windows(blk, TH):
    """Per-tile ``(TH+2)``-row windows of a ``(planes, h+2, x_ext)``
    extended block, stacked to ``(n_t, planes, TH+2, x_ext)`` (the
    windows overlap by 2 rows, which BlockSpec strides cannot express;
    the blocks are O(h * x_ext) so the gather is negligible)."""
    h = blk.shape[-2] - 2
    n_t = h // TH
    return jnp.stack(
        [jax.lax.slice_in_dim(blk, i * TH, i * TH + TH + 2, axis=-2)
         for i in range(n_t)], axis=0)


def _xw_of(w: int, nx: int, x_ext=None):
    """Extension width for an nx-wide mesh: None (off) when nx == 1,
    else >= 2 lanes per side (>= 2 so the innermost extension lane's
    in-kernel outputs are exact — the approach kernel's flat flux form
    reads C at body_last+1), default 8 (= the k-blocking halo depth the
    cylinder path ships; full lane-group alignment is not worth 16x the
    ICI bytes at k=1)."""
    if nx == 1:
        return None
    xe = 8 if x_ext is None else int(x_ext)
    xe = min(xe, w)
    if xe < 2:
        raise ValueError(f"shard width {w} too narrow for x_ext >= 2")
    return (xe, w)


def _ext_spec(planes, TH, x_ext):
    return pl.BlockSpec((1, planes, TH + 2, x_ext),
                        lambda i: (i, 0, 0, 0))


def _step_a(off, step_arr, f, vel, rho, tpA, btA, cfg_c, TH, h, interpret,
            xw=None, lwA=None, rwA=None):
    w = xw[1] if xw else cfg_c["W"]
    n = h // TH
    _, up, dn, b2, b3 = T._specs(h, w, TH)
    mid = lambda i: i  # noqa: E731
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    pb = pl.BlockSpec((11, 8, w), lambda i: (0, 0, 0))
    ka = T._make_kernel_a(cfg_c, TH, lambda i: i, shard=True, xw=xw)
    specs = [smem, smem, b3(up), b3(mid), b3(dn), b3(up, 2),
             b3(mid, 2), b3(dn, 2), b2(mid), pb, pb]
    args = [step_arr, off, f, f, f, vel, vel, vel, rho, tpA, btA]
    if xw:
        specs += [_ext_spec(11, TH, xw[0])] * 2
        args += [lwA, rwA]
    return pl.pallas_call(
        ka,
        grid=(n,),
        in_specs=specs,
        out_specs=[b3(mid), b2(mid), b3(mid, 2)],
        out_shape=[
            jax.ShapeDtypeStruct((9, h, w), f32),
            jax.ShapeDtypeStruct((h, w), f32),
            jax.ShapeDtypeStruct((2, h, w), f32),
        ],
        compiler_params=T._VMEM_PARAMS,
        interpret=interpret,
    )(*args)


def _step_b(off, step_arr, f1, rho1, vel1, tpB, btB, cfg_c, TH, h,
            interpret, xw=None, lwB=None, rwB=None):
    w = xw[1] if xw else cfg_c["W"]
    n = h // TH
    _, up, dn, b2, b3 = T._specs(h, w, TH)
    mid = lambda i: i  # noqa: E731
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    pb = pl.BlockSpec((3, 8, w), lambda i: (0, 0, 0))
    kb = T._make_kernel_b(cfg_c, TH, lambda i: i, shard=True, xw=xw)
    specs = [smem, smem, b3(mid), b2(up), b2(mid), b2(dn), b3(up, 2),
             b3(mid, 2), b3(dn, 2), pb, pb]
    args = [step_arr, off, f1, rho1, rho1, rho1, vel1, vel1, vel1,
            tpB, btB]
    if xw:
        specs += [_ext_spec(3, TH, xw[0])] * 2
        args += [lwB, rwB]
    return pl.pallas_call(
        kb,
        grid=(n,),
        in_specs=specs,
        out_specs=b3(mid),
        out_shape=jax.ShapeDtypeStruct((9, h, w), f32),
        compiler_params=T._VMEM_PARAMS,
        interpret=interpret,
    )(*args)


def _make_kernel_a_lean_sh(cfg_c, TH):
    """Per-shard LEAN A kernel (r5): interior shards provably above the
    tip frontier run `fused_jrl_tiled._fluid_a_lean` — streaming +
    x-edge rules + macro only — with the cross-shard y-halo piece
    stitching of `_make_kernel_a(shard=True)` (pieces carry values
    only, which is all the lean body reads)."""

    def kernel(f_tp, f_m, f_bt, tpP, btP, f_out, rho_out, vel_out):
        pid = pl.program_id(0)
        first = pid == 0
        last = pid == pl.num_programs(0) - 1

        def stitch(tp, mid_, bt, pi):
            top = jnp.where(first, tpP[pi, -1:, :], tp[..., -1:, :])
            bot = jnp.where(last, btP[pi, 0:1, :], bt[..., 0:1, :])
            return jnp.concatenate([top, mid_, bot], axis=-2)

        f_pad = [stitch(f_tp[q], f_m[q], f_bt[q], q) for q in range(9)]
        f_new, rho_n, un0, un1 = T._fluid_a_lean(cfg_c, TH, f_pad)
        for q in range(9):
            f_out[q] = f_new[q]
        rho_out[:] = rho_n
        vel_out[0] = un0
        vel_out[1] = un1

    return kernel


def _make_kernel_b_lean_sh(cfg_c, TH):
    """Per-shard LEAN B kernel: `_fluid_b_lean` with stitched
    cross-shard rho/vel halo pieces ((3, 8, w): rho + vel x2)."""

    def kernel(f_m, rho_tp, rho_m, rho_bt, vel_tp, vel_m, vel_bt,
               tpP, btP, f_out):
        pid = pl.program_id(0)
        first = pid == 0
        last = pid == pl.num_programs(0) - 1

        def stitch(tp, mid_, bt, pi):
            top = jnp.where(first, tpP[pi, -1:, :], tp[..., -1:, :])
            bot = jnp.where(last, btP[pi, 0:1, :], bt[..., 0:1, :])
            return jnp.concatenate([top, mid_, bot], axis=-2)

        rho_pad = stitch(rho_tp[:], rho_m[:], rho_bt[:], 0)
        v0_pad = stitch(vel_tp[0], vel_m[0], vel_bt[0], 1)
        v1_pad = stitch(vel_tp[1], vel_m[1], vel_bt[1], 2)
        fq = [f_m[q] for q in range(9)]
        f_new = T._fluid_b_lean(cfg_c, TH, fq, rho_pad, (v0_pad, v1_pad))
        for q in range(9):
            f_out[q] = f_new[q]

    return kernel


def _step_a_lean(f, tpA, btA, cfg_c, TH, h, w, interpret):
    n = h // TH
    _, up, dn, b2, b3 = T._specs(h, w, TH)
    mid = lambda i: i  # noqa: E731
    pb = pl.BlockSpec((11, 8, w), lambda i: (0, 0, 0))
    ka = _make_kernel_a_lean_sh(cfg_c, TH)
    return pl.pallas_call(
        ka,
        grid=(n,),
        in_specs=[b3(up), b3(mid), b3(dn), pb, pb],
        out_specs=[b3(mid), b2(mid), b3(mid, 2)],
        out_shape=[
            jax.ShapeDtypeStruct((9, h, w), f32),
            jax.ShapeDtypeStruct((h, w), f32),
            jax.ShapeDtypeStruct((2, h, w), f32),
        ],
        compiler_params=T._VMEM_PARAMS,
        interpret=interpret,
    )(f, f, f, tpA, btA)


def _step_b_lean(f1, rho1, vel1, tpB, btB, cfg_c, TH, h, w, interpret):
    n = h // TH
    _, up, dn, b2, b3 = T._specs(h, w, TH)
    mid = lambda i: i  # noqa: E731
    pb = pl.BlockSpec((3, 8, w), lambda i: (0, 0, 0))
    kb = _make_kernel_b_lean_sh(cfg_c, TH)
    return pl.pallas_call(
        kb,
        grid=(n,),
        in_specs=[b3(mid), b2(up), b2(mid), b2(dn), b3(up, 2),
                  b3(mid, 2), b3(dn, 2), pb, pb],
        out_specs=b3(mid),
        out_shape=jax.ShapeDtypeStruct((9, h, w), f32),
        compiler_params=T._VMEM_PARAMS,
        interpret=interpret,
    )(f1, rho1, rho1, rho1, vel1, vel1, vel1, tpB, btB)


def make_sharded_tiled_fluid_runner(cfg, mesh, tile_rows=None, unroll=8,
                                    interpret=False, x_ext=None,
                                    lean_split=True):
    """Sharded twin of `fused_jrl_tiled.make_tiled_fluid_runner`: same
    (state, fields, start_step, n) contract with GLOBAL arrays (jit +
    shard_map partition them onto the mesh). 2D (nx > 1) meshes run the
    extended-window mode: each kernel call also receives the x
    neighbours' ``x_ext``-wide edge blocks (ppermute) and computes on
    width w + 2*x_ext, slicing the exact body lanes into the outputs.

    ``lean_split`` (row meshes with ny >= 3, r5): interior shards whose
    rows sit provably above the tip frontier run the LEAN per-shard
    kernels (`_step_a_lean`/`_step_b_lean`) via a per-shard
    `lax.cond` — the predicate is uniform within a shard and the
    ppermute halo exchanges stay OUTSIDE the cond (collectives must be
    executed by every mesh member), so SPMD is preserved. Inert on 1x1
    and 2D meshes."""
    ny, nx = mesh.devices.shape
    H, W = cfg.eff_res
    assert H % ny == 0, f"H={H} not divisible by ny={ny}"
    assert W % nx == 0, f"W={W} not divisible by nx={nx}"
    h, w = H // ny, W // nx
    xw = _xw_of(w, nx, x_ext)
    TH = tile_rows if tile_rows is not None else _pick_local_tile_rows(h)
    assert h % TH == 0
    cfg_c = T._cfg_consts(cfg)
    lean_on = bool(lean_split) and xw is None and ny >= 3
    inflow_h = cfg_c["inflow_h"]
    vel_obs = cfg_c["vel_obs"]

    def chunk_local(f, rho, vel, step0, k):
        row0 = jax.lax.axis_index(AXIS_Y).astype(jnp.int32) * h
        if xw:
            col0 = jax.lax.axis_index(AXIS_X).astype(jnp.int32) * w
            off = jnp.stack([row0, col0])
        else:
            off = row0.reshape(1)
        for j in range(k):
            step_arr = (step0 + float(j)).astype(f32).reshape(1, 1)
            tpF, btF = _pieces(f)
            tpV, btV = _pieces(vel)
            tpA = jnp.concatenate([tpF, tpV], axis=0)
            btA = jnp.concatenate([btF, btV], axis=0)
            lwA = rwA = None
            if xw:
                lbF, rbF = _xblocks(f, xw[0], interpret)
                lbV, rbV = _xblocks(vel, xw[0], interpret)
                lwA = _ext_windows(jnp.concatenate([lbF, lbV], 0), TH)
                rwA = _ext_windows(jnp.concatenate([rbF, rbV], 0), TH)
            if lean_on:
                # shard provably above the tip for THIS step: its
                # lowest computed row's stencil reach stays above the
                # top obstacle row (walks_int - 1), +rounding guard
                wi = jnp.floor(inflow_h + (step0 + float(j)) * vel_obs
                               + 0.5)
                pred = ((row0.astype(f32) >= wi + 3.0) & (row0 > 0)
                        & (row0 + h < H))
                f1, rho1, vel1 = jax.lax.cond(
                    pred,
                    lambda fa, va, ra, ta, ba, sa, oa: _step_a_lean(
                        fa, ta, ba, cfg_c, TH, h, w, interpret),
                    lambda fa, va, ra, ta, ba, sa, oa: _step_a(
                        oa, sa, fa, va, ra, ta, ba, cfg_c, TH, h,
                        interpret),
                    f, vel, rho, tpA, btA, step_arr, off,
                )
            else:
                f1, rho1, vel1 = _step_a(off, step_arr, f, vel, rho,
                                         tpA, btA, cfg_c, TH, h,
                                         interpret, xw, lwA, rwA)
            tpR, btR = _pieces(rho1[None])
            tpV1, btV1 = _pieces(vel1)
            tpB = jnp.concatenate([tpR, tpV1], axis=0)
            btB = jnp.concatenate([btR, btV1], axis=0)
            lwB = rwB = None
            if xw:
                lbR, rbR = _xblocks(rho1[None], xw[0], interpret)
                lbV1, rbV1 = _xblocks(vel1, xw[0], interpret)
                lwB = _ext_windows(jnp.concatenate([lbR, lbV1], 0), TH)
                rwB = _ext_windows(jnp.concatenate([rbR, rbV1], 0), TH)
            if lean_on:
                f = jax.lax.cond(
                    pred,
                    lambda fa, ra, va, ta, ba, sa, oa: _step_b_lean(
                        fa, ra, va, ta, ba, cfg_c, TH, h, w, interpret),
                    lambda fa, ra, va, ta, ba, sa, oa: _step_b(
                        oa, sa, fa, ra, va, ta, ba, cfg_c, TH, h,
                        interpret),
                    f1, rho1, vel1, tpB, btB, step_arr, off,
                )
            else:
                f = _step_b(off, step_arr, f1, rho1, vel1, tpB, btB,
                            cfg_c, TH, h, interpret, xw, lwB, rwB)
            rho, vel = rho1, vel1
        return f, rho, vel

    s3 = P(None, AXIS_Y, AXIS_X)
    s2 = P(AXIS_Y, AXIS_X)
    chunks = {}

    def get_chunk(k):
        if k not in chunks:
            fn = jax.shard_map(
                partial(chunk_local, k=k), mesh=mesh,
                in_specs=(s3, s2, s3, P()), out_specs=(s3, s2, s3),
                check_vma=False,
            )
            chunks[k] = jax.jit(fn)
        return chunks[k]

    def run(state, fields, start_step, n: int):
        del fields
        f, rho, vel = state["f"], state["rho"], state["vel"]
        s = int(start_step)
        end = s + int(n)
        while s < end:
            k = min(unroll, end - s)
            f, rho, vel = get_chunk(k)(f, rho, vel,
                                       jnp.asarray(float(s), f32))
            s += k
        return {"f": f, "rho": rho, "vel": vel}

    return run


def _step_balance(off, flags, h_arr, C, tpFl, btFl, tpH, btH, cfg_c, TH,
                  h, interpret, xw=None, lwFl=None, rwFl=None, lwH=None,
                  rwH=None):
    w = xw[1] if xw else cfg_c["W"]
    n = h // TH
    _, up, dn, b2, b3 = T._specs(h, w, TH)
    mid = lambda i: i  # noqa: E731
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    pbf = pl.BlockSpec((1, 8, w), lambda i: (0, 0, 0))
    pbh = pl.BlockSpec((9, 8, w), lambda i: (0, 0, 0))
    k = T._make_c_balance_kernel(cfg_c, TH, shard=True, xw=xw)
    specs = [smem, b2(up), b2(mid), b2(dn), b3(up), b3(mid), b3(dn),
             b2(mid), pbf, pbf, pbh, pbh]
    args = [off, flags, flags, flags, h_arr, h_arr, h_arr, C, tpFl, btFl,
            tpH, btH]
    if xw:
        specs += [_ext_spec(1, TH, xw[0])] * 2 + [_ext_spec(9, TH, xw[0])] * 2
        args += [lwFl, rwFl, lwH, rwH]
    return pl.pallas_call(
        k,
        grid=(n,),
        in_specs=specs,
        out_specs=[b3(mid), b2(mid)],
        out_shape=[
            jax.ShapeDtypeStruct((9, h, w), f32),
            jax.ShapeDtypeStruct((h, w), f32),
        ],
        compiler_params=T._VMEM_PARAMS,
        interpret=interpret,
    )(*args)


def make_sharded_tiled_balance_runner(cfg, flags, mesh, tile_rows=None,
                                      unroll=8, interpret=False,
                                      x_ext=None):
    """Sharded twin of `fused_jrl_tiled.make_tiled_balance_runner`.
    2D (nx > 1) meshes run the extended-window mode (see
    `make_sharded_tiled_fluid_runner`)."""
    ny, nx = mesh.devices.shape
    H, W = cfg.eff_res
    assert H % ny == 0
    assert W % nx == 0
    h, w = H // ny, W // nx
    xw = _xw_of(w, nx, x_ext)
    TH = tile_rows if tile_rows is not None else _pick_local_tile_rows(h)
    assert h % TH == 0
    cfg_c = T._c_cfg_consts(cfg)

    def chunk_local(h_arr, C, fl, k):
        row0 = jax.lax.axis_index(AXIS_Y).astype(jnp.int32) * h
        if xw:
            col0 = jax.lax.axis_index(AXIS_X).astype(jnp.int32) * w
            off = jnp.stack([row0, col0])
        else:
            off = row0.reshape(1)
        tpFl, btFl = _pieces(fl[None])  # flags are fixed: hoisted
        lwFl = rwFl = None
        if xw:
            lbFl, rbFl = _xblocks(fl[None], xw[0], interpret)
            lwFl = _ext_windows(lbFl, TH)
            rwFl = _ext_windows(rbFl, TH)
        for _ in range(k):
            tpH, btH = _pieces(h_arr)
            lwH = rwH = None
            if xw:
                lbH, rbH = _xblocks(h_arr, xw[0], interpret)
                lwH = _ext_windows(lbH, TH)
                rwH = _ext_windows(rbH, TH)
            h_arr, C = _step_balance(off, fl, h_arr, C, tpFl, btFl, tpH,
                                     btH, cfg_c, TH, h, interpret,
                                     xw, lwFl, rwFl, lwH, rwH)
        return h_arr, C

    s3 = P(None, AXIS_Y, AXIS_X)
    s2 = P(AXIS_Y, AXIS_X)
    chunks = {}

    def get_chunk(k):
        if k not in chunks:
            fn = jax.shard_map(
                partial(chunk_local, k=k), mesh=mesh,
                in_specs=(s3, s2, s2), out_specs=(s3, s2),
                check_vma=False,
            )
            chunks[k] = jax.jit(fn)
        return chunks[k]

    flags_dev = jnp.asarray(flags)

    def run(state, fields, n: int):
        del fields
        h_arr, C = state["h"], state["C"]
        s = 0
        while s < int(n):
            k = min(unroll, int(n) - s)
            h_arr, C = get_chunk(k)(h_arr, C, flags_dev)
            s += k
        return {"C": C, "h": h_arr}

    return run


def _step_approach(off, step_arr, base_flags, h_arr, C, vel, tpFl, btFl,
                   tpH, btH, cfg_c, TH, h, interpret, xw=None, lwFl=None,
                   rwFl=None, lwH=None, rwH=None):
    w = xw[1] if xw else cfg_c["W"]
    n = h // TH
    _, up, dn, b2, b3 = T._specs(h, w, TH)
    mid = lambda i: i  # noqa: E731
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    pbf = pl.BlockSpec((1, 8, w), lambda i: (0, 0, 0))
    pbh = pl.BlockSpec((9, 8, w), lambda i: (0, 0, 0))
    kacc = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    k = T._make_c_approach_kernel(cfg_c, TH, shard=True, xw=xw)
    specs = [smem, smem, b2(up), b2(mid), b2(dn), b3(up), b3(mid),
             b3(dn), b2(mid), b3(mid, 2), pbf, pbf, pbh, pbh]
    args = [step_arr, off, base_flags, base_flags, base_flags, h_arr,
            h_arr, h_arr, C, vel, tpFl, btFl, tpH, btH]
    if xw:
        specs += [_ext_spec(1, TH, xw[0])] * 2 + [_ext_spec(9, TH, xw[0])] * 2
        args += [lwFl, rwFl, lwH, rwH]
    return pl.pallas_call(
        k,
        grid=(n,),
        in_specs=specs,
        out_specs=[b3(mid), b2(mid), kacc],
        out_shape=[
            jax.ShapeDtypeStruct((9, h, w), f32),
            jax.ShapeDtypeStruct((h, w), f32),
            jax.ShapeDtypeStruct((n, 8, 128), f32),
        ],
        compiler_params=T._VMEM_PARAMS,
        interpret=interpret,
    )(*args)


def make_sharded_tiled_approach_runner(cfg, vel_field, mesh,
                                       tile_rows=None, unroll=8,
                                       interpret=False, x_ext=None):
    """Sharded twin of `fused_jrl_tiled.make_tiled_approach_runner`:
    same (state, fields, start_step, n) -> (state, acc) contract.

    The stored-velocity frames shard along their row axis; the per-step
    frame interpolation (`models/jrl.py::make_approach_step`) runs at
    the jnp level on each shard's slice. The tip-disk integrals come out
    of the kernel as per-tile row-masked partial sums (the acc output,
    exact across tile AND shard boundaries because every term is a
    single-row sum owned by exactly one tile) and are reduced with one
    tiny `psum` per step."""
    ny, nx = mesh.devices.shape
    H, W = cfg.eff_res
    assert H % ny == 0
    assert W % nx == 0
    h, w = H // ny, W // nx
    xw = _xw_of(w, nx, x_ext)
    TH = tile_rows if tile_rows is not None else _pick_local_tile_rows(h)
    assert h % TH == 0
    cfg_c = T._c_cfg_consts(cfg)
    v = cfg_c["v"]
    frames = jnp.asarray(vel_field, f32)
    n_frames = int(frames.shape[0])

    def chunk_local(h_arr, C, base_flags, fr, step0, acc0, k):
        row0 = jax.lax.axis_index(AXIS_Y).astype(jnp.int32) * h
        if xw:
            col0 = jax.lax.axis_index(AXIS_X).astype(jnp.int32) * w
            off = jnp.stack([row0, col0])
        else:
            off = row0.reshape(1)
        tpFl, btFl = _pieces(base_flags[None])
        lwFl = rwFl = None
        if xw:
            lbFl, rbFl = _xblocks(base_flags[None], xw[0], interpret)
            lwFl = _ext_windows(lbFl, TH)
            rwFl = _ext_windows(rbFl, TH)
        infl, curr, cnt = acc0[0], acc0[1], acc0[4]
        acc_sum = last = None

        for j in range(k):
            step = step0 + float(j)
            step_arr = step.astype(f32).reshape(1, 1)
            # stored-velocity interpolation in tip-position space
            # (`models/jrl.py::make_approach_step`)
            x_interval = 0.1
            x_comp = step * v
            b = jnp.clip(jnp.floor(x_comp / x_interval), 0.0,
                         float(n_frames - 1))
            t = x_comp / x_interval - b
            bi = b.astype(jnp.int32)
            v0 = jax.lax.dynamic_index_in_dim(fr, bi, axis=0,
                                              keepdims=False)
            v1 = jax.lax.dynamic_index_in_dim(
                fr, jnp.minimum(bi + 1, n_frames - 1), axis=0,
                keepdims=False,
            )
            vel = jnp.where(b + 1.0 < float(n_frames),
                            v0 * (1.0 - t) + v1 * t, v0)

            tpH, btH = _pieces(h_arr)
            lwH = rwH = None
            if xw:
                lbH, rbH = _xblocks(h_arr, xw[0], interpret)
                lwH = _ext_windows(lbH, TH)
                rwH = _ext_windows(rbH, TH)
            h_arr, C, acc = _step_approach(off, step_arr, base_flags,
                                           h_arr, C, vel, tpFl, btFl,
                                           tpH, btH, cfg_c, TH, h,
                                           interpret, xw, lwFl, rwFl,
                                           lwH, rwH)
            # defer the tile/shard reductions: the per-tile partial-sum
            # planes are tiny ((n, 8, 128)), so the inflow/current
            # accumulation over the chunk is an elementwise add per step
            # and the cross-tile sum + cross-shard psum run ONCE per
            # chunk (the per-step psum+reduce was the sharded approach
            # path's 9% overhead vs unsharded, VERDICT r3 weak #2)
            acc_sum = acc if acc_sum is None else acc_sum + acc
            last = acc
            cnt = cnt + 1.0
        s_all = jnp.sum(acc_sum, axis=(0, 1))
        s_last = jnp.sum(last, axis=(0, 1))
        part = jax.lax.psum(
            jnp.stack([s_all[0], s_all[1], s_last[2], s_last[3]]),
            (AXIS_Y, AXIS_X),
        )
        return h_arr, C, jnp.stack(
            [infl + part[0], curr + part[1], part[2], part[3], cnt]
        )

    s3 = P(None, AXIS_Y, AXIS_X)
    s2 = P(AXIS_Y, AXIS_X)
    s4 = P(None, None, AXIS_Y, AXIS_X)
    chunks = {}

    def get_chunk(k):
        if k not in chunks:
            fn = jax.shard_map(
                partial(chunk_local, k=k), mesh=mesh,
                in_specs=(s3, s2, s2, s4, P(), P()),
                out_specs=(s3, s2, P()),
                check_vma=False,
            )
            chunks[k] = jax.jit(fn)
        return chunks[k]

    def run(state, fields, start_step, n: int):
        h_arr, C = state["h"], state["C"]
        base_flags = fields["base_flags"]
        acc = jnp.zeros((5,), f32)
        s = int(start_step)
        end = s + int(n)
        while s < end:
            k = min(unroll, end - s)
            h_arr, C, acc = get_chunk(k)(
                h_arr, C, base_flags, frames, jnp.asarray(float(s), f32),
                acc,
            )
            s += k
        return (
            {"C": C, "h": h_arr},
            {
                "inflow_sum": acc[0],
                "current_sum": acc[1],
                "count": acc[4],
                "rec_u": acc[2],
                "rec_v": acc[3],
            },
        )

    return run
