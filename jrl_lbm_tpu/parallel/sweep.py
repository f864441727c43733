"""TPU-parallel Re/Pe sweeps: vmapped lanes instead of serial processes.

The reference sweeps Pe by launching one OS process per (Re, Pe) pair
(`demo/batch_Pe.py:47-52`). Here a whole Pe sweep of the approach phase
runs as ONE device program: each Pe lane differs only in two scalars
(vel_obs_conv, tau_D — `C_ethaline:96-103`) and its trip count, so the
step is vmapped over lanes, lanes freeze once they pass their own
total_steps, and the per-lane record rows (the contents of
record_res*_Re*_Pe*.txt) accumulate on device. One kernel, L lanes of
the same grid — on TPU this turns the Q x H x W elementwise work into
L x Q x H x W with near-perfect utilization scaling.

Record parity with the serial runner is tested in
tests/test_sweep.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jrl_lbm_tpu.models import jrl


@dataclasses.dataclass
class SweepResult:
    Pes: List[float]
    records: np.ndarray  # [L, max_dumps, 5]: x_um, inflow, current, u, v
    n_dumps: np.ndarray  # [L] valid rows per lane


def pe_sweep_approach(
    cfg_base: jrl.JRLCConfig,
    Pes: Sequence[float],
    states,  # per-lane {"C": [L,H,W], "h": [L,9,H,W]} (e.g. balance results)
    fields,  # shared fields incl. "vel_field"
    chunk: int = 256,
    lane_devices=None,  # shard lanes across these devices (cross-chip DP)
    max_steps: int | None = None,  # smoke/dryrun cap on the step count
) -> SweepResult:
    """Run the approach phase for all Pe lanes simultaneously.

    ``lane_devices``: a sequence of JAX devices to shard the lane axis
    over (the cross-chip data-parallel form of the reference's
    one-process-per-Pe sweep, `demo/batch_Pe.py:47-52`). Lanes are
    padded to a multiple of the device count with frozen copies of lane
    0 (total_steps 0, so they never update or dump), the lane axis gets
    a `NamedSharding`, and — the lanes being fully independent — XLA
    partitions the vmapped step with zero collectives. Record parity
    with the single-device path is exact (tests/test_sweep.py)."""
    L = len(Pes)
    cfgs = [dataclasses.replace(cfg_base, Pe=float(p)) for p in Pes]
    v_l = np.asarray([c.vel_obs_conv for c in cfgs], np.float32)
    tau_l = np.asarray([c.tau_D for c in cfgs], np.float32)
    total_l = np.asarray([c.total_steps for c in cfgs], np.int32)
    dtcr_l = np.asarray([c.dt_conv_real for c in cfgs], np.float32)
    max_total = int(total_l.max())
    if max_steps is not None:
        max_total = min(max_total, int(max_steps))
    max_dumps = max(len(jrl.c_dump_steps(c)) for c in cfgs) + 1

    lane_sharding = None
    if lane_devices is not None:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        D = len(lane_devices)
        pad = (-L) % D
        if pad:
            v_l = np.concatenate([v_l, np.repeat(v_l[:1], pad)])
            tau_l = np.concatenate([tau_l, np.repeat(tau_l[:1], pad)])
            dtcr_l = np.concatenate([dtcr_l, np.repeat(dtcr_l[:1], pad)])
            total_l = np.concatenate(
                [total_l, np.zeros((pad,), np.int32)]
            )
            states = {
                k: jnp.concatenate(
                    [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])]
                )
                for k, a in states.items()
            }
        lane_mesh = Mesh(np.asarray(lane_devices), ("lanes",))
        lane_sharding = NamedSharding(lane_mesh, P("lanes"))
        rep = NamedSharding(lane_mesh, P())
        states = jax.device_put(states, lane_sharding)
        fields = {
            k: jax.device_put(v, rep) if hasattr(v, "shape") else v
            for k, v in fields.items()
        }
    Lp = len(v_l)

    step_fn = jrl.make_approach_step(cfg_base, parametrized=True)
    shared = {k: fields[k] for k in ("base_flags", "mesh", "vel_field")}
    inflow_h = cfg_base.inflow_height
    vor = cfg_base.vel_obs_real

    def lane_update(carry_lane, step_idx, v, tau, total, dtcr):
        state, acc, records, dump_idx = carry_lane
        f = dict(shared)
        f["vel_obs_conv"] = v
        f["tau_D"] = tau
        new_state, (inflow, current, rec_u, rec_v) = step_fn(state, f, step_idx)

        active = step_idx < total
        state = jax.tree_util.tree_map(
            lambda n, o: jnp.where(active, n, o), new_state, state
        )
        acc = {
            "s_in": jnp.where(active, acc["s_in"] + inflow, acc["s_in"]),
            "s_cur": jnp.where(active, acc["s_cur"] + current, acc["s_cur"]),
            "cnt": jnp.where(active, acc["cnt"] + 1.0, acc["cnt"]),
        }

        # dump when floor(walks) crosses an integer (`C_ethaline:390`)
        walks = inflow_h + step_idx.astype(jnp.float32) * v
        cross = jnp.floor(walks) == jnp.floor(walks + v) - 1.0
        do_dump = cross & active
        cnt = jnp.maximum(acc["cnt"], 1.0)
        x_um = (step_idx.astype(jnp.float32) + 1.0) * dtcr * vor * 1e6
        row = jnp.stack(
            [x_um, acc["s_in"] / cnt, acc["s_cur"] / cnt, rec_u, rec_v]
        )
        updated = jax.lax.dynamic_update_slice(
            records, row[None, :], (dump_idx, 0)
        )
        records = jnp.where(do_dump, updated, records)
        dump_idx = jnp.where(do_dump, dump_idx + 1, dump_idx)
        acc = jax.tree_util.tree_map(
            lambda a: jnp.where(do_dump, jnp.zeros_like(a), a), acc
        )
        return (state, acc, records, dump_idx)

    vmapped = jax.vmap(
        lane_update,
        in_axes=((0, 0, 0, 0), None, 0, 0, 0, 0),
        out_axes=(0, 0, 0, 0),
    )

    lane_arrs = tuple(
        jnp.asarray(a) for a in (v_l, tau_l, total_l, dtcr_l)
    )
    if lane_sharding is not None:
        lane_arrs = jax.device_put(lane_arrs, lane_sharding)

    @partial(jax.jit, static_argnames=("n",))
    def run_chunk(carry, start, n, v, tau, total, dtcr):
        def body(i, c):
            return vmapped(c, start + i, v, tau, total, dtcr)

        return jax.lax.fori_loop(0, n, body, carry)

    acc0 = {
        "s_in": jnp.zeros((Lp,), jnp.float32),
        "s_cur": jnp.zeros((Lp,), jnp.float32),
        "cnt": jnp.zeros((Lp,), jnp.float32),
    }
    records0 = jnp.zeros((Lp, max_dumps, 5), jnp.float32)
    dump0 = jnp.zeros((Lp,), jnp.int32)
    if lane_sharding is not None:
        acc0, records0, dump0 = jax.device_put(
            (acc0, records0, dump0), lane_sharding
        )
    carry = (states, acc0, records0, dump0)

    done = 0
    while done < max_total:
        n = min(chunk, max_total - done)
        carry = run_chunk(carry, jnp.asarray(done, jnp.int32), n, *lane_arrs)
        done += n

    _, _, records, dump_idx = carry
    return SweepResult(
        Pes=list(Pes),
        records=np.asarray(records)[:L],
        n_dumps=np.asarray(dump_idx)[:L],
    )


def write_sweep_records(result: SweepResult, cfg_base, record_dir, Re: float):
    """Emit one reference-format record file per lane
    (`C_ethaline:283-286,406-416`)."""
    import os

    os.makedirs(record_dir, exist_ok=True)
    paths = []
    for k, Pe in enumerate(result.Pes):
        name = os.path.join(
            record_dir,
            f"record_res{min(cfg_base.eff_res)}_Re{Re}_Pe{int(Pe * 10000)}.txt",
        )
        with open(name, "w") as fo:
            fo.write("Step Inflow Current u, v\n")
            for row in result.records[k, : int(result.n_dumps[k])]:
                fo.write("{} {} {} {} {}\n".format(*row))
        paths.append(name)
    return paths
