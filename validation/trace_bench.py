#!/usr/bin/env python
"""jax.profiler device trace of the bench kernel (VERDICT r4 #6).

The roofline artifact (`validation/roofline.py`) is a jaxpr-count LOWER
bound — it cannot see Mosaic loop/addressing overhead or inter-dispatch
gaps. This captures a hardware trace of one bench-shaped window of the
production fused cylinder kernel (2048^2, k=4, the bench.py
configuration), parses the XPlane protobuf with
tensorboard_plugin_profile, and writes a per-kernel summary (total us,
calls, us/call, duty cycle over the window span) to
validation/results/trace_bench.json. The raw trace directory is left in
/tmp (too large to commit); the JSON summary is the committed evidence
referenced from docs/PERFORMANCE.md's roofline section.
"""

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from jrl_lbm_tpu.models import cylinder as cyl
from jrl_lbm_tpu.ops.pallas import fused_step

TRACE_DIR = "/tmp/trace_bench"
STEPS = 600  # one bench.py window


def _hb(msg):
    print(f"[trace {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _parse(trace_dir):
    """Sum per-event durations on the TPU device planes of the xplane pb."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from xprof.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    space = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        space.ParseFromString(f.read())

    out = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        per = {}
        span_lo, span_hi = float("inf"), 0.0
        busy = 0.0  # leaf (non-envelope) event time only: the jit-level
        # module events ENCLOSE their kernels' events, so summing every
        # layer double-counts (a 1.99 "duty cycle" on the first cut)
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                dur = ev.duration_ps / 1e6  # us
                t0 = (line.timestamp_ns * 1e3 + ev.offset_ps) / 1e6
                d = per.setdefault(name, {"us": 0.0, "calls": 0})
                d["us"] += dur
                d["calls"] += 1
                if not name.startswith("jit"):
                    busy += dur
                span_lo = min(span_lo, t0)
                span_hi = max(span_hi, t0 + dur)
        if not per:
            continue
        span = span_hi - span_lo
        top = sorted(per.items(), key=lambda kv: -kv[1]["us"])[:12]
        out[plane.name] = {
            "span_us": round(span, 1),
            "busy_us": round(busy, 1),
            "duty_cycle": round(busy / span, 4) if span else None,
            "top_events": {
                k: {"us": round(d["us"], 1), "calls": d["calls"],
                    "us_per_call": round(d["us"] / d["calls"], 1)}
                for k, d in top
            },
        }
    return out


def main():
    res = (2048, 2048)
    cfg = cyl.CylinderConfig(res=res, D=64.0, Re=5000.0)
    _hb(f"init {res}")
    state, fields = cyl.init(cfg)
    run = fused_step.make_fused_cylinder_runner(cfg)
    _hb("warmup")
    state = run(state, fields, 20)
    float(jnp.sum(state["rho"]))
    _hb(f"tracing {STEPS}-step window")

    jax.profiler.start_trace(TRACE_DIR)
    t0 = time.perf_counter()
    state = run(state, fields, STEPS)
    float(jnp.sum(state["rho"]))
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    mlups = res[0] * res[1] * STEPS / wall / 1e6
    _hb(f"traced window: {mlups:.0f} MLUPS; parsing")

    summary = _parse(TRACE_DIR)
    out = {
        "config": f"{res[0]}x{res[1]} fused cylinder (bench.py kernel)",
        "steps": STEPS,
        "window_wall_s": round(wall, 4),
        "window_mlups": round(mlups, 1),
        "note": "traced window includes profiler overhead; bench.py's "
                "untraced number is the capability metric",
        "device_planes": summary,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "trace_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
