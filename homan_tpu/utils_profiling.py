"""Lightweight stage timers + JAX profiler hooks.

The reference has no tracing/profiling (SURVEY §5); this gives the rebuild
per-stage wall timers (device-synchronized) and a convenience wrapper around
`jax.profiler` trace capture for xprof.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class StageTimers:
    """Accumulating named wall timers with device sync at boundaries."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str, sync=None):
        """`sync`: optional array/pytree to block on before stopping the
        clock (so async-dispatched device work is attributed correctly)."""
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            if "sync" in holder or sync is not None:
                import jax
                jax.block_until_ready(holder.get("sync", sync))
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda k: -self.totals[k]):
            n = self.counts[name]
            lines.append(f"{name:32s} {self.totals[name]:8.2f}s"
                         f"  x{n}  ({self.totals[name] / n * 1000:8.1f} ms avg)")
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture an xprof trace around a block (view with xprof/tensorboard)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


# ---------------------------------------------------------------------------
# Device duty cycle + roofline accounting (BENCH extra: VERDICT r3 #2)
# ---------------------------------------------------------------------------

# v5e single-chip peaks (public: cloud.google.com/tpu/docs + the scaling
# book's hardware tables). The rasterizer's shade kernel is elementwise
# (VPU) work; its one-hot backward einsum is MXU work.
V5E_PEAK = {
    "mxu_bf16_tflops": 197.0,
    # f32 matmul runs as 3-pass bf16 on the MXU (precision=HIGHEST) at 1/3
    # throughput; the single-pass default is 197 with ~0.5% error.
    "mxu_f32_tflops": 197.0 / 3,
    # VPU: 8 sublanes x 128 lanes x 4 ALUs x 2 flops (FMA) at ~0.94 GHz.
    "vpu_f32_tflops": 7.7,
    "hbm_gbps": 819.0,
}

# Per-(pixel, edge-candidate) op counts of the fused shade kernel, counted
# from render/pallas_shade.py (comparisons/selects counted as 1 VPU op,
# divides as 1):
#   _shade_fwd_kernel pass 1 (winding):    ~13 ops   (lines 93-105)
#   _shade_fwd_kernel pass 2 (distance):   ~40 ops   (lines 124-148)
# Backward (_shade_bwd_vjp): one-hot build (1 compare) + (P,ke)x(P,4)
# einsum at HIGHEST = 3 bf16 passes -> 2*4*3 MAC-flops per (pixel, edge)
# on the MXU; per-pixel elementwise prep is amortized (<1 op per edge).
SHADE_FWD_OPS_PER_PIX_EDGE = 53.0
SHADE_BWD_VPU_OPS_PER_PIX_EDGE = 1.0
SHADE_BWD_MXU_FLOPS_PER_PIX_EDGE = 24.0


def shade_flops_per_iter(batch: int, image_size: int, edges_per_tile: int):
    """Analytic FLOPs of one silhouette-loss iteration's shade fwd+bwd.

    Every pixel evaluates every per-tile edge candidate (the kernel unrolls
    the static ke loop over the full tile), so the count is exact up to the
    per-op weights above: B * S^2 * ke * ops.
    Returns dict {vpu_flops, mxu_flops}.
    """
    pix_edge = float(batch) * image_size * image_size * edges_per_tile
    return {
        "vpu_flops": pix_edge * (SHADE_FWD_OPS_PER_PIX_EDGE
                                 + SHADE_BWD_VPU_OPS_PER_PIX_EDGE),
        "mxu_flops": pix_edge * SHADE_BWD_MXU_FLOPS_PER_PIX_EDGE,
    }


def voxelize_flops_per_iter(batch: int, n_meshes: int, faces: int,
                            grid_size: int = 32,
                            ops_per_pair: float = 150.0):
    """Analytic VPU FLOPs of one grid-SDF iteration's voxelize pass
    (interactions/pallas_sdf.py: ~150 ops per (cell, face) pair: 3 segment
    distances + plane/barycentric + column parity)."""
    return {"vpu_flops": (float(batch) * n_meshes * grid_size ** 3
                          * faces * ops_per_pair)}


def parse_trace_device_time(log_dir: str):
    """Parse a jax.profiler trace dir: per-device busy time + trace span.

    Reads the xplane.pb protobufs directly (the tensorboard_plugin_profile
    pywrap converter is incompatible with the installed TF). Busy time =
    union of event intervals on each device plane's XLA-op lines (merged,
    so overlapping core lines don't double-count).

    Returns dict {device_busy_s, span_s, duty_cycle, per_op_s (top 10)} or
    None when no device plane exists (cpu backend / relay without profiler
    support).
    """
    import glob

    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    files = sorted(glob.glob(log_dir + "/**/*.xplane.pb", recursive=True))
    if not files:
        return None
    intervals = []
    per_op = defaultdict(float)
    t_min, t_max = None, None
    for fp in files:
        xs = xplane_pb2.XSpace()
        with open(fp, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            name = plane.name.lower()
            if not ("/device:" in name or "tpu" in name):
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                lname = line.name.lower()
                # XLA op/module lines carry compute events; skip derived
                # bookkeeping lines (steps, framework annotations).
                if "step" in lname or "framework" in lname:
                    continue
                base = line.timestamp_ns
                for ev in line.events:
                    s = base + ev.offset_ps / 1e3
                    e = s + ev.duration_ps / 1e3
                    intervals.append((s, e))
                    per_op[ev_meta.get(ev.metadata_id, "?")] += (
                        ev.duration_ps / 1e12)
                    t_min = s if t_min is None else min(t_min, s)
                    t_max = e if t_max is None else max(t_max, e)
    if not intervals:
        return None
    intervals.sort()
    busy_ns = 0.0
    cur_s, cur_e = intervals[0]
    for s, e in intervals[1:]:
        if s > cur_e:
            busy_ns += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    busy_ns += cur_e - cur_s
    span_s = (t_max - t_min) / 1e9
    top = dict(sorted(per_op.items(), key=lambda kv: -kv[1])[:10])
    return {
        "device_busy_s": busy_ns / 1e9,
        "span_s": span_s,
        "duty_cycle": (busy_ns / 1e9) / max(span_s, 1e-9),
        "per_op_s": top,
    }


def measure_duty_cycle(fn, log_dir: str = "/tmp/homan-duty-trace"):
    """Run fn() under a profiler trace; return parse_trace_device_time
    output + wall_s (None fields when the backend/relay has no profiler)."""
    import shutil
    import jax

    shutil.rmtree(log_dir, ignore_errors=True)
    t0 = time.perf_counter()
    try:
        with profile_trace(log_dir):
            out = fn()
            jax.block_until_ready(out)
    except Exception:
        # profiler unsupported on this backend/relay: measure wall only
        out = fn()
        jax.block_until_ready(out)
        return {"wall_s": time.perf_counter() - t0}
    wall = time.perf_counter() - t0
    stats = parse_trace_device_time(log_dir) or {}
    stats["wall_s"] = wall
    # duty cycle vs the measured WALL (the trace span can start late)
    if "device_busy_s" in stats:
        stats["duty_cycle_vs_wall"] = stats["device_busy_s"] / max(wall, 1e-9)
    return stats
