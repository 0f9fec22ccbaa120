"""Tracing / profiling / speed-of-light analysis.

The reference has no profiling beyond tqdm wall-clock (SURVEY §5).  Here:
``trace`` context manager wraps ``jax.profiler`` for TensorBoard-viewable
traces, ``time_fn`` gives steady-state timings, and ``roofline`` reports a
kernel's achieved fraction of the chip's peak FLOPs/bandwidth — the
per-kernel "speed-of-light" analysis required by the north star.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax

__all__ = ["trace", "time_fn", "roofline", "CHIP_SPECS"]


# Peak specs per chip generation: (fp32 TFLOP/s on VPU-ish paths, bf16 MXU
# TFLOP/s, HBM GB/s).  Sources: public TPU spec sheets.
CHIP_SPECS = {
    "v5e": {"fp32_tflops": 0.9 * 4, "bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "v5p": {"fp32_tflops": 0.9 * 8, "bf16_tflops": 459.0, "hbm_gbps": 2765.0},
    "v4": {"fp32_tflops": 0.9 * 4, "bf16_tflops": 275.0, "hbm_gbps": 1228.0},
}


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ls_tpu_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def time_fn(fn, *args, iters: int = 10, warmup: int = 2):
    """Steady-state seconds/call (blocks on all outputs)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


@dataclass
class Roofline:
    seconds: float
    flops: float
    bytes: float
    achieved_tflops: float
    achieved_gbps: float
    flops_fraction: float
    bandwidth_fraction: float
    bound: str

    def __str__(self):
        return (
            f"{self.seconds*1e3:.3f} ms | {self.achieved_tflops:.2f} TFLOP/s "
            f"({100*self.flops_fraction:.1f}% peak) | {self.achieved_gbps:.1f} GB/s "
            f"({100*self.bandwidth_fraction:.1f}% peak) | {self.bound}-bound"
        )


def roofline(fn, *args, flops: float, bytes_moved: float, chip: str = "v5e",
             iters: int = 10) -> Roofline:
    """Measure ``fn`` and compare to the chip's roofline."""
    spec = CHIP_SPECS[chip]
    dt = time_fn(fn, *args, iters=iters)
    tflops = flops / dt / 1e12
    gbps = bytes_moved / dt / 1e9
    ai = flops / max(bytes_moved, 1.0)
    ridge = spec["fp32_tflops"] * 1e12 / (spec["hbm_gbps"] * 1e9)
    return Roofline(
        seconds=dt, flops=flops, bytes=bytes_moved,
        achieved_tflops=tflops, achieved_gbps=gbps,
        flops_fraction=tflops / spec["fp32_tflops"],
        bandwidth_fraction=gbps / spec["hbm_gbps"],
        bound="compute" if ai > ridge else "memory",
    )
