"""Profiling helpers on top of jax.profiler.

The reference's tracing story is wall-clock phase counters plus the per-node
sched eval-callback (SURVEY.md §5). Here the phase counters live in
utils/timings.py and per-node inspection in utils/inspect_graph.py; this
module adds the device-level story the reference lacks: XLA traces viewable
in Perfetto/TensorBoard, and cost-model FLOP estimates per jitted function.
"""

from __future__ import annotations

import contextlib
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/qa_trace"):
    """Capture a device trace: `with trace(): run_workload()` then load the
    directory in TensorBoard or ui.perfetto.dev."""
    import jax
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows as a span in the timeline)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


def cost_analysis(fn, *args, **kwargs) -> dict:
    """XLA's cost model for a jitted callable on the given args:
    {'flops': ..., 'bytes accessed': ...} — per-executable roofline input."""
    import jax
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):
        costs = costs[0] if costs else {}
    return dict(costs or {})


def flops_summary(fn, *args, tflops_peak: float = 197.0, **kwargs) -> str:
    """One-line roofline estimate for a jitted function on TPU v5e."""
    c = cost_analysis(fn, *args, **kwargs)
    flops = c.get("flops", 0.0)
    bytes_ = c.get("bytes accessed", 0.0)
    t_compute = flops / (tflops_peak * 1e12)
    t_memory = bytes_ / (819e9)   # v5e HBM bandwidth
    bound = "compute" if t_compute > t_memory else "memory"
    return (f"flops={flops/1e9:.2f}G bytes={bytes_/1e6:.1f}M "
            f"t_compute={t_compute*1e3:.3f}ms t_memory={t_memory*1e3:.3f}ms "
            f"-> {bound}-bound")
