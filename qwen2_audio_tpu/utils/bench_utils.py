"""Matmul throughput micro-bench (≙ whisper_bench_ggml_mul_mat,
src/qwen2-whisper.cpp:3843-3959: N x N x N products over q4_0/q4_1/q5_0/
q5_1/q8_0/f16/f32). Here the formats are the TPU set — f32, bf16, and the
q8_0/q4_0 Pallas dequant matmuls.

Timing uses dependent chains + device->host readback (see bench.py: the
tunnel's block_until_ready returns early)."""

from __future__ import annotations

import time

import numpy as np


def _time_chain(fn, x0, chain: int = 8, rtt_s: float = 0.030) -> float:
    """Seconds per fn application, amortized over a dependent chain of
    Python-level dispatches (never lax.fori_loop around a Pallas call —
    that has hung the remote-compile path; see CLAUDE.md)."""
    import jax

    step = jax.jit(fn)
    _ = np.asarray(step(x0))   # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        c = x0
        for _i in range(chain):
            c = step(c)
        _ = np.asarray(jax.numpy.sum(c[:1, :1]))
        best = min(best, max(time.perf_counter() - t0 - rtt_s, 1e-9) / chain)
    return best


def mul_mat_bench(sizes=(512, 1024, 2048, 4096)) -> list[dict]:
    import jax.numpy as jnp
    from qwen2_audio_tpu.config import GGMLType
    from qwen2_audio_tpu.ops.quant_matmul import quant_matmul
    from qwen2_audio_tpu.quant.qparams import quantize_array_for_device

    rng = np.random.default_rng(0)
    rows = []
    for n in sizes:
        w = rng.standard_normal((n, n)).astype(np.float32) * 0.1
        flops = 2.0 * n * n * n
        for name, make in (
            ("f32", lambda: (jnp.asarray(w),
                             lambda x, ww=jnp.asarray(w): x @ ww)),
            ("bf16", lambda: (jnp.asarray(w, jnp.bfloat16),
                              lambda x, ww=jnp.asarray(w, jnp.bfloat16):
                              (x @ ww))),
            ("q8_0", lambda: _quant_fn(w, GGMLType.Q8_0, quant_matmul,
                                       quantize_array_for_device)),
            ("q4_0", lambda: _quant_fn(w, GGMLType.Q4_0, quant_matmul,
                                       quantize_array_for_device)),
        ):
            _, fn = make()
            dt = jnp.bfloat16 if name != "f32" else jnp.float32
            x0 = jnp.asarray(rng.standard_normal((n, n)) * 0.1, dt)
            sec = _time_chain(fn, x0)
            rows.append({"size": n, "type": name,
                         "gflops": flops / sec / 1e9})
    return rows


def _quant_fn(w, ttype, quant_matmul, quantize_array_for_device):
    qw = quantize_array_for_device(w, ttype)

    def fn(x):
        return quant_matmul(x, qw["qs"], qw["scales"]).astype(x.dtype)
    return qw, fn


def mul_mat_bench_str(sizes=(512, 1024, 2048)) -> str:
    lines = []
    for r in mul_mat_bench(sizes):
        lines.append(f"  {r['size']:4d} x {r['size']:4d}: {r['type']:>5s} "
                     f"{r['gflops']:10.1f} GFLOPS")
    return "\n".join(lines) + "\n"
