"""Matmul throughput micro-bench (≙ whisper_bench_ggml_mul_mat,
src/qwen2-whisper.cpp:3843-3959: N x N x N products over q4_0/q4_1/q5_0/
q5_1/q8_0/f16/f32). Here the formats are the TPU set — f32, bf16, and the
five legacy ggml block formats (q4_0/q4_1/q5_0/q5_1/q8_0) through
quant_linear (dequant-in-VMEM kernel + min-term for the _1 formats), plus
the exact-int8 group matmul (mmq analog) as "q8_0i".

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

    rng = np.random.default_rng(0)
    rows = []
    for n in sizes:
        w = rng.standard_normal((n, n)).astype(np.float32) * 0.1
        flops = 2.0 * n * n * n
        cases = [
            ("f32", lambda: (jnp.asarray(w),
                             lambda x, ww=jnp.asarray(w): x @ ww)),
            ("bf16", lambda: (jnp.asarray(w, jnp.bfloat16),
                              lambda x, ww=jnp.asarray(w, jnp.bfloat16):
                              (x @ ww))),
            ("q8_0i", lambda: _quant_fn(w, GGMLType.Q8_0, "int8")),
        ]
        cases += [(nm, lambda t=t: _quant_fn(w, t, "dequant"))
                  for nm, t in (("q4_0", GGMLType.Q4_0),
                                ("q4_1", GGMLType.Q4_1),
                                ("q5_0", GGMLType.Q5_0),
                                ("q5_1", GGMLType.Q5_1),
                                ("q8_0", GGMLType.Q8_0))]
        for name, make in cases:
            _, fn = make()
            dt = jnp.bfloat16 if name != "f32" else jnp.float32
            x0 = jnp.asarray(rng.standard_normal((n, n)) * 0.1, dt)
            sec = _time_chain(fn, x0)
            rows.append({"size": n, "type": name,
                         "gflops": flops / sec / 1e9})
    return rows


def _quant_fn(w, ttype, mode):
    from qwen2_audio_tpu.ops.quant_matmul import quant_linear
    from qwen2_audio_tpu.ops.quant_matmul_int8 import quant_linear_int8
    from qwen2_audio_tpu.quant.qparams import quantize_array_for_device
    qw = quantize_array_for_device(w, ttype)
    lin = quant_linear_int8 if mode == "int8" else quant_linear

    def fn(x):
        return lin(x, qw).astype(x.dtype)
    return qw, fn


def mul_mat_bench_str(sizes=(512, 1024, 2048)) -> str:
    lines = []
    for r in mul_mat_bench(sizes):
        lines.append(f"  {r['size']:4d} x {r['size']:4d}: {r['type']:>5s} "
                     f"{r['gflops']:10.1f} GFLOPS")
    return "\n".join(lines) + "\n"
