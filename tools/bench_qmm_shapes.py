#!/usr/bin/env python
"""Per-shape quant-matmul microbench at decode M — decomposes where the 7B
q8_0 forward spends its time and A/Bs the strided (K,N) kernel against the
panelized contiguous-DMA layout (ops/quant_matmul.py::quant_matmul_panel).

Shapes are the fused Qwen2 decode matmuls (qkv / o / gate_up / down /
lm_head). Timing: dependent dispatch chains + final readback minus tunnel
RTT (CLAUDE.md methodology). Run in the BACKGROUND on TPU; never kill it.

    python -u tools/bench_qmm_shapes.py [--size 7b|1.5b] [--m 8] [--chain 64]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

SHAPES = {
    # name -> (K, N) of the fused decode matmuls
    "7b": {
        "qkv": (3584, 4608),
        "o": (3584, 3584),
        "gate_up": (3584, 37888),
        "down": (18944, 3584),
        "lm_head": (3584, 152064),
    },
    "1.5b": {
        "qkv": (1536, 2048),
        "o": (1536, 1536),
        "gate_up": (1536, 17920),
        "down": (8960, 1536),
        "lm_head": (1536, 151936),
    },
}
LAYERS = {"7b": 28, "1.5b": 28}


def time_chain(step, x0, chain, rtt_s=0.030):
    import jax
    _ = np.asarray(step(x0))          # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        c = x0
        for _i in range(chain):
            c = step(c)
        _ = np.asarray(jax.numpy.sum(c[:1, :1]))
        best = min(best, max(time.perf_counter() - t0 - rtt_s, 1e-9) / chain)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="7b", choices=SHAPES)
    ap.add_argument("--m", type=int, default=8,
                    help="activation rows (8 = spec_k=7 decode forward)")
    ap.add_argument("--chain", type=int, default=64)
    ap.add_argument("--skip-current", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/qa_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from qwen2_audio_tpu.utils.watchdog import watchdog
    watchdog(float(1800), "bench_qmm_shapes")

    from qwen2_audio_tpu.ops.quant_matmul import (
        panelize_weight, pick_panel_width, quant_matmul, quant_matmul_panel)

    rng = np.random.default_rng(0)
    M = args.m
    print(f"backend={jax.default_backend()} M={M} chain={args.chain}",
          flush=True)

    total = {}
    for name, (K, N) in SHAPES[args.size].items():
        # synthetic q8_0-form weights (values irrelevant to bandwidth)
        qs = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))
        sc = jnp.asarray(rng.standard_normal((K // 32, N)).astype(np.float32)
                         * 0.01)
        x0 = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
        gb = (qs.size + sc.size * 4) / 1e9

        variants = []
        if not args.skip_current:
            def cur(x, qs=qs, sc=sc, K=K):
                y = quant_matmul(x, qs, sc, fast=True)
                return (x + y[:, :K] if y.shape[1] >= K
                        else x + jnp.tile(y, (1, -(-K // y.shape[1])))[:, :K])
            variants.append(("current", cur))

        for bn in sorted({pick_panel_width(N), pick_panel_width(N, 1024)}):
            qp = panelize_weight({"qs": qs, "scales": sc}, block_n=bn)
            jax.block_until_ready(qp["qs_p"])
            for bk_tag, bk in (("auto", 0), ("K", K)):
                def pan(x, qp=qp, bk=bk, K=K):
                    y = quant_matmul_panel(x, qp["qs_p"], qp["scales_p"],
                                           fast=True, block_k=bk)
                    return (x + y[:, :K] if y.shape[1] >= K
                            else x + jnp.tile(y, (1, -(-K // y.shape[1]))
                                              )[:, :K])
                variants.append((f"panel bn={bn} bk={bk_tag}", pan))

        for tag, fn in variants:
            try:
                sec = time_chain(fn, x0, args.chain)
            except Exception as e:
                print(f"  {name:8s} {tag:24s} FAILED: {type(e).__name__}: "
                      f"{e}", flush=True)
                continue
            print(f"  {name:8s} {tag:24s} {sec*1e6:9.1f} us  "
                  f"{gb/sec:7.1f} GB/s", flush=True)
            total.setdefault(tag, {})[name] = sec

    L = LAYERS[args.size]
    for tag, times in total.items():
        if len(times) == len(SHAPES[args.size]):
            per_fwd = (sum(times[n] for n in
                           ("qkv", "o", "gate_up", "down")) * L
                       + times["lm_head"])
            print(f"TOTAL {tag:24s}: matmul-only forward "
                  f"{per_fwd*1e3:7.2f} ms -> ceiling "
                  f"{1.0/per_fwd:6.1f} fwd/s", flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
