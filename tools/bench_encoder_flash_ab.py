#!/usr/bin/env python
"""Decisive e2e A/B over the production encoder configs: {stem conv|matmul}
x {einsum|flash attention}, measured with bench.py's EXACT methodology
(data-dependent sum*0 carry, best-of-3, Python-dispatched chain).

Settles two round-3 questions with one run:
  1. flash vs einsum attention e2e (the ablation tool measured einsum 4.4x
     faster WITH the lax.conv stem — contradicting round-2's microbench
     story — but flash won once the stem became im2col matmuls);
  2. whether the im2col stem (now the production default) reproduces the
     ablation's layout win inside the production encoder_forward.

    python -u tools/bench_encoder_flash_ab.py [--batch 1] [--chain 16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

RTT_S = 0.030


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--quant", default="none",
                    choices=["none", "q8_0", "q4_0", "w8a8"],
                    help="encoder weight quantization (the reference runs "
                         "its encoder quantized too; w8a8 rides the native "
                         "int8 MXU at 2x bf16 peak — the compute-bound "
                         "encoder's throughput lever)")
    ap.add_argument("--only", default="",
                    help="run one config, e.g. 'matmul,1' (stem,use_flash) "
                         "— skips the 2x2 sweep's extra compiles")
    ap.add_argument("--gelu", default="exact", choices=["exact", "tanh"],
                    help="gelu flavor: 'exact' erf (HF parity, the repo "
                         "default) or 'tanh' (the approximation the "
                         "reference's ggml_vec_gelu_f32 LUT implements)")
    args = ap.parse_args()
    CHAIN = args.chain

    import jax
    import jax.numpy as jnp
    try:
        from qwen2_audio_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    from qwen2_audio_tpu.config import WHISPER_PRESETS
    from qwen2_audio_tpu.models.encoder import (encoder_forward,
                                                fuse_encoder_qkv,
                                                random_encoder_params)
    from qwen2_audio_tpu.utils.watchdog import watchdog

    hp = WHISPER_PRESETS["qwen2-audio"]
    rng = np.random.default_rng(0)
    B = args.batch
    params = random_encoder_params(rng, hp, dtype=jnp.bfloat16)
    if args.quant != "none":
        from qwen2_audio_tpu.config import GGMLType
        from qwen2_audio_tpu.quant.qparams import quantize_encoder_params
        if args.quant == "w8a8":
            params = quantize_encoder_params(params, GGMLType.Q8_0,
                                             mode="fast")
        else:
            params = quantize_encoder_params(params, GGMLType[args.quant.upper()])
    params = fuse_encoder_qkv(params)
    x = jnp.asarray(rng.standard_normal((B, hp.n_mels, 2 * hp.n_audio_ctx)),
                    jnp.bfloat16)

    import functools

    @functools.partial(jax.jit, static_argnames=("use_flash", "stem"))
    def step(params, carry, use_flash, stem):
        out = encoder_forward(params, carry, hp, use_flash=use_flash,
                              compute_dtype=jnp.bfloat16, stem=stem,
                              gelu_approximate=args.gelu == "tanh")
        return carry + (jnp.sum(out) * 0).astype(carry.dtype)

    results = {}
    configs = [(s, f) for s in ("matmul", "conv") for f in (False, True)]
    if args.only:
        stem_w, flash_w = args.only.split(",")
        configs = [(stem_w, flash_w in ("1", "true"))]
    for stem, flash in configs:
        tag = f"stem={stem:6s} flash={int(flash)}"
        cancel = watchdog(1800.0, f"enc_ab:{tag}")
        try:
            t0 = time.perf_counter()
            _ = np.asarray(step(params, x, flash, stem))
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                carry = x
                for _i in range(CHAIN):
                    carry = step(params, carry, flash, stem)
                _ = np.asarray(jnp.sum(carry))
                best = min(best,
                           max(time.perf_counter() - t0 - RTT_S, 1e-9)
                           / CHAIN)
            results[(stem, flash)] = best
            print(f"{tag}: {best*1e3:8.2f} ms/call  "
                  f"RTF {30.0*B/best:7.1f}x  (compile+warm "
                  f"{compile_s:.1f}s)", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            cancel()
    if results:
        (stem, flash), best = min(results.items(), key=lambda kv: kv[1])
        print(f"WINNER stem={stem} use_flash={flash} "
              f"{best*1e3:.2f} ms RTF {30.0*B/best:.1f}x", flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
