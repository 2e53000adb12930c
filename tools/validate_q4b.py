#!/usr/bin/env python
"""On-chip validation for the word-packed (b32) q4_0 kernels, standalone
so it can chain after tools/validate_tpu_kernels.py in a fresh-host
queue (CLAUDE.md playbook step 1):

  - qmm_q4b:         quant_matmul_q4b_stacked standalone — packed-domain
    SWAR unpack + tpu.bitcast + s8 MXU dots at decode-like and wide-N
    shapes, u16-scale flavor included. EXACT vs the validated
    quant_matmul_int8_stacked on identical bytes.
  - qmm_q4b_decoder: the composed surface — a 4-layer b32-quantized
    decoder forward (linear_at routing, fused qkv/gate_up schema, the
    L=1 lm_head entry) vs the same decoder in the standard packed form
    running mode=int8 stacked kernels; f32 activations so the
    weight-form-equivalence contract is tight (the BENCH_NOTES r3i
    lesson: bf16 compounding once flaked this class of stage at 2%).

Run in the BACKGROUND and never kill it (CLAUDE.md tunnel-wedge hazard).
Probe basis: tools/probe_b32.py proved pltpu.bitcast i32->i8 (consec_le),
the SWAR -8, and the s8 dot on this Mosaic build.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def mark(name: str) -> None:
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        print(f"[validate] {name}: OK (cpu smoke — marker NOT written)",
              flush=True)
        return
    Path(f"/tmp/qa_kernel_ok_{name}").write_text(str(time.time()))
    print(f"[validate] {name}: OK", flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from qwen2_audio_tpu.ops.quant_matmul_int8 import \
        quant_matmul_int8_stacked
    from qwen2_audio_tpu.ops.quant_matmul_q4b import (
        pack_b32, quant_linear_q4b, quant_matmul_q4b_stacked)

    print(f"[validate] backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(11)

    # 1. standalone kernel, decode-like shapes, f32 + u16 scales.
    for (L, M, K, N), sdt in [((2, 8, 512, 1024), np.float32),
                              ((2, 8, 512, 1024), np.uint16),
                              ((1, 8, 1024, 3584), np.float32)]:
        qs4 = rng.integers(0, 256, size=(L, K // 2, N), dtype=np.uint8)
        if sdt == np.uint16:
            sc = (0.01 + rng.random((L, K // 32, N), np.float32) * 0.05
                  ).astype(np.float16).view(np.uint16)
        else:
            sc = (0.01 + rng.random((L, K // 32, N), np.float32) * 0.05
                  ).astype(np.float32)
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32) * 0.1
        want = np.asarray(quant_matmul_int8_stacked(
            x, jnp.asarray(qs4), jnp.asarray(sc), jnp.int32(L - 1), off=8))
        got = np.asarray(quant_matmul_q4b_stacked(
            x, jnp.asarray(pack_b32(qs4)), jnp.asarray(sc),
            jnp.int32(L - 1)))
        assert np.array_equal(got, want), \
            f"q4b mismatch at {(L, M, K, N, sdt)}: " \
            f"{np.abs(got - want).max()}"
        print(f"[validate] q4b standalone {(L, M, K, N)} "
              f"{np.dtype(sdt).name} EXACT", flush=True)

    # single-weight (lm_head) entry: L=1 reshape path
    qs4 = rng.integers(0, 256, size=(1, 256, 2048), dtype=np.uint8)
    sc = (0.01 + rng.random((1, 16, 2048), np.float32) * 0.05
          ).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((8, 512)), jnp.float32) * 0.1
    want = np.asarray(quant_matmul_int8_stacked(
        x, jnp.asarray(qs4), jnp.asarray(sc), jnp.int32(0), off=8))
    got = np.asarray(quant_linear_q4b(
        x, {"qs4b": jnp.asarray(pack_b32(qs4[0])),
            "scales": jnp.asarray(sc[0])}))
    assert np.array_equal(got, want), np.abs(got - want).max()
    print("[validate] q4b lm_head entry EXACT", flush=True)
    mark("qmm_q4b")

    # 2. composed: 4-layer decoder forward, b32 form vs standard packed
    # form through the int8 stacked kernels (identical integer math).
    from qwen2_audio_tpu.config import GGMLType, Qwen2DecoderConfig
    from qwen2_audio_tpu.models.qwen2_decoder import (
        KVCache, decoder_forward, fuse_decoder_params,
        random_decoder_params)
    from qwen2_audio_tpu.ops.linear import set_group_matmul_mode
    from qwen2_audio_tpu.quant.qparams import (Q4Form,
                                               quantize_decoder_params)

    cfg = Qwen2DecoderConfig(
        vocab_size=2048, hidden_size=512, intermediate_size=1024,
        num_hidden_layers=4, num_attention_heads=8, num_key_value_heads=2,
        head_dim=64, tie_word_embeddings=False)
    p = random_decoder_params(rng, cfg, dtype=jnp.float32)
    q_std = fuse_decoder_params(
        quantize_decoder_params(p, GGMLType.Q4_0, form=Q4Form()))
    q_b32 = fuse_decoder_params(
        quantize_decoder_params(p, GGMLType.Q4_0, form=Q4Form(b32=True)))
    assert "qs4b" in q_b32["layers"]["qkv"], sorted(q_b32["layers"]["qkv"])

    x = jnp.asarray(rng.standard_normal((1, 7, 512)), jnp.float32) * 0.1
    try:
        set_group_matmul_mode("int8")     # std form -> int8 stacked path
        cache = KVCache.create(cfg, batch=1, max_ctx=8, dtype=jnp.float32)
        want, _ = decoder_forward(q_std, cfg, x, cache, 0, block_only=True)
        want = np.asarray(want)
    finally:
        set_group_matmul_mode(None)
    cache = KVCache.create(cfg, batch=1, max_ctx=8, dtype=jnp.float32)
    got, _ = decoder_forward(q_b32, cfg, x, cache, 0, block_only=True)
    got = np.asarray(got)
    # layer kernels are integer-identical; the lm_head is NOT a pure
    # form-equivalence here (std/int8 routes the single weight through
    # the f32-exact dequant kernel, b32 through the s8 dot with q8_1
    # activation requant), so the bound is the activation-requant class
    # (CPU measures 4.8e-3), not the r3i 5e-3 identical-math contract
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert err < 2e-2, err
    print(f"[validate] q4b 4-layer decoder forward rel-err {err:.2e}",
          flush=True)
    mark("qmm_q4b_decoder")
    return 0


if __name__ == "__main__":
    sys.exit(main())
