"""f16 scale storage (qparams._scale16_enabled).

For formats whose device scale IS the block's raw f16 ``d`` payload
(q4_0/q8_0/q5_0/q4_1/q5_1), storing scales as float16 is LOSSLESS
(f16 -> f32 conversion is exact), halves the scale HBM stream, and every
kernel must produce bit-identical results. Formats with computed scales
(q4_K/q5_K super*sub products, per-16 k-quants) must keep f32.
≙ ggml storing d as f16 inside the blocks (ggml-common.h block_q8_0).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from qwen2_audio_tpu.config import GGMLType
from qwen2_audio_tpu.ops.quant_matmul import (
    dequantize_weight, panelize_weight, quant_linear, quant_linear_panel)
from qwen2_audio_tpu.quant.qparams import quantize_array_for_device


F16_EXACT = [GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q5_0, GGMLType.Q4_1,
             GGMLType.Q5_1]
F32_ONLY = [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q2_K, GGMLType.Q3_K,
            GGMLType.Q6_K]


def _pair(w, ttype, monkeypatch):
    monkeypatch.setenv("QA_SCALE16", "1")
    q16 = quantize_array_for_device(w, ttype)
    monkeypatch.setenv("QA_SCALE16", "0")
    q32 = quantize_array_for_device(w, ttype)
    return q16, q32


@pytest.mark.parametrize("ttype", F16_EXACT)
def test_scale16_bit_exact_dequant(ttype, monkeypatch, rng):
    K, N = 512, 128
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    q16, q32 = _pair(w, ttype, monkeypatch)
    assert q16["scales"].dtype == jnp.float16
    assert q32["scales"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(dequantize_weight(q16)),
                                  np.asarray(dequantize_weight(q32)))


@pytest.mark.parametrize("ttype", F32_ONLY)
def test_scale16_skips_computed_scales(ttype, monkeypatch, rng):
    K, N = 512, 64
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    monkeypatch.setenv("QA_SCALE16", "1")
    q = quantize_array_for_device(w, ttype)
    assert q["scales"].dtype == jnp.float32, ttype


@pytest.mark.parametrize("ttype", [GGMLType.Q8_0, GGMLType.Q4_1])
def test_scale16_kernel_bit_identical(ttype, monkeypatch, rng):
    K, N, M = 512, 256, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    q16, q32 = _pair(w, ttype, monkeypatch)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(quant_linear(x, q16)),
                                  np.asarray(quant_linear(x, q32)))
    if "qs" in q16:   # panel form applies to the unpacked layout
        np.testing.assert_array_equal(
            np.asarray(quant_linear_panel(x, panelize_weight(q16))),
            np.asarray(quant_linear_panel(x, panelize_weight(q32))))


def test_scale16_int8_kernel_bit_identical(monkeypatch, rng):
    from qwen2_audio_tpu.ops.quant_matmul_int8 import quant_matmul_int8
    K, N, M = 512, 256, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    monkeypatch.setenv("QA_PACK4", "0")
    q16, q32 = _pair(w, GGMLType.Q8_0, monkeypatch)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    a = np.asarray(quant_matmul_int8(x, q16["qs"].astype(jnp.int8),
                                     q16["scales"]))
    b = np.asarray(quant_matmul_int8(x, q32["qs"].astype(jnp.int8),
                                     q32["scales"]))
    np.testing.assert_array_equal(a, b)


def test_scale16_decoder_logits_identical(monkeypatch, rng):
    from qwen2_audio_tpu.config import Qwen2DecoderConfig
    from qwen2_audio_tpu.models.qwen2_decoder import (
        create_cache, decoder_forward, embed_tokens, random_decoder_params)
    from qwen2_audio_tpu.quant.qparams import quantize_decoder_params
    cfg = Qwen2DecoderConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=False)
    params = random_decoder_params(rng, cfg)
    toks = jnp.asarray(rng.integers(0, 128, (1, 6)))
    x = embed_tokens(params, toks)

    outs = {}
    for env in ("0", "1"):
        monkeypatch.setenv("QA_SCALE16", env)
        qp = quantize_decoder_params(params, GGMLType.Q8_0)
        cache = create_cache(cfg, 1, 8, dtype=jnp.float32)
        lg, _ = decoder_forward(qp, cfg, x, cache, 0, block_only=True)
        outs[env] = np.asarray(lg)
        decoder_forward.clear_cache()
    np.testing.assert_array_equal(outs["1"], outs["0"])
