"""uint16-bit-pattern scale storage (qparams._scale_u16_enabled).

Same lossless half-width scale stream as the f16 path (test_scale16.py),
but stored as the raw f16 bits and expanded to f32 INSIDE the kernels with
integer ops (ops/quant_matmul.py::scales_f32) — the workaround for the
Mosaic build that rejects f16 kernel operands ("Unsupported type in mosaic
dialect: 'f16'"). Every result must be bit-identical to f32-scale storage.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from qwen2_audio_tpu.config import GGMLType
from qwen2_audio_tpu.ops.quant_matmul import (
    dequantize_weight, panelize_weight, quant_linear, quant_linear_panel,
    scales_f32)
from qwen2_audio_tpu.quant.qparams import quantize_array_for_device

F16_EXACT = [GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q5_0, GGMLType.Q4_1,
             GGMLType.Q5_1]


def _pair(w, ttype, monkeypatch):
    monkeypatch.setenv("QA_SCALE16", "0")
    monkeypatch.setenv("QA_SCALE_U16", "1")
    qu = quantize_array_for_device(w, ttype)
    monkeypatch.setenv("QA_SCALE_U16", "0")
    q32 = quantize_array_for_device(w, ttype)
    return qu, q32


def test_scales_f32_expands_every_f16_bit_pattern():
    """scales_f32(u16 bits) must equal numpy's f16->f32 for all finite
    values: normals, subnormals, +-0, f16 max/min-normal/min-subnormal."""
    edge = np.array([0x0000, 0x8000,        # +-0
                     0x0001, 0x8001,        # +-min subnormal (2^-24)
                     0x03FF, 0x83FF,        # +-max subnormal
                     0x0400, 0x8400,        # +-min normal (2^-14)
                     0x7BFF, 0xFBFF,        # +-max finite (65504)
                     0x3C00, 0xBC00],       # +-1.0
                    dtype=np.uint16)
    rng = np.random.default_rng(0)
    rand = rng.integers(0, 1 << 16, 4096, dtype=np.uint16)
    finite = rand[np.isfinite(rand.view(np.float16))]
    bits = np.concatenate([edge, finite])
    bits = bits[:bits.size // 8 * 8].reshape(-1, 8)
    want = bits.view(np.float16).astype(np.float32)
    got = np.asarray(scales_f32(jnp.asarray(bits)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ttype", F16_EXACT)
def test_scale_u16_bit_exact_dequant(ttype, monkeypatch, rng):
    K, N = 512, 128
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    qu, q32 = _pair(w, ttype, monkeypatch)
    assert qu["scales"].dtype == jnp.uint16
    assert q32["scales"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(dequantize_weight(qu)),
                                  np.asarray(dequantize_weight(q32)))


@pytest.mark.parametrize("ttype", [GGMLType.Q8_0, GGMLType.Q4_0,
                                   GGMLType.Q4_1])
def test_scale_u16_kernel_bit_identical(ttype, monkeypatch, rng):
    K, N, M = 512, 256, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    qu, q32 = _pair(w, ttype, monkeypatch)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(quant_linear(x, qu)),
                                  np.asarray(quant_linear(x, q32)))
    if "qs" in qu:    # panel form applies to the unpacked layout
        np.testing.assert_array_equal(
            np.asarray(quant_linear_panel(x, panelize_weight(qu))),
            np.asarray(quant_linear_panel(x, panelize_weight(q32))))


def test_scale_u16_int8_kernel_bit_identical(monkeypatch, rng):
    from qwen2_audio_tpu.ops.quant_matmul_int8 import quant_matmul_int8
    K, N, M = 512, 256, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    monkeypatch.setenv("QA_PACK4", "0")
    qu, q32 = _pair(w, GGMLType.Q8_0, monkeypatch)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    a = np.asarray(quant_matmul_int8(x, qu["qs"].astype(jnp.int8),
                                     qu["scales"]))
    b = np.asarray(quant_matmul_int8(x, q32["qs"].astype(jnp.int8),
                                     q32["scales"]))
    np.testing.assert_array_equal(a, b)


def test_scale_u16_decoder_logits_identical(monkeypatch, rng):
    """Full decode forward (stacked kernels + fused MLP dispatch) must be
    bit-identical between u16 and f32 scale storage."""
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

    monkeypatch.setenv("QA_SCALE16", "0")
    outs = {}
    for env in ("0", "1"):
        monkeypatch.setenv("QA_SCALE_U16", env)
        qp = quantize_decoder_params(params, GGMLType.Q8_0)
        cache = create_cache(cfg, 1, 8, dtype=jnp.float32)
        lg, _ = decoder_forward(qp, cfg, x, cache, 0, block_only=True)
        outs[env] = np.asarray(lg)
        decoder_forward.clear_cache()
    np.testing.assert_array_equal(outs["1"], outs["0"])


def test_packed4_scale_default_is_f32(monkeypatch):
    """Packed-nibble weights default to f32 scales even where u16 is
    hardware-validated: the u16 form measured an e2e LOSS on the q4
    kernels (7B q4_0 decode 96.6 tok/s u16 vs 101.9 f32, r4 A/B). The
    env override must still win both ways, and the strided (q8-byte)
    form keeps its own default."""
    from qwen2_audio_tpu.quant.qparams import (_scale_u16_enabled,
                                               _store_scales_np)
    monkeypatch.delenv("QA_SCALE_U16", raising=False)
    assert _scale_u16_enabled(packed4=True) is False
    monkeypatch.setenv("QA_SCALE_U16", "1")
    assert _scale_u16_enabled(packed4=True) is True
    monkeypatch.setenv("QA_SCALE_U16", "0")
    assert _scale_u16_enabled(packed4=True) is False

    # storage follows: packed4 + no override -> f32 even with QA_SCALE16
    # off (the f16 CPU default is checked first and stays the CPU form)
    monkeypatch.delenv("QA_SCALE_U16", raising=False)
    monkeypatch.setenv("QA_SCALE16", "0")
    s = np.array([[0.5, 0.25]], dtype=np.float32)
    assert _store_scales_np(s, f16_exact=True, packed4=True).dtype == \
        np.float32
    assert _store_scales_np(s, f16_exact=True, packed4=False).dtype == \
        np.float32   # CPU backend: u16 stays opt-in there too
    monkeypatch.setenv("QA_SCALE_U16", "1")
    assert _store_scales_np(s, f16_exact=True, packed4=True).dtype == \
        np.uint16
