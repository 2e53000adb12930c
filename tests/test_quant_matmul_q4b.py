"""Word-packed (b32) symmetric q4_0 kernel parity (ops/quant_matmul_q4b).

Contract: quant_matmul_q4b_stacked computes EXACTLY the same value as
quant_matmul_int8_stacked on the same packed-nibble payload (both are
integer-exact weight dots with q8_1-style activation quantization; the
b32 form only changes how the bytes are declared to the VPU), and tracks
the f32 dequant reference within activation-requant tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qwen2_audio_tpu.ops.quant_matmul import dequantize_weight4
from qwen2_audio_tpu.ops.quant_matmul_int8 import quant_matmul_int8_stacked
from qwen2_audio_tpu.ops.quant_matmul_q4b import (
    dequantize_weight_q4b,
    pack_b32,
    quant_linear_q4b,
    quant_linear_q4b_stacked,
    quant_matmul_q4b_stacked,
    unpack_b32_np,
)


def _payload(rng, L, K, N, scale_dtype=np.float32):
    qs4 = rng.integers(0, 256, size=(L, K // 2, N), dtype=np.uint8)
    sc = (0.01 + rng.random((L, K // 32, N), np.float32) * 0.05
          ).astype(scale_dtype)
    return qs4, sc


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    qs4 = rng.integers(0, 256, size=(3, 64, 256), dtype=np.uint8)
    w = pack_b32(qs4)
    assert w.shape == (3, 16, 256) and w.dtype == np.int32
    np.testing.assert_array_equal(unpack_b32_np(w), qs4)


def test_q4b_matches_int8_stacked_exactly():
    rng = np.random.default_rng(1)
    L, M, K, N = 3, 8, 256, 384
    qs4, sc = _payload(rng, L, K, N)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    ref = quant_matmul_int8_stacked(
        x, jnp.asarray(qs4), jnp.asarray(sc), jnp.int32(1), off=8)
    got = quant_matmul_q4b_stacked(
        x, jnp.asarray(pack_b32(qs4)), jnp.asarray(sc), jnp.int32(1))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_q4b_tracks_f32_dequant():
    rng = np.random.default_rng(2)
    L, M, K, N = 2, 4, 128, 256
    qs4, sc = _payload(rng, L, K, N)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    qw = {"qs4": jnp.asarray(qs4[0]), "scales": jnp.asarray(sc[0])}
    wf = dequantize_weight4(qw)                       # sym (no mins leaf)
    ref = np.asarray(x @ wf)
    got = np.asarray(quant_matmul_q4b_stacked(
        x, jnp.asarray(pack_b32(qs4)), jnp.asarray(sc), jnp.int32(0)))
    # activations see q8_1-equivalent rounding (ggml-mmq parity class)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.02, err


def test_q4b_u16_scales():
    rng = np.random.default_rng(3)
    L, M, K, N = 2, 8, 128, 256
    qs4, _ = _payload(rng, L, K, N)
    sc16 = (0.01 + rng.random((L, K // 32, N), np.float32) * 0.05
            ).astype(np.float16)
    sc_u16 = sc16.view(np.uint16)
    ref = quant_matmul_int8_stacked(
        jnp.ones((M, K), jnp.float32), jnp.asarray(qs4),
        jnp.asarray(sc_u16), jnp.int32(0), off=8)
    got = quant_matmul_q4b_stacked(
        jnp.ones((M, K), jnp.float32), jnp.asarray(pack_b32(qs4)),
        jnp.asarray(sc_u16), jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_q4b_linear_entries_and_lead_dims():
    rng = np.random.default_rng(4)
    L, K, N = 2, 128, 256
    qs4, sc = _payload(rng, L, K, N)
    qw_all = {"qs4b": jnp.asarray(pack_b32(qs4)), "scales": jnp.asarray(sc)}
    x = jnp.asarray(rng.standard_normal((2, 3, K)), jnp.float32)
    y = quant_linear_q4b_stacked(x, qw_all, jnp.int32(1))
    assert y.shape == (2, 3, N)
    y1 = quant_linear_q4b(
        x, {"qs4b": qw_all["qs4b"][1], "scales": qw_all["scales"][1]})
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y1))


def test_q4b_dequant_oracle_matches_packed_form():
    rng = np.random.default_rng(5)
    qs4, sc = _payload(rng, 1, 128, 256)
    qw4 = {"qs4": jnp.asarray(qs4[0]), "scales": jnp.asarray(sc[0])}
    qwb = {"qs4b": jnp.asarray(pack_b32(qs4[0])),
           "scales": jnp.asarray(sc[0])}
    np.testing.assert_array_equal(
        np.asarray(dequantize_weight4(qw4)),
        np.asarray(dequantize_weight_q4b(qwb)))


@pytest.mark.parametrize("K,N", [(96, 128), (512, 128)])
def test_q4b_odd_blocking(K, N):
    """K not a multiple of the preferred block (96 -> block_k=96) and a
    deep-K shape exercise the pick() fallbacks."""
    rng = np.random.default_rng(6)
    qs4, sc = _payload(rng, 1, K, N)
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.float32)
    ref = quant_matmul_int8_stacked(
        x, jnp.asarray(qs4), jnp.asarray(sc), jnp.int32(0), off=8)
    got = quant_matmul_q4b_stacked(
        x, jnp.asarray(pack_b32(qs4)), jnp.asarray(sc), jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_q4b_decoder_forward_parity():
    """Full decoder forward with the b32 form vs the standard packed
    form: linear_at/linear route qs4b leaves through the s8-dot kernels
    and the logits track the dequant path within the activation-requant
    tolerance (the ggml-mmq parity class)."""
    from qwen2_audio_tpu.config import GGMLType, Qwen2DecoderConfig
    from qwen2_audio_tpu.models.qwen2_decoder import (
        KVCache, decoder_forward, random_decoder_params)
    from qwen2_audio_tpu.quant.qparams import (Q4Form, payload_form,
                                               quantize_decoder_params)

    cfg = Qwen2DecoderConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=False)
    rng = np.random.default_rng(7)
    p = random_decoder_params(rng, cfg, dtype=jnp.float32)
    q_std = quantize_decoder_params(p, GGMLType.Q4_0, form=Q4Form())
    q_b32 = quantize_decoder_params(p, GGMLType.Q4_0,
                                    form=Q4Form(b32=True))
    e = q_b32["layers"]["q"]
    assert "qs4b" in e and "qs4" not in e and "mins" not in e, sorted(e)
    assert np.dtype(e["qs4b"].dtype) == np.int32
    assert payload_form(e) == "packed4-b32+sym+f32sc"
    assert "qs4b" in q_b32["lm_head"]

    x = jnp.asarray(rng.standard_normal((1, 5, 64)), jnp.float32)
    cache = KVCache.create(cfg, batch=1, max_ctx=8, dtype=jnp.float32)
    ref, _ = decoder_forward(q_std, cfg, x, cache, 0, block_only=True)
    cache2 = KVCache.create(cfg, batch=1, max_ctx=8, dtype=jnp.float32)
    got, _ = decoder_forward(q_b32, cfg, x, cache2, 0, block_only=True)
    ref, got = np.asarray(ref), np.asarray(got)
    err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.03, err
