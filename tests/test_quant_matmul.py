"""Quantized matmul kernel + quantized model paths."""

import numpy as np
import pytest
import jax.numpy as jnp

from qwen2_audio_tpu.config import GGMLType, Qwen2DecoderConfig, WhisperHParams
from qwen2_audio_tpu.ops.quant_matmul import dequantize_weight, quant_linear, quant_matmul
from qwen2_audio_tpu.quant.qparams import (
    device_weight_from_ggml_tensor,
    quantize_array_for_device,
    quantize_decoder_params,
    quantize_encoder_params,
)


ALL_LEGACY = [GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0,
              GGMLType.Q5_1]


@pytest.mark.parametrize("ttype", ALL_LEGACY)
def test_kernel_matches_dequant_reference(ttype, rng):
    K, N, M = 256, 256, 64
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    qw = quantize_array_for_device(w, ttype)
    x = rng.standard_normal((M, K)).astype(np.float32)

    got = np.asarray(quant_linear(jnp.asarray(x), qw))
    want = x @ np.asarray(dequantize_weight(qw))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


@pytest.mark.parametrize("ttype,tol", [(GGMLType.Q8_0, 0.02),
                                       (GGMLType.Q4_0, 0.2),
                                       (GGMLType.Q4_1, 0.2),
                                       (GGMLType.Q5_0, 0.1),
                                       (GGMLType.Q5_1, 0.1)])
def test_device_weight_matches_codec_dequant(ttype, tol, rng):
    """Device layout values must bit-match the ggml codec dequantization."""
    from qwen2_audio_tpu.quant import codecs
    from qwen2_audio_tpu.io.ggml_format import GGMLTensor
    N, K = 48, 64   # torch [out, in]
    w = rng.standard_normal((N, K)).astype(np.float32)
    raw = codecs.quantize(w, ttype)
    t = GGMLTensor("w", (N, K), ttype, raw)
    qw = device_weight_from_ggml_tensor(t)

    want = codecs.dequantize(raw, ttype, w.size).reshape(N, K).T  # (K, N)
    got = np.asarray(dequantize_weight(qw))
    np.testing.assert_array_equal(got, want)   # BIT-exact
    # and the quantization error itself is bounded
    assert np.abs(got - w.T).max() < tol * np.abs(w).max() + 1e-6


def test_quant_linear_batched(rng):
    K, N = 128, 64
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    qw = quantize_array_for_device(w, GGMLType.Q8_0)
    x = rng.standard_normal((2, 5, K)).astype(np.float32)
    got = np.asarray(quant_linear(jnp.asarray(x), qw))
    want = x @ np.asarray(dequantize_weight(qw))
    assert got.shape == (2, 5, N)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_quantized_decoder_logits_close(rng):
    from qwen2_audio_tpu.models.qwen2_decoder import (
        KVCache, decoder_forward, embed_tokens, random_decoder_params)
    cfg = Qwen2DecoderConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=False)
    params = random_decoder_params(rng, cfg)
    qparams = quantize_decoder_params(params, GGMLType.Q8_0)

    toks = jnp.asarray(rng.integers(0, 128, (1, 6)))
    x = embed_tokens(params, toks)

    c1 = KVCache.create(cfg, 1, 8, dtype=jnp.float32)
    ref, _ = decoder_forward(params, cfg, x, c1, 0)
    c2 = KVCache.create(cfg, 1, 8, dtype=jnp.float32)
    got, _ = decoder_forward(qparams, cfg, x, c2, 0)

    # q8_0 keeps logits within a tight envelope of the fp32 model
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    scale = np.abs(np.asarray(ref)).max()
    assert err < 0.05 * scale + 0.05, err


def test_quantized_encoder_runs(rng):
    from qwen2_audio_tpu.models.encoder import encoder_forward, random_encoder_params
    hp = WhisperHParams(n_audio_ctx=256, n_audio_state=64, n_audio_head=4,
                        n_audio_layer=2, n_mels=16)
    params = random_encoder_params(rng, hp)
    qparams = quantize_encoder_params(params, GGMLType.Q8_0)
    mel = rng.standard_normal((1, 16, 512)).astype(np.float32)
    a = np.asarray(encoder_forward(params, jnp.asarray(mel), hp))
    b = np.asarray(encoder_forward(qparams, jnp.asarray(mel), hp))
    assert b.shape == a.shape
    np.testing.assert_allclose(a, b, atol=0.5)  # q8 noise through 2 layers+LN


def test_quantized_greedy_decode_matches_fp32_mostly(rng):
    """q8_0 decode should pick the same greedy tokens as fp32 for a short
    horizon (the logits-parity criterion at the behavioral level)."""
    from qwen2_audio_tpu.models.qwen2_decoder import embed_tokens, random_decoder_params
    from qwen2_audio_tpu.runtime.decoding import DecoderBundle, greedy_decode
    cfg = Qwen2DecoderConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=False)
    params = random_decoder_params(rng, cfg)
    qparams = quantize_decoder_params(params, GGMLType.Q8_0)

    def mk(p):
        return DecoderBundle(cfg=cfg, params=p, proj_w=jnp.eye(64),
                             proj_b=jnp.zeros(64), eos_token_id=127,
                             bos_tokens=[], post_audio_tokens=[],
                             max_ctx=64, cache_dtype=jnp.float32)

    prompt = jnp.asarray(rng.integers(0, 120, (1, 5)))
    prefill = embed_tokens(params, prompt)
    a = greedy_decode(mk(params), prefill, max_new_tokens=6)
    b = greedy_decode(mk(qparams), prefill, max_new_tokens=6)
    # identical first tokens; tolerate divergence afterwards (chaotic argmax)
    assert a.tokens[0][0] == b.tokens[0][0]


def test_w8a8_fast_path_accuracy(rng):
    from qwen2_audio_tpu.ops.linear import linear
    from qwen2_audio_tpu.quant.qparams import fast_w8_from_array
    K, N = 256, 128
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    p = fast_w8_from_array(w)
    assert p["qs8"].dtype == jnp.int8 and p["scale_n"].shape == (N,)
    x = rng.standard_normal((4, K)).astype(np.float32)
    got = np.asarray(linear(jnp.asarray(x), p))
    want = x @ w
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.03, rel    # two int8 quantizations, per-channel scales


def test_w8a8_decoder_mode(rng):
    from qwen2_audio_tpu.config import Qwen2DecoderConfig
    from qwen2_audio_tpu.models.qwen2_decoder import (
        create_cache, decoder_forward, embed_tokens, random_decoder_params)
    from qwen2_audio_tpu.quant.qparams import quantize_decoder_params
    cfg = Qwen2DecoderConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=False)
    params = random_decoder_params(rng, cfg)
    fast = quantize_decoder_params(params, GGMLType.Q8_0, mode="fast")
    assert "qs8" in fast["layers"]["q"] and "w" not in fast["layers"]["q"]

    toks = jnp.asarray(rng.integers(0, 128, (1, 6)))
    x = embed_tokens(params, toks)
    c1 = create_cache(cfg, 1, 8, dtype=jnp.float32)
    ref, _ = decoder_forward(params, cfg, x, c1, 0)
    c2 = create_cache(cfg, 1, 8, dtype=jnp.float32)
    got, _ = decoder_forward(fast, cfg, x, c2, 0)
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    scale = np.abs(np.asarray(ref)).max()
    assert err < 0.12 * scale + 0.12, err


def test_fast_w8_from_ggml_blocks(rng):
    """ggml q8_0 blocks -> w8a8 fast form (the serving path for ggml files)."""
    from qwen2_audio_tpu.ops.linear import linear
    from qwen2_audio_tpu.quant.qparams import (
        fast_w8_from_ggml_blocks, quantize_array_for_device)
    K, N = 128, 64
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    qw = quantize_array_for_device(w, GGMLType.Q8_0)
    fast = fast_w8_from_ggml_blocks(qw)
    x = rng.standard_normal((4, K)).astype(np.float32)
    got = np.asarray(linear(jnp.asarray(x), fast))
    want = x @ w
    assert np.abs(got - want).max() / np.abs(want).max() < 0.04


def test_int8_group_matmul_prototype(rng):
    """Exact-integer q8_0 matmul (ROADMAP item 1): weight contribution is
    EXACT; total error comes only from q8_1-style activation quantization."""
    from qwen2_audio_tpu.ops.quant_matmul_int8 import (
        quant_matmul_int8, quantize_activations)
    K, N, M = 512, 256, 16
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    qw = quantize_array_for_device(w, GGMLType.Q8_0)
    x = rng.standard_normal((M, K)).astype(np.float32)

    got = np.asarray(quant_matmul_int8(jnp.asarray(x), qw["qs"],
                                       qw["scales"]))

    # oracle: quantize activations the same way, exact f64 math
    xq, sx = quantize_activations(jnp.asarray(x))
    xq = np.asarray(xq, np.float64)
    sx = np.asarray(sx, np.float64)
    wq = np.asarray(qw["qs"], np.float64)
    sw = np.asarray(qw["scales"], np.float64)
    want = np.zeros((M, N))
    for g in range(K // 32):
        p = xq[:, g*32:(g+1)*32] @ wq[g*32:(g+1)*32]
        want += p * sx[:, g][:, None] * sw[g][None, :]
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)

    # end-to-end error vs the dense product stays in the q8 envelope
    dense = x @ w
    rel = np.abs(got - dense).max() / np.abs(dense).max()
    assert rel < 0.03, rel


@pytest.mark.parametrize("ttype,tol", [(GGMLType.Q8_0, 0.03),
                                       (GGMLType.Q4_0, 0.2),
                                       (GGMLType.Q4_1, 0.2),
                                       (GGMLType.Q5_0, 0.1),
                                       (GGMLType.Q5_1, 0.1)])
def test_int8_mode_linear_dispatch(ttype, tol, rng):
    """linear() in "int8" group-matmul mode routes {"qs","scales"} weights
    through the exact-integer kernel — for q4_0 too (values -8..7 are int8-
    exact); output stays within the activation-rounding envelope of the
    dequant path."""
    from qwen2_audio_tpu.ops.linear import linear, set_group_matmul_mode
    K, N = 256, 128
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    qw = quantize_array_for_device(w, ttype)
    qw["b"] = jnp.asarray(rng.standard_normal(N).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((3, 4, K)).astype(np.float32))
    try:
        set_group_matmul_mode("dequant")
        ref = np.asarray(linear(x, qw))
        set_group_matmul_mode("int8")
        got = np.asarray(linear(x, qw))
    finally:
        set_group_matmul_mode(None)
    assert got.shape == (3, 4, N)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < tol * scale + 1e-3


@pytest.mark.parametrize("fast_mode", ["int8", "bf16"])
def test_fast_mode_decoder_parity(rng, fast_mode):
    """Quantized decoder logits in each fast mode track the dequant-mode
    logits (the wiring the bench uses for the fast ggml-parity decode)."""
    from qwen2_audio_tpu.models.qwen2_decoder import (
        create_cache, decoder_forward, embed_tokens, random_decoder_params)
    from qwen2_audio_tpu.ops.linear import set_group_matmul_mode
    cfg = Qwen2DecoderConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=False)
    params = random_decoder_params(rng, cfg)
    qparams = quantize_decoder_params(params, GGMLType.Q8_0)
    toks = jnp.asarray(rng.integers(0, 128, (1, 6)))
    x = embed_tokens(params, toks)

    outs = {}
    try:
        for mode in ("dequant", fast_mode):
            set_group_matmul_mode(mode)
            cache = create_cache(cfg, 1, 8, dtype=jnp.float32)
            lg, cache = decoder_forward(qparams, cfg, x, cache, 0,
                                        block_only=True)
            step = embed_tokens(params, jnp.asarray([[7]]))
            lg2, _ = decoder_forward(qparams, cfg, step, cache, 6)
            outs[mode] = np.asarray(lg2)
            decoder_forward.clear_cache()
    finally:
        set_group_matmul_mode(None)
    err = np.abs(outs[fast_mode] - outs["dequant"]).max()
    scale = np.abs(outs["dequant"]).max()
    assert err < 0.05 * scale + 0.05, err


@pytest.mark.parametrize("ttype", [GGMLType.Q4_0, GGMLType.Q4_1,
                                   GGMLType.Q4_K])
def test_pack4_bit_exact_vs_int8_form(ttype, monkeypatch, rng):
    """The packed-nibble device dict dequantizes BIT-IDENTICALLY to the
    int8-per-value form of the same ggml payload (half the HBM bytes,
    same numbers), and the packed kernel matches the dequant reference."""
    K, N, M = 512, 256, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1

    monkeypatch.setenv("QA_Q4_I8", "0")    # u8 storage is the subject here
    monkeypatch.setenv("QA_PACK4", "0")
    qw_i8 = quantize_array_for_device(w, ttype)
    monkeypatch.setenv("QA_PACK4", "1")
    qw_p4 = quantize_array_for_device(w, ttype)
    assert "qs4" in qw_p4 and qw_p4["qs4"].shape == (K // 2, N)
    assert qw_p4["qs4"].dtype == jnp.uint8

    np.testing.assert_array_equal(np.asarray(dequantize_weight(qw_p4)),
                                  np.asarray(dequantize_weight(qw_i8)))

    x = rng.standard_normal((M, K)).astype(np.float32)
    got = np.asarray(quant_linear(jnp.asarray(x), qw_p4))
    want = x @ np.asarray(dequantize_weight(qw_i8))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_pack4_decoder_end_to_end(monkeypatch, rng):
    """q4_0 decoder with packed weights decodes the same tokens as the
    int8-form weights (same payload, same numbers, half the bytes)."""
    from qwen2_audio_tpu.models.qwen2_decoder import create_cache, decoder_forward
    cfg = Qwen2DecoderConfig(vocab_size=128, hidden_size=256,
                             intermediate_size=512, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             head_dim=64, tie_word_embeddings=False)
    from qwen2_audio_tpu.models.qwen2_decoder import random_decoder_params
    params = random_decoder_params(np.random.default_rng(5), cfg)
    x = jnp.asarray(rng.standard_normal((1, 4, cfg.hidden_size)) * 0.3,
                    jnp.float32)

    outs = {}
    for env in ("0", "1"):
        monkeypatch.setenv("QA_PACK4", env)
        qp = quantize_decoder_params(params, GGMLType.Q4_0)
        cache = create_cache(cfg, 1, 16)
        logits, _ = decoder_forward(qp, cfg, x, cache, 0, block_only=True)
        outs[env] = np.asarray(logits)
    np.testing.assert_allclose(outs["1"], outs["0"], atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("ttype", [GGMLType.Q8_0, GGMLType.Q5_1])
def test_panel_layout_matches_strided_kernel(ttype, rng):
    """The contiguous-panel storage (quant_matmul_panel) is a pure layout
    transform: outputs must match the strided (K, N) kernel exactly
    (same dequant math, f32 accumulate) and the dense reference closely."""
    from qwen2_audio_tpu.ops.quant_matmul import (
        panelize_weight, quant_linear, quant_linear_panel)

    K, N, M = 512, 384, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    qw = quantize_array_for_device(w, ttype)
    x = rng.standard_normal((M, K)).astype(np.float32)

    want = np.asarray(quant_linear(jnp.asarray(x), qw))
    qp = panelize_weight(qw, block_n=128)
    got = np.asarray(quant_linear_panel(jnp.asarray(x), qp))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    dense = x @ np.asarray(dequantize_weight(qw))
    np.testing.assert_allclose(got, dense, atol=2e-3, rtol=1e-3)


def test_panelize_weight_roundtrip(rng):
    """Panel layout preserves every payload value (bit-exactness carrier)."""
    from qwen2_audio_tpu.ops.quant_matmul import panelize_weight

    K, N = 256, 512
    w = rng.standard_normal((K, N)).astype(np.float32)
    qw = quantize_array_for_device(w, GGMLType.Q8_0)
    qp = panelize_weight(qw, block_n=128)
    P, K2, bn = qp["qs_p"].shape
    assert (P * bn, K2) == (N, K)
    back = np.asarray(jnp.transpose(qp["qs_p"], (1, 0, 2)).reshape(K, N))
    np.testing.assert_array_equal(back, np.asarray(qw["qs"]))
    sback = np.asarray(jnp.transpose(qp["scales_p"], (1, 0, 2))
                       .reshape(qw["scales"].shape[0], N))
    np.testing.assert_array_equal(sback, np.asarray(qw["scales"]))


@pytest.mark.parametrize("ttype", [GGMLType.Q2_K, GGMLType.Q3_K,
                                   GGMLType.Q6_K])
def test_kquant16_device_weight_bit_exact(ttype, rng):
    """The per-16-group k-quants now have device forms: the {qs, scales
    (K/16, N)[, mins]} dict must dequantize BIT-identically to the ggml
    codec (≙ all-format device residency of ggml-cuda vecdotq.cuh)."""
    from qwen2_audio_tpu.quant import codecs
    from qwen2_audio_tpu.io.ggml_format import GGMLTensor

    N, K = 32, 512   # torch [out, in]; K multiple of 256 (super-blocks)
    w = rng.standard_normal((N, K)).astype(np.float32)
    raw = codecs.quantize(w, ttype)
    t = GGMLTensor("w", (N, K), ttype, raw)
    qw = device_weight_from_ggml_tensor(t)

    assert qw["scales"].shape == (K // 16, N)   # group-16 scale rows
    want = codecs.dequantize(raw, ttype, w.size).reshape(N, K).T
    got = np.asarray(dequantize_weight(qw))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ttype", [GGMLType.Q2_K, GGMLType.Q3_K,
                                   GGMLType.Q6_K])
def test_kquant16_kernel_matches_dequant_reference(ttype, rng):
    """group=16 path through the Pallas kernel (derived from shapes)."""
    K, N, M = 512, 256, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    qw = quantize_array_for_device(w, ttype)
    x = rng.standard_normal((M, K)).astype(np.float32)

    got = np.asarray(quant_linear(jnp.asarray(x), qw))
    want = x @ np.asarray(dequantize_weight(qw))
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_kquant16_panel_matches_strided(rng):
    from qwen2_audio_tpu.ops.quant_matmul import (
        panelize_weight, quant_linear_panel)

    K, N, M = 512, 256, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    qw = quantize_array_for_device(w, GGMLType.Q6_K)
    x = rng.standard_normal((M, K)).astype(np.float32)
    want = np.asarray(quant_linear(jnp.asarray(x), qw))
    got = np.asarray(quant_linear_panel(jnp.asarray(x),
                                        panelize_weight(qw, block_n=128)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_panelized_decoder_logits_match_strided(rng):
    """panelize_decoder_params is a pure layout transform: logits must be
    numerically identical (same kernel math, f32 accumulate) to the
    strided quant decoder, fused or not."""
    from qwen2_audio_tpu.models.qwen2_decoder import (
        KVCache, decoder_forward, embed_tokens, fuse_decoder_params,
        panelize_decoder_params, random_decoder_params)
    cfg = Qwen2DecoderConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=False)
    params = random_decoder_params(rng, cfg)
    qparams = quantize_decoder_params(params, GGMLType.Q8_0)
    pparams = panelize_decoder_params(fuse_decoder_params(qparams))
    fparams = fuse_decoder_params(qparams)

    toks = jnp.asarray(rng.integers(0, 128, (1, 6)))
    x = embed_tokens(params, toks)

    def run(p):
        c = KVCache.create(cfg, 1, 8, dtype=jnp.float32)
        lg, c = decoder_forward(p, cfg, x, c, 0)
        step = embed_tokens(params, jnp.asarray([[7]]))
        lg2, _ = decoder_forward(p, cfg, step, c, 6)
        decoder_forward.clear_cache()
        return np.asarray(lg2)

    ref = run(fparams)
    got = run(pparams)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_panelize_skips_deep_k(rng):
    """K > 8192 entries (7B 'down') stay strided — panel measured a
    regression there; mixed layouts within one layer dict are fine."""
    from qwen2_audio_tpu.models.qwen2_decoder import panelize_decoder_params

    deep = {"qs": np.zeros((2, 9216, 128), np.int8),
            "scales": np.zeros((2, 9216 // 32, 128), np.float32)}
    shallow = {"qs": np.zeros((2, 256, 128), np.int8),
               "scales": np.zeros((2, 8, 128), np.float32)}
    params = {"layers": {"down": dict(deep), "qkv": dict(shallow)}}
    out = panelize_decoder_params(params)
    assert "qs" in out["layers"]["down"]          # untouched
    assert "qs_p" in out["layers"]["qkv"]         # panelized


def test_panelize_deep_k_env_override(monkeypatch):
    """QA_PANEL_DEEP_K=1 panelizes deep-K entries too (e2e A/B hook)."""
    from qwen2_audio_tpu.models.qwen2_decoder import panelize_decoder_params

    deep = {"qs": np.zeros((2, 9216, 128), np.int8),
            "scales": np.zeros((2, 9216 // 32, 128), np.float32)}
    monkeypatch.setenv("QA_PANEL_DEEP_K", "1")
    out = panelize_decoder_params({"layers": {"down": dict(deep)}})
    assert "qs_p" in out["layers"]["down"]


@pytest.mark.parametrize("ttype", [GGMLType.Q4_0, GGMLType.Q4_1])
def test_panel4_layout_matches_packed_kernel(ttype, monkeypatch, rng):
    """Packed-nibble panels ("qs4_p", the q4z-panelf layout that won the
    chain-512 HBM-stream sweep) are a pure layout transform of the packed
    strided form: quant_linear_panel must match quant_linear on the same
    qs4 payload (identical unpack + f32 dequant math) and the dense
    reference closely."""
    from qwen2_audio_tpu.ops.quant_matmul import (
        panelize_weight, quant_linear_panel)

    K, N, M = 512, 384, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    monkeypatch.setenv("QA_PACK4", "1")
    qw = quantize_array_for_device(w, ttype)
    assert "qs4" in qw
    x = rng.standard_normal((M, K)).astype(np.float32)

    want = np.asarray(quant_linear(jnp.asarray(x), qw))
    qp = panelize_weight(qw, block_n=128)
    assert "qs4_p" in qp and qp["qs4_p"].shape == (N // 128, K // 2, 128)
    got = np.asarray(quant_linear_panel(jnp.asarray(x), qp))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    dense = x @ np.asarray(dequantize_weight(qw))
    np.testing.assert_allclose(got, dense, atol=2e-3, rtol=1e-3)


def test_panelize_weight_roundtrip_packed(monkeypatch, rng):
    """qs4_p panel layout preserves every packed byte and scale."""
    from qwen2_audio_tpu.ops.quant_matmul import panelize_weight

    K, N = 256, 512
    w = rng.standard_normal((K, N)).astype(np.float32)
    monkeypatch.setenv("QA_PACK4", "1")
    monkeypatch.setenv("QA_Q4_SYM", "0")   # mins-carrying form under test
    qw = quantize_array_for_device(w, GGMLType.Q4_0)
    qp = panelize_weight(qw, block_n=128)
    P, K2, bn = qp["qs4_p"].shape
    assert (P * bn, K2 * 2) == (N, K)
    back = np.asarray(jnp.transpose(qp["qs4_p"], (1, 0, 2)).reshape(K // 2, N))
    np.testing.assert_array_equal(back, np.asarray(qw["qs4"]))
    np.testing.assert_array_equal(np.asarray(qp["mins"]),
                                  np.asarray(qw["mins"]))


def test_panelized_decoder_logits_match_packed(monkeypatch, rng):
    """panelize_decoder_params on packed-nibble (qs4) stacked leaves is a
    pure layout transform: decode logits must match the strided packed
    decoder exactly (prefill + one cached step, incl. packed lm_head)."""
    from qwen2_audio_tpu.models.qwen2_decoder import (
        KVCache, decoder_forward, embed_tokens, fuse_decoder_params,
        panelize_decoder_params, random_decoder_params)
    cfg = Qwen2DecoderConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=False)
    params = random_decoder_params(rng, cfg)
    monkeypatch.setenv("QA_PACK4", "1")
    qparams = quantize_decoder_params(params, GGMLType.Q4_0)
    fparams = fuse_decoder_params(qparams)
    pparams = panelize_decoder_params(fparams)
    assert any("qs4_p" in v for v in pparams["layers"].values()
               if isinstance(v, dict))
    assert "qs4_p" in pparams["lm_head"]

    toks = jnp.asarray(rng.integers(0, 128, (1, 6)))
    x = embed_tokens(params, toks)

    def run(p):
        c = KVCache.create(cfg, 1, 8, dtype=jnp.float32)
        lg, c = decoder_forward(p, cfg, x, c, 0)
        step = embed_tokens(params, jnp.asarray([[7]]))
        lg2, _ = decoder_forward(p, cfg, step, c, 6)
        decoder_forward.clear_cache()
        return np.asarray(lg2)

    ref = run(fparams)
    got = run(pparams)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_panelize_skips_deep_k_packed():
    """Deep-K skip applies to the LOGICAL K of packed entries (byte rows
    are K/2 — the guard must not be fooled by the halved storage)."""
    from qwen2_audio_tpu.models.qwen2_decoder import panelize_decoder_params

    deep = {"qs4": np.zeros((2, 9216 // 2, 128), np.uint8),
            "scales": np.zeros((2, 9216 // 32, 128), np.float32),
            "mins": np.zeros((2, 9216 // 32, 128), np.float32)}
    shallow = {"qs4": np.zeros((2, 128, 128), np.uint8),
               "scales": np.zeros((2, 8, 128), np.float32),
               "mins": np.zeros((2, 8, 128), np.float32)}
    params = {"layers": {"down": dict(deep), "qkv": dict(shallow)}}
    out = panelize_decoder_params(params)
    assert "qs4" in out["layers"]["down"]         # untouched (K=9216)
    assert "qs4_p" in out["layers"]["qkv"]        # panelized
    assert "mins" in out["layers"]["qkv"]         # min term rides along


def test_q4_sym_dequant_bit_identical(monkeypatch, rng):
    """QA_Q4_SYM=1 emits packed q4_0 with NO mins leaf; dequantization
    ((q-8)*d in-kernel) must be BIT-identical to the mins-carrying form
    — (q-8)*d and q*d + (-8*d) are both exact in f32 for 4-bit q."""
    K, N = 256, 384
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    monkeypatch.setenv("QA_PACK4", "1")
    monkeypatch.setenv("QA_Q4_SYM", "0")
    qw_m = quantize_array_for_device(w, GGMLType.Q4_0)
    monkeypatch.setenv("QA_Q4_SYM", "1")
    qw_s = quantize_array_for_device(w, GGMLType.Q4_0)
    assert "mins" in qw_m and "mins" not in qw_s
    np.testing.assert_array_equal(np.asarray(qw_s["qs4"]),
                                  np.asarray(qw_m["qs4"]))
    np.testing.assert_array_equal(np.asarray(dequantize_weight(qw_s)),
                                  np.asarray(dequantize_weight(qw_m)))


def test_q4_sym_kernels_match_mins_form(monkeypatch, rng):
    """All packed kernel paths (strided, panel, int8-mode stacked) must
    agree between the sym and mins forms of the same q4_0 payload."""
    from qwen2_audio_tpu.ops.quant_matmul import (
        panelize_weight, quant_linear_panel)

    K, N, M = 512, 384, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    monkeypatch.setenv("QA_PACK4", "1")
    monkeypatch.setenv("QA_Q4_SYM", "0")
    qw_m = quantize_array_for_device(w, GGMLType.Q4_0)
    monkeypatch.setenv("QA_Q4_SYM", "1")
    qw_s = quantize_array_for_device(w, GGMLType.Q4_0)

    want = np.asarray(quant_linear(x, qw_m))
    got = np.asarray(quant_linear(x, qw_s))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    got_p = np.asarray(quant_linear_panel(x, panelize_weight(qw_s)))
    np.testing.assert_allclose(got_p, want, atol=1e-5, rtol=1e-5)

    # int8 mode: sym routes the -8 through the QUANTIZED activations
    # (integer-exact — ggml vec_dot_q4_0_q8_1's own formulation) where
    # the mins form applies it via the exact f32 group-sum, so the two
    # roundings differ; both must sit within q8_1-activation error of
    # the dense reference.
    from qwen2_audio_tpu.ops.quant_matmul_int8 import (
        quant_linear_int8_stacked)
    st_s = {k: jnp.asarray(v)[None] for k, v in qw_s.items()}
    st_m = {k: jnp.asarray(v)[None] for k, v in qw_m.items()}
    li = jnp.asarray(0, jnp.int32)
    dense = np.asarray(x) @ np.asarray(dequantize_weight(qw_m))
    got_i = np.asarray(quant_linear_int8_stacked(x, st_s, li))
    want_i = np.asarray(quant_linear_int8_stacked(x, st_m, li))
    np.testing.assert_allclose(got_i, dense, atol=2e-1, rtol=1e-2)
    np.testing.assert_allclose(want_i, dense, atol=2e-1, rtol=1e-2)
    # measured here: sym 0.058 max vs the mins form's 0.118 — the
    # integer-exact -8 beats the f32 gsum correction


def test_q4_sym_decoder_end_to_end(monkeypatch, rng):
    """q4_0 decoder with sym (no-mins) packed weights produces the same
    logits as the mins-carrying packed form, fused schema + fused MLP
    engaged (prefill + one cached step)."""
    from qwen2_audio_tpu.models.qwen2_decoder import (
        create_cache, decoder_forward, fuse_decoder_params,
        random_decoder_params)
    cfg = Qwen2DecoderConfig(vocab_size=128, hidden_size=256,
                             intermediate_size=512, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             head_dim=64, tie_word_embeddings=False)
    params = random_decoder_params(np.random.default_rng(5), cfg)
    x = jnp.asarray(rng.standard_normal((1, 4, cfg.hidden_size)) * 0.3,
                    jnp.float32)

    outs = {}
    monkeypatch.setenv("QA_PACK4", "1")
    for env in ("0", "1"):
        monkeypatch.setenv("QA_Q4_SYM", env)
        qp = fuse_decoder_params(
            quantize_decoder_params(params, GGMLType.Q4_0))
        if env == "1":
            assert all("mins" not in v for v in qp["layers"].values()
                       if isinstance(v, dict) and "qs4" in v)
        cache = create_cache(cfg, 1, 16)
        logits, _ = decoder_forward(qp, cfg, x, cache, 0, block_only=True)
        outs[env] = np.asarray(logits)
        decoder_forward.clear_cache()
    np.testing.assert_allclose(outs["1"], outs["0"], atol=1e-4, rtol=1e-4)


def test_q4_u8ops_unpack_bit_identical(rng):
    """The u8-domain unpack (QA_Q4_U8 / u8ops=True: mask/shift before the
    i32 widening) must be BIT-identical to the i32-domain form and to a
    numpy oracle of ggml's nibble pairing — it is purely a VPU-width
    scheduling knob, never a numerics change."""
    from qwen2_audio_tpu.ops.quant_matmul import quant_matmul4, unpack4_f32

    K, N = 128, 256
    packed = rng.integers(0, 256, (K // 2, N), dtype=np.uint8)

    # numpy oracle: byte g*16+j -> values (g*32+j, g*32+j+16)
    lo, hi = packed & 0xF, packed >> 4
    want = np.concatenate([lo.reshape(-1, 16, N), hi.reshape(-1, 16, N)],
                          axis=1).reshape(K, N).astype(np.float32)

    import jax

    p = jnp.asarray(packed)
    a = np.asarray(jax.jit(lambda q: unpack4_f32(q, False))(p))
    b = np.asarray(jax.jit(lambda q: unpack4_f32(q, True))(p))
    np.testing.assert_array_equal(a, want)
    np.testing.assert_array_equal(b, want)

    # end-to-end through the kernel (interpret mode), both fast modes
    sc = jnp.asarray(rng.standard_normal((K // 32, N)).astype(np.float32)
                     * 0.01)
    x = jnp.asarray(rng.standard_normal((8, K)).astype(np.float32))
    for fast in (False, True):
        y0 = quant_matmul4(x, p, sc, fast=fast, u8ops=False)
        y1 = quant_matmul4(x, p, sc, fast=fast, u8ops=True)
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))


@pytest.mark.parametrize("ttype", [GGMLType.Q8_0, GGMLType.Q4_0,
                                   GGMLType.Q4_1])
def test_int8_stacked_matches_unstacked(ttype, monkeypatch, rng):
    """quant_linear_int8_stacked (scalar-prefetch layer select, both the
    strided-int8 and packed-nibble forms) must match the proven unstacked
    exact-int8 kernel on every layer — the activations are q8_1-quantized
    identically and the weight dots are exact integers, so the strided
    form is bit-equal and the packed form differs only in f32 scale-FMA
    accumulation order.  QA_Q4_SYM=0 pins the mins-carrying q4_0 form
    this expectation models (sym int8-stacked parity is covered by the
    sym parametrized decoder test)."""
    monkeypatch.setenv("QA_Q4_SYM", "0")
    from qwen2_audio_tpu.ops.quant_matmul import dequantize_weight4
    from qwen2_audio_tpu.ops.quant_matmul_int8 import (
        quant_linear_int8, quant_linear_int8_stacked, quantize_activations)

    L, K, N, M = 2, 256, 384, 8
    dicts = [quantize_array_for_device(
        rng.standard_normal((K, N)).astype(np.float32) * 0.1, ttype)
        for _ in range(L)]
    st = {k: jnp.stack([d[k] for d in dicts]) for k in dicts[0]}
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    for li in range(L):
        lij = jnp.asarray(li, jnp.int32)
        got = np.asarray(quant_linear_int8_stacked(x, st, lij))
        if "qs4" in dicts[li]:
            xq, sx = quantize_activations(x)
            xdq = np.asarray(xq, np.float32) * np.repeat(
                np.asarray(sx, np.float32), 32, axis=1)
            want = xdq @ np.asarray(dequantize_weight4(dicts[li]))
            # min term uses raw x in both impls; re-add the exact one
            from qwen2_audio_tpu.ops.quant_matmul import group_min_term
            want = (want
                    - xdq @ np.repeat(np.asarray(dicts[li]["mins"],
                                                 np.float32), 32, axis=0)
                    + np.asarray(group_min_term(x, dicts[li]["mins"])))
            rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
            assert rel < 2e-5, (li, rel)
        else:
            want = np.asarray(quant_linear_int8(x, dicts[li]))
            np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_int8_mode_linear_at_uses_stacked(rng):
    """linear_at in "int8" mode routes stacked q4 packed dicts through the
    exact stacked kernel (previously fell back to the slow dequant path)."""
    from qwen2_audio_tpu.ops.linear import linear_at, set_group_matmul_mode
    from qwen2_audio_tpu.ops.quant_matmul_int8 import quant_linear_int8_stacked

    L, K, N, M = 2, 256, 384, 4
    dicts = [quantize_array_for_device(
        rng.standard_normal((K, N)).astype(np.float32) * 0.1,
        GGMLType.Q4_0) for _ in range(L)]
    st = {k: jnp.stack([d[k] for d in dicts]) for k in dicts[0]}
    assert "qs4" in st
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    lij = jnp.asarray(1, jnp.int32)
    set_group_matmul_mode("int8")
    try:
        got = np.asarray(linear_at(x, st, lij))
    finally:
        set_group_matmul_mode(None)
    want = np.asarray(quant_linear_int8_stacked(x, st, lij))
    np.testing.assert_array_equal(got, want)


def test_pack4_i8_storage_parity(monkeypatch, rng):
    """QA_Q4_I8=1 stores the packed nibble stream as int8 (same bits —
    the q4z stream A/B hook); every consumer must decode it identically
    to the uint8 default because unpack4_f32 masks after the shift."""
    from qwen2_audio_tpu.ops.quant_matmul import (dequantize_weight4,
                                                  quant_linear4)

    K, N, M = 256, 384, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.1   # [in, out]
    monkeypatch.setenv("QA_Q4_I8", "0")    # the u8 form under comparison
    qu = quantize_array_for_device(w, GGMLType.Q4_0)
    monkeypatch.setenv("QA_Q4_I8", "1")
    qi = quantize_array_for_device(w, GGMLType.Q4_0)
    assert qu["qs4"].dtype == jnp.uint8 and qi["qs4"].dtype == jnp.int8
    assert np.array_equal(np.asarray(qu["qs4"]).view(np.int8),
                          np.asarray(qi["qs4"]))
    np.testing.assert_array_equal(np.asarray(dequantize_weight4(qu)),
                                  np.asarray(dequantize_weight4(qi)))
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(quant_linear4(x, qu)),
                                  np.asarray(quant_linear4(x, qi)))


def test_panelize_skip_gate_up_env(monkeypatch):
    """QA_PANEL_SKIP_GU=1 leaves the fused "gate_up" entry strided (so
    ops/linear.py::fused_mlp_at — which dispatches on {"qs4"/"qs"}, not
    the panel form — stays engaged) while other entries still panelize."""
    from qwen2_audio_tpu.models.qwen2_decoder import panelize_decoder_params

    gu = {"qs": np.zeros((2, 256, 256), np.int8),
          "scales": np.zeros((2, 8, 256), np.float32)}
    qkv = {"qs": np.zeros((2, 256, 128), np.int8),
           "scales": np.zeros((2, 8, 128), np.float32)}
    monkeypatch.setenv("QA_PANEL_SKIP_GU", "1")
    out = panelize_decoder_params({"layers": {"gate_up": dict(gu),
                                              "qkv": dict(qkv)}})
    assert "qs" in out["layers"]["gate_up"]       # untouched -> fused OK
    assert "qs_p" in out["layers"]["qkv"]         # still panelized
    monkeypatch.delenv("QA_PANEL_SKIP_GU")
    out = panelize_decoder_params({"layers": {"gate_up": dict(gu)}})
    assert "qs_p" in out["layers"]["gate_up"]     # default: panelized


def test_dq16_bf16_domain_dequant(monkeypatch, rng):
    """QA_Q4_DQ16: the fast packed-q4 dequant computed at bf16 lane width
    must track the f32-domain fast path within the one-extra-bf16-rounding
    class (scales are f16 payloads; nibble values are exact in bf16), on
    the strided, panel, and stacked kernels."""
    from qwen2_audio_tpu.ops.quant_matmul import (panelize_weight,
                                                  quant_linear4,
                                                  quant_linear_panel,
                                                  quant_linear_stacked)
    from qwen2_audio_tpu.quant.qparams import (Q4Form,
                                               quantize_array_for_device)

    K, N, M = 256, 512, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32) * 0.1
    qw = quantize_array_for_device(w, GGMLType.Q4_0,
                                   form=Q4Form(sym=True, scale="f32"))
    monkeypatch.delenv("QA_Q4_DQ16", raising=False)
    base = np.asarray(quant_linear4(x, qw, fast=True))
    base_p = np.asarray(quant_linear_panel(x, panelize_weight(qw),
                                           fast=True))
    st = {k: jnp.asarray(v)[None] for k, v in qw.items()}
    base_s = np.asarray(quant_linear_stacked(x, st, jnp.int32(0),
                                             fast=True))

    monkeypatch.setenv("QA_Q4_DQ16", "1")
    got = np.asarray(quant_linear4(x, qw, fast=True))
    got_p = np.asarray(quant_linear_panel(x, panelize_weight(qw),
                                          fast=True))
    got_s = np.asarray(quant_linear_stacked(x, st, jnp.int32(0),
                                            fast=True))
    for g, b in ((got, base), (got_p, base_p), (got_s, base_s)):
        err = np.abs(g - b).max() / (np.abs(b).max() + 1e-9)
        assert err < 2e-2, err
    # HIGHEST (fast=False) ignores the gate entirely — bit-identical
    exact_on = np.asarray(quant_linear4(x, qw, fast=False))
    monkeypatch.delenv("QA_Q4_DQ16", raising=False)
    exact_off = np.asarray(quant_linear4(x, qw, fast=False))
    np.testing.assert_array_equal(exact_on, exact_off)


def test_dq16_q8_bf16_domain_dequant(monkeypatch, rng):
    """QA_Q8_DQ16: the q8-family (int8-valued) kernels' dequant computed
    at bf16 lane width must track the f32-domain fast path within the
    one-extra-bf16-rounding class, on strided, panel, and stacked."""
    from qwen2_audio_tpu.ops.quant_matmul import (panelize_weight,
                                                  quant_linear,
                                                  quant_linear_panel,
                                                  quant_linear_stacked)
    from qwen2_audio_tpu.quant.qparams import quantize_array_for_device

    K, N, M = 256, 512, 8
    w = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32) * 0.1
    qw = quantize_array_for_device(w, GGMLType.Q8_0)
    monkeypatch.delenv("QA_Q8_DQ16", raising=False)
    base = np.asarray(quant_linear(x, qw, fast=True))
    base_p = np.asarray(quant_linear_panel(x, panelize_weight(qw),
                                           fast=True))
    st = {k: jnp.asarray(v)[None] for k, v in qw.items()}
    base_s = np.asarray(quant_linear_stacked(x, st, jnp.int32(0),
                                             fast=True))

    monkeypatch.setenv("QA_Q8_DQ16", "1")
    got = np.asarray(quant_linear(x, qw, fast=True))
    got_p = np.asarray(quant_linear_panel(x, panelize_weight(qw),
                                          fast=True))
    got_s = np.asarray(quant_linear_stacked(x, st, jnp.int32(0),
                                            fast=True))
    for g, b in ((got, base), (got_p, base_p), (got_s, base_s)):
        err = np.abs(g - b).max() / (np.abs(b).max() + 1e-9)
        assert err < 2e-2, err
    # HIGHEST (fast=False) ignores the gate entirely — bit-identical
    exact_on = np.asarray(quant_linear(x, qw, fast=False))
    monkeypatch.delenv("QA_Q8_DQ16", raising=False)
    exact_off = np.asarray(quant_linear(x, qw, fast=False))
    np.testing.assert_array_equal(exact_on, exact_off)
