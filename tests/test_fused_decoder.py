"""fuse_decoder_params (fused QKV + gate/up) vs the canonical separate
projections — dense and every quantized weight form."""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen2_audio_tpu.config import GGMLType, Qwen2DecoderConfig
from qwen2_audio_tpu.models.qwen2_decoder import (create_cache,
                                                  decoder_forward,
                                                  fuse_decoder_params,
                                                  random_decoder_params)

CFG = Qwen2DecoderConfig(
    vocab_size=96, hidden_size=128, intermediate_size=256,
    num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
    head_dim=32, tie_word_embeddings=False)


def _run(params):
    rng = np.random.default_rng(5)
    cache = create_cache(CFG, 2, 48, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 7, 128)) * 0.1, jnp.float32)
    lg, cache = decoder_forward(params, CFG, x, cache, 0, block_only=True,
                                logits_last_only=True)
    step = jnp.asarray(rng.standard_normal((2, 1, 128)) * 0.1, jnp.float32)
    lg2, cache = decoder_forward(params, CFG, step, cache, 7)
    return np.asarray(lg, np.float32), np.asarray(lg2, np.float32)


def test_fused_dense_matches():
    params = random_decoder_params(np.random.default_rng(1), CFG)
    a = _run(params)
    b = _run(fuse_decoder_params(params))
    np.testing.assert_allclose(b[0], a[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(b[1], a[1], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode,ttype", [
    ("ggml", GGMLType.Q8_0),
    ("ggml", GGMLType.Q4_0),
    ("fast", GGMLType.Q8_0),          # per-channel w8a8
])
def test_fused_quant_matches(mode, ttype):
    from qwen2_audio_tpu.quant.qparams import quantize_decoder_params
    params = random_decoder_params(np.random.default_rng(2), CFG)
    qp = quantize_decoder_params(params, ttype, mode=mode)
    a = _run(qp)
    b = _run(fuse_decoder_params(qp))
    np.testing.assert_allclose(b[0], a[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(b[1], a[1], rtol=2e-4, atol=2e-4)


def test_fused_on_host_numpy_leaves():
    """Fusion of host (numpy) pytrees stays on host — the big-model path
    quantizes and fuses before upload."""
    params = random_decoder_params(np.random.default_rng(3), CFG, host=True)
    fused = fuse_decoder_params(params)
    assert isinstance(fused["layers"]["qkv"]["w"], np.ndarray)
    assert isinstance(fused["layers"]["gate_up"]["w"], np.ndarray)
    L, D = CFG.num_hidden_layers, CFG.hidden_size
    nq = CFG.num_attention_heads * CFG.head_dim
    nkv = CFG.num_key_value_heads * CFG.head_dim
    assert fused["layers"]["qkv"]["w"].shape == (L, D, nq + 2 * nkv)
    assert fused["layers"]["qkv"]["b"].shape == (L, nq + 2 * nkv)
    assert fused["layers"]["gate_up"]["w"].shape == (
        L, D, 2 * CFG.intermediate_size)
    # gate/up have no bias in Qwen2 -> no fused bias either
    assert "b" not in fused["layers"]["gate_up"]


def test_fused_generation_device_loop():
    """Fused params through the on-device while_loop generator."""
    from qwen2_audio_tpu.runtime.generate import generate_on_device
    params = random_decoder_params(np.random.default_rng(4), CFG)
    prefill = jnp.asarray(
        np.random.default_rng(6).standard_normal((1, 5, 128)) * 0.1,
        jnp.float32)
    outs = []
    for p in (params, fuse_decoder_params(params)):
        toks, lps, count, _, _ = generate_on_device(
            p, CFG, prefill, None, max_new_tokens=8, eos_token_id=95,
            cache_max_ctx=32)
        outs.append((np.asarray(toks), int(count)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    assert outs[0][1] == outs[1][1]
