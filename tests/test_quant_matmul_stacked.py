"""Layer-stacked quant matmuls (scalar-prefetch layer selection).

The decoder scans over layers with projection weights kept STACKED
(L, ...) outside the scan; `linear_at` selects the layer INSIDE the
Pallas kernel's BlockSpec index map (ops/quant_matmul.py stacked
variants) so no per-layer weight copy is materialized — ≙ ggml-cuda
reading each layer's tensor in place from the model buffer. These tests
pin the contract: stacked kernels are bit-identical to running the
per-layer kernel on the sliced weight, for every storage form.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from qwen2_audio_tpu.config import GGMLType
from qwen2_audio_tpu.ops.linear import linear, linear_at
from qwen2_audio_tpu.ops.quant_matmul import (
    panelize_weight, quant_linear, quant_linear_panel, quant_linear_stacked)
from qwen2_audio_tpu.quant.qparams import quantize_array_for_device


def _stack(dicts):
    keys = dicts[0].keys()
    return {k: jnp.stack([d[k] for d in dicts]) for k in keys}


@pytest.mark.parametrize("ttype", [GGMLType.Q8_0, GGMLType.Q6_K])
def test_stacked_strided_matches_per_layer(ttype, rng):
    """group-32 and group-16 strided forms."""
    L, K, N, M = 3, 512, 256, 8
    ws = [rng.standard_normal((K, N)).astype(np.float32) * 0.1
          for _ in range(L)]
    qws = [quantize_array_for_device(w, ttype) for w in ws]
    stacked = _stack(qws)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))

    for li in range(L):
        want = np.asarray(quant_linear(x, qws[li]))
        got = np.asarray(quant_linear_stacked(x, stacked,
                                              jnp.asarray(li, jnp.int32)))
        np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ttype", [GGMLType.Q8_0, GGMLType.Q5_1])
def test_stacked_panel_matches_per_layer(ttype, rng):
    L, K, N, M = 3, 512, 384, 4
    ws = [rng.standard_normal((K, N)).astype(np.float32) * 0.1
          for _ in range(L)]
    qps = [panelize_weight(quantize_array_for_device(w, ttype), block_n=128)
           for w in ws]
    stacked = _stack(qps)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))

    for li in range(L):
        want = np.asarray(quant_linear_panel(x, qps[li]))
        got = np.asarray(quant_linear_stacked(x, stacked,
                                              jnp.asarray(li, jnp.int32)))
        np.testing.assert_array_equal(got, want)


def test_stacked_pack4_matches_per_layer(monkeypatch, rng):
    monkeypatch.setenv("QA_PACK4", "1")
    L, K, N, M = 2, 512, 256, 8
    ws = [rng.standard_normal((K, N)).astype(np.float32) * 0.1
          for _ in range(L)]
    qws = [quantize_array_for_device(w, GGMLType.Q4_0) for w in ws]
    assert "qs4" in qws[0]
    stacked = _stack(qws)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))

    for li in range(L):
        want = np.asarray(quant_linear(x, qws[li]))
        got = np.asarray(quant_linear_stacked(x, stacked,
                                              jnp.asarray(li, jnp.int32)))
        np.testing.assert_array_equal(got, want)


def test_stacked_mins_term(rng):
    """Forms with per-group mins (q4_1-family) keep the min term exact."""
    L, K, N, M = 2, 256, 128, 4
    ws = [rng.standard_normal((K, N)).astype(np.float32) * 0.1
          for _ in range(L)]
    qws = [quantize_array_for_device(w, GGMLType.Q4_1) for w in ws]
    assert "mins" in qws[0]
    stacked = _stack(qws)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    for li in range(L):
        want = np.asarray(quant_linear(x, qws[li]))
        got = np.asarray(quant_linear_stacked(x, stacked,
                                              jnp.asarray(li, jnp.int32)))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_linear_at_matches_linear_all_forms(rng):
    """linear_at(x, stacked, li) ≡ linear(x, sliced) for dense, w8a8, and
    block-quant dicts, with biases."""
    from qwen2_audio_tpu.quant.qparams import fast_w8_from_array
    L, K, N = 3, 256, 128
    x = jnp.asarray(rng.standard_normal((2, 4, K)).astype(np.float32))

    # dense with bias
    dense = [{"w": jnp.asarray(rng.standard_normal((K, N)), jnp.float32),
              "b": jnp.asarray(rng.standard_normal(N), jnp.float32)}
             for _ in range(L)]
    # w8a8 per-channel
    w8 = [fast_w8_from_array(rng.standard_normal((K, N)).astype(np.float32)
                             * 0.05) for _ in range(L)]
    # block quant with bias
    q8 = []
    for _ in range(L):
        d = quantize_array_for_device(
            rng.standard_normal((K, N)).astype(np.float32) * 0.1,
            GGMLType.Q8_0)
        d["b"] = jnp.asarray(rng.standard_normal(N), jnp.float32)
        q8.append(d)

    for family in (dense, w8, q8):
        stacked = _stack(family)
        for li in range(L):
            want = np.asarray(linear(x, family[li]))
            got = np.asarray(linear_at(x, stacked,
                                       jnp.asarray(li, jnp.int32)))
            np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_stacked_decoder_forward_matches_unfused_reference(rng):
    """decoder_forward (scan + stacked projections + linear_at) vs a plain
    per-layer Python loop over sliced params — logits must match to
    float tolerance for dense AND quantized params."""
    from qwen2_audio_tpu.config import Qwen2DecoderConfig
    from qwen2_audio_tpu.models.qwen2_decoder import (
        KVCache, decoder_forward, embed_tokens, random_decoder_params)
    from qwen2_audio_tpu.quant.qparams import quantize_decoder_params

    cfg = Qwen2DecoderConfig(
        vocab_size=96, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=False)
    params = random_decoder_params(rng, cfg)
    qparams = quantize_decoder_params(params, GGMLType.Q8_0)
    toks = jnp.asarray(rng.integers(0, 96, (1, 5)))
    x = embed_tokens(params, toks)

    import jax

    def host_forward(p):
        """Per-layer loop with sliced dicts — no scan, no stacking."""
        from qwen2_audio_tpu.models.qwen2_decoder import (
            rms_norm, rope_angles, apply_rope, _gqa_attention)
        h = x
        positions = jnp.arange(5, dtype=jnp.int32)[None]
        cos, sin = rope_angles(positions, cfg.head_dim, cfg.rope_theta)
        L = cfg.num_hidden_layers
        for li in range(L):
            lp = jax.tree.map(lambda a: a[li], p["layers"])
            hh = rms_norm(h, lp["ln1"]["w"], cfg.rms_norm_eps)
            q = linear(hh, lp["q"]).reshape(1, 5, 4, 16)
            k = linear(hh, lp["k"]).reshape(1, 5, 2, 16)
            v = linear(hh, lp["v"]).reshape(1, 5, 2, 16)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            attn = _gqa_attention(q, k, v, 0, 5)
            h = h + linear(attn, lp["o"])
            hh = rms_norm(h, lp["ln2"]["w"], cfg.rms_norm_eps)
            gated = jax.nn.silu(linear(hh, lp["gate"])) * linear(hh, lp["up"])
            h = h + linear(gated, lp["down"])
        h = rms_norm(h, p["ln_f"]["w"], cfg.rms_norm_eps)
        return np.asarray(linear(h, p["lm_head"]), np.float32)

    for p, tol in ((params, 2e-5), (qparams, 2e-5)):
        cache = KVCache.create(cfg, 1, 8, dtype=jnp.float32)
        got, _ = decoder_forward(p, cfg, x, cache, 0, block_only=True)
        want = host_forward(p)
        scale = max(np.abs(want).max(), 1.0)
        assert np.abs(np.asarray(got) - want).max() < tol * scale + tol, \
            (np.abs(np.asarray(got) - want).max(), scale)
