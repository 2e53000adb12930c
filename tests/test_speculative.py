"""n-gram speculative decoding (runtime/generate.py::generate_speculative):
exactness vs plain greedy is the contract — every emitted token must equal
what generate_on_device produces, for any draft-acceptance pattern."""

import jax.numpy as jnp
import numpy as np
import pytest

from qwen2_audio_tpu.config import Qwen2DecoderConfig
from qwen2_audio_tpu.models.qwen2_decoder import random_decoder_params
from qwen2_audio_tpu.runtime.generate import (generate_on_device,
                                              generate_speculative)


def _cfg(vocab=64):
    return Qwen2DecoderConfig(
        vocab_size=vocab, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, tie_word_embeddings=False)


def _run_both(cfg, params, prefill, *, max_new, eos=-1, spec_k=6, ngram=2,
              suppress=None):
    g_tok, g_lp, g_n, g_last, g_first = generate_on_device(
        params, cfg, prefill, suppress, max_new_tokens=max_new,
        eos_token_id=eos, cache_max_ctx=prefill.shape[1] + max_new + 8,
        cache_dtype=jnp.float32)
    s_tok, s_lp, s_n, s_last, s_first, iters = generate_speculative(
        params, cfg, prefill, suppress, max_new_tokens=max_new,
        eos_token_id=eos,
        cache_max_ctx=prefill.shape[1] + max_new + spec_k + 8,
        cache_dtype=jnp.float32, spec_k=spec_k, ngram=ngram)
    return ((np.asarray(g_tok), np.asarray(g_lp), int(g_n),
             np.asarray(g_first)),
            (np.asarray(s_tok), np.asarray(s_lp), int(s_n),
             np.asarray(s_first)), int(iters))


def test_spec_matches_greedy_random_weights():
    cfg = _cfg()
    params = random_decoder_params(np.random.default_rng(0), cfg)
    prefill = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 6, 128)) * 0.1,
        jnp.float32)
    g, s, iters = _run_both(cfg, params, prefill, max_new=24)
    assert g[2] == s[2]
    np.testing.assert_array_equal(s[0], g[0])
    np.testing.assert_allclose(s[1], g[1], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(s[3], g[3], rtol=1e-5, atol=1e-5)
    assert 1 <= iters <= 24


def test_spec_accepts_on_cyclic_output():
    """Tiny vocab forces the greedy sequence into a cycle; the n-gram
    lookup must then accept drafts, finishing in fewer forwards than
    tokens — while staying exact."""
    cfg = _cfg(vocab=8)
    params = random_decoder_params(np.random.default_rng(2), cfg)
    prefill = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 4, 128)) * 0.1,
        jnp.float32)
    g, s, iters = _run_both(cfg, params, prefill, max_new=48, spec_k=8)
    np.testing.assert_array_equal(s[0], g[0])
    assert g[2] == s[2] == 48
    assert iters < 48, "cyclic output must yield accepted drafts"


def test_spec_eos_stops_identically():
    cfg = _cfg(vocab=8)
    params = random_decoder_params(np.random.default_rng(2), cfg)
    prefill = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 4, 128)) * 0.1,
        jnp.float32)
    # pick the token greedy emits at step ~10 as EOS so both paths stop
    g_tok, _, g_n, _, _ = generate_on_device(
        params, cfg, prefill, None, max_new_tokens=16, eos_token_id=-1,
        cache_max_ctx=40, cache_dtype=jnp.float32)
    eos = int(np.asarray(g_tok)[0, 10])
    g, s, _ = _run_both(cfg, params, prefill, max_new=32, eos=eos)
    assert g[2] == s[2]
    np.testing.assert_array_equal(s[0], g[0])
    # both end with exactly one EOS at the stop position
    row = s[0][0, :s[2]]
    assert (row == eos).sum() == 1 and row[-1] == eos


def test_spec_suppress_mask():
    cfg = _cfg()
    params = random_decoder_params(np.random.default_rng(5), cfg)
    prefill = jnp.asarray(
        np.random.default_rng(6).standard_normal((1, 5, 128)) * 0.1,
        jnp.float32)
    sup = np.zeros((64,), np.float32)
    sup[:8] = -np.inf                  # ban the first 8 ids
    g, s, _ = _run_both(cfg, params, prefill, max_new=20,
                        suppress=jnp.asarray(sup))
    np.testing.assert_array_equal(s[0], g[0])
    assert not np.isin(s[0][0, :s[2]], np.arange(8)).any()


def test_spec_rejects_batch_and_sampling():
    cfg = _cfg()
    params = random_decoder_params(np.random.default_rng(7), cfg)
    two = jnp.zeros((2, 4, 128), jnp.float32)
    with pytest.raises(ValueError, match="B=1"):
        generate_speculative(params, cfg, two, None, max_new_tokens=8,
                             eos_token_id=-1, cache_max_ctx=64,
                             cache_dtype=jnp.float32)

    from qwen2_audio_tpu.runtime.decoding import DecoderBundle
    from qwen2_audio_tpu.runtime.generate import greedy_decode_device
    bundle = DecoderBundle(
        cfg=cfg, params=params, proj_w=jnp.eye(128, dtype=jnp.float32),
        proj_b=jnp.zeros(128, jnp.float32), eos_token_id=-1,
        bos_tokens=[], post_audio_tokens=[], max_ctx=128,
        cache_dtype=jnp.float32)
    one = jnp.zeros((1, 4, 128), jnp.float32)
    with pytest.raises(ValueError, match="greedy"):
        greedy_decode_device(bundle, one, max_new_tokens=8, spec_k=4,
                             temperature=0.5)


def test_spec_through_bundle_wrapper():
    cfg = _cfg(vocab=8)
    params = random_decoder_params(np.random.default_rng(2), cfg)
    from qwen2_audio_tpu.runtime.decoding import DecoderBundle
    from qwen2_audio_tpu.runtime.generate import greedy_decode_device
    bundle = DecoderBundle(
        cfg=cfg, params=params, proj_w=jnp.eye(128, dtype=jnp.float32),
        proj_b=jnp.zeros(128, jnp.float32), eos_token_id=-1,
        bos_tokens=[], post_audio_tokens=[], max_ctx=128,
        cache_dtype=jnp.float32)
    prefill = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 4, 128)) * 0.1,
        jnp.float32)
    a = greedy_decode_device(bundle, prefill, max_new_tokens=24)
    b = greedy_decode_device(bundle, prefill, max_new_tokens=24, spec_k=6)
    assert a.tokens == b.tokens
    np.testing.assert_allclose(np.asarray(a.logprobs[0]),
                               np.asarray(b.logprobs[0]),
                               rtol=2e-4, atol=2e-4)


def test_spec_through_whisper_full(rng=None):
    """FullParams.speculative_k plumbs to the device decode and matches
    the plain greedy transcription exactly."""
    import io

    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import WhisperHParams
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    from qwen2_audio_tpu.models.encoder import random_encoder_params
    from qwen2_audio_tpu.models.qwen2_audio import random_bundle
    from qwen2_audio_tpu.runtime import WhisperContext, full_default_params

    rng = np.random.default_rng(11)
    hp = WhisperHParams(n_vocab=64, n_audio_state=64, n_audio_head=4,
                       n_audio_layer=2, n_mels=16)
    buf = io.BytesIO()
    write_encoder_checkpoint(buf, random_encoder_params(rng, hp), hp,
                             mel_filterbank(hp.n_mels), [b"x"] * 60)
    dec_cfg = _cfg(vocab=16)
    samples = (0.1 * rng.standard_normal(32000)).astype(np.float32)

    outs = []
    for k in (0, 6):
        ctx = WhisperContext.init_from_buffer_with_params(buf.getvalue())
        ctx.decoder = random_bundle(np.random.default_rng(12), dec_cfg,
                                    enc_state=64, max_ctx=1024)
        p = full_default_params()
        p.max_new_tokens = 24
        p.temperature_inc = 0.0
        p.speculative_k = k
        assert ctx.full(p, samples) == 0
        outs.append(list(ctx.state.result_tokens))
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_spec_with_fused_params():
    from qwen2_audio_tpu.models.qwen2_decoder import fuse_decoder_params
    cfg = _cfg(vocab=8)
    params = random_decoder_params(np.random.default_rng(2), cfg)
    prefill = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 4, 128)) * 0.1,
        jnp.float32)
    outs = []
    for p in (params, fuse_decoder_params(params)):
        t, lp, n, _, _, _ = generate_speculative(
            p, cfg, prefill, None, max_new_tokens=32, eos_token_id=-1,
            cache_max_ctx=64, cache_dtype=jnp.float32, spec_k=6)
        outs.append((np.asarray(t), int(n)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    assert outs[0][1] == outs[1][1]


def test_spec_with_quant_kv_cache():
    """Speculative T=K+1 forwards through the int8 cache read path must
    match plain greedy on the same cache dtype."""
    cfg = _cfg(vocab=8)
    params = random_decoder_params(np.random.default_rng(2), cfg)
    prefill = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 4, 128)) * 0.1,
        jnp.float32)
    g = generate_on_device(params, cfg, prefill, None, max_new_tokens=32,
                           eos_token_id=-1, cache_max_ctx=64,
                           cache_dtype="q8")
    s = generate_speculative(params, cfg, prefill, None, max_new_tokens=32,
                             eos_token_id=-1, cache_max_ctx=64,
                             cache_dtype="q8", spec_k=6)
    np.testing.assert_array_equal(np.asarray(s[0]), np.asarray(g[0]))
    assert int(g[2]) == int(s[2])
