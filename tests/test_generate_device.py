"""On-device while_loop generation vs the host loop."""

import numpy as np
import pytest
import jax.numpy as jnp

from qwen2_audio_tpu.config import Qwen2DecoderConfig
from qwen2_audio_tpu.models.qwen2_decoder import embed_tokens, random_decoder_params
from qwen2_audio_tpu.runtime.decoding import DecoderBundle, greedy_decode
from qwen2_audio_tpu.runtime.generate import greedy_decode_device

CFG = Qwen2DecoderConfig(
    vocab_size=96, hidden_size=64, intermediate_size=128,
    num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, tie_word_embeddings=False)


@pytest.fixture(scope="module")
def bundle():
    params = random_decoder_params(np.random.default_rng(3), CFG)
    return DecoderBundle(cfg=CFG, params=params, proj_w=jnp.eye(64),
                         proj_b=jnp.zeros(64), eos_token_id=95,
                         bos_tokens=[], post_audio_tokens=[],
                         max_ctx=64, cache_dtype=jnp.float32)


def test_device_matches_host_greedy(bundle, rng):
    prompt = rng.integers(2, 90, (2, 5))
    prefill = embed_tokens(bundle.params, jnp.asarray(prompt))
    host = greedy_decode(bundle, prefill, max_new_tokens=10)
    dev = greedy_decode_device(bundle, prefill, max_new_tokens=10)
    assert dev.tokens == host.tokens
    for a, b in zip(dev.logprobs, host.logprobs):
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_device_repetition_penalty_matches_host(bundle, rng):
    prompt = rng.integers(2, 90, (1, 4))
    prefill = embed_tokens(bundle.params, jnp.asarray(prompt))
    host = greedy_decode(bundle, prefill, max_new_tokens=8,
                         repetition_penalty=2.0)
    dev = greedy_decode_device(bundle, prefill, max_new_tokens=8,
                               repetition_penalty=2.0)
    assert dev.tokens == host.tokens


def test_device_eos_short_circuit(bundle, rng):
    """Streams stop at EOS; buffer tail is EOS padding."""
    prompt = rng.integers(2, 90, (1, 3))
    prefill = embed_tokens(bundle.params, jnp.asarray(prompt))
    r = greedy_decode_device(bundle, prefill, max_new_tokens=50)
    toks = r.tokens[0]
    if bundle.eos_token_id in toks:
        assert toks[-1] == bundle.eos_token_id
        assert bundle.eos_token_id not in toks[:-1]


def test_full_pipeline_uses_device_path(rng):
    import io
    from qwen2_audio_tpu.audio import mel_filterbank
    from qwen2_audio_tpu.config import WhisperHParams
    from qwen2_audio_tpu.io.export import write_encoder_checkpoint
    from qwen2_audio_tpu.models.encoder import random_encoder_params
    from qwen2_audio_tpu.models.qwen2_audio import random_bundle
    from qwen2_audio_tpu.runtime import WhisperContext, full_default_params

    hp = WhisperHParams(n_vocab=64, n_audio_state=64, n_audio_head=4,
                        n_audio_layer=2, n_mels=16)
    buf = io.BytesIO()
    write_encoder_checkpoint(buf, random_encoder_params(rng, hp), hp,
                             mel_filterbank(hp.n_mels), [b"x"] * 60)
    ctx = WhisperContext.init_from_buffer_with_params(buf.getvalue())
    ctx.decoder = random_bundle(rng, CFG, enc_state=64, max_ctx=1024)

    p = full_default_params()
    p.max_new_tokens = 8
    p.temperature_inc = 0.0
    rc = ctx.full(p, (0.1 * rng.standard_normal(32000)).astype(np.float32))
    assert rc == 0
    assert len(ctx.state.result_tokens) > 0
    assert ctx.state.timings.t_decode_us > 0
